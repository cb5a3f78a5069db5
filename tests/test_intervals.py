"""operators/intervals.py: handcrafted gaps-and-islands fixtures (overlap,
touch, nesting, disjoint, equal starts), SCD2 run semantics (NULL runs,
duplicate timestamps, the half-open valid_to chain), and the one-exchange
plan pins."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.intervals import (
    interval_coverage,
    merge_intervals,
    scd2_compress,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def iv_df(spark):
    # key 1: [0,10] [5,15] (overlap) [15,20] (touch) | [30,40] [32,35] (nested) | [50,60]
    # key 2: single interval
    rows = [
        (1, 0, 10), (1, 5, 15), (1, 15, 20), (1, 30, 40), (1, 32, 35), (1, 50, 60),
        (2, 100, 200),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["k", "s", "e"]))


def test_merge_intervals_islands(spark, iv_df):
    got = sorted(
        (r["k"], r["start"], r["end"], r["n_merged"])
        for r in merge_intervals(iv_df, key="k", start_col="s", end_col="e").collect()
    )
    assert got == [
        (1, 0, 20, 3),   # overlap + touching all merge
        (1, 30, 40, 2),  # nested interval absorbed
        (1, 50, 60, 1),
        (2, 100, 200, 1),
    ]


def test_merge_order_insensitive(spark):
    """Equal starts and reversed input order cannot split an island."""
    rows = [(1, 10, 12), (1, 10, 30), (1, 25, 26), (1, 0, 11)]
    for perm in (rows, rows[::-1], rows[1:] + rows[:1]):
        df = spark.createDataFrame(pd.DataFrame(perm, columns=["k", "s", "e"]))
        got = [
            (r["start"], r["end"], r["n_merged"])
            for r in merge_intervals(df, key="k", start_col="s", end_col="e").collect()
        ]
        assert got == [(0, 30, 4)]


def test_interval_coverage_math(spark, iv_df):
    got = {r["k"]: r for r in interval_coverage(iv_df, key="k", start_col="s", end_col="e").collect()}
    r1 = got[1]
    assert r1["covered"] == 20 + 10 + 10
    assert r1["n_islands"] == 3 and r1["n_intervals"] == 6
    assert r1["first_start"] == 0 and r1["last_end"] == 60
    assert r1["gap_total"] == 60 - 40  # [20,30) and [40,50)
    assert got[2]["covered"] == 100 and got[2]["gap_total"] == 0


def test_scd2_runs(spark):
    base = pd.Timestamp("2024-01-01")
    # values A A B B B None None A; one duplicate timestamp inside the B run
    vals = ["A", "A", "B", "B", "B", None, None, "A"]
    rows = [(i, 1, base + pd.Timedelta(minutes=i if i != 4 else 3), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "k", "ts", "v"]).astype({"v": "object"})
    )
    out = sorted(
        scd2_compress(df, key="k", ts_col="ts", val_col="v").collect(),
        key=lambda r: r["run"],
    )
    assert [(r["value"], r["n_rows"]) for r in out] == [
        ("A", 2), ("B", 3), (None, 2), ("A", 1)
    ]
    # half-open chain: each valid_to equals the next valid_from; last is NULL
    for cur, nxt in zip(out, out[1:]):
        assert cur["valid_to"] == nxt["valid_from"]
    assert out[-1]["valid_to"] is None
    us = 60_000_000
    assert [r["valid_from"] for r in out] == [
        pd.Timestamp("2024-01-01").value // 1000 + d * us for d in (0, 2, 5, 7)
    ]


def test_interval_plans_single_exchange(spark, iv_df):
    assert _plan(
        interval_coverage(iv_df, key="k", start_col="s", end_col="e")
    ).count("Exchange hashpartitioning") == 1
    base = pd.Timestamp("2024-01-01")
    df = iv_df.select(
        F.col("k"), F.col("s").alias("event_id"),
        F.lit(base).alias("ts"), F.col("e").alias("v"),
    )
    plan = _plan(scd2_compress(df, key="k", ts_col="ts", val_col="v"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_state_occupancy_math(spark):
    from timeseriestokenizer_spark.operators.intervals import state_occupancy

    # user 1: x@0s → y@10s → x@30s → z@60s (last event opens no span)
    rows = [
        (1, "2024-01-01 00:00:00", "x", 1),
        (1, "2024-01-01 00:00:10", "y", 2),
        (1, "2024-01-01 00:00:30", "x", 3),
        (1, "2024-01-01 00:01:00", "z", 4),
        (2, "2024-01-01 00:00:00", "solo", 5),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "st", "i"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    res = state_occupancy(df, key="k", ts_col="ts", state_col="st", id_col="i")
    got = {(r["k"], r["state"]): r for r in res.collect()}
    x = got[(1, "x")]
    assert (x["n_visits"], x["n_closed"], x["occupied_us"]) == (2, 2, 40_000_000)
    assert x["share"] == 40_000_000 / 60_000_000
    y = got[(1, "y")]
    assert (y["n_visits"], y["n_closed"], y["occupied_us"]) == (1, 1, 20_000_000)
    # terminal state: visited once, no span opened, share 0.0 (not NULL)
    z = got[(1, "z")]
    assert (z["n_visits"], z["n_closed"], z["occupied_us"], z["share"]) == (1, 0, 0, 0.0)
    # single-event key: zero total span → share NULL, never 0/0
    solo = got[(2, "solo")]
    assert solo["occupied_us"] == 0 and solo["share"] is None


def test_state_occupancy_dup_ts_and_plan(spark):
    from timeseriestokenizer_spark.operators.intervals import state_occupancy

    # duplicate timestamps: (ts, id) order makes the first a zero-width span
    rows = [
        (1, "2024-01-01 00:00:00", "a", 1),
        (1, "2024-01-01 00:00:00", "b", 2),
        (1, "2024-01-01 00:00:05", "c", 3),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "st", "i"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    res = state_occupancy(df, key="k", ts_col="ts", state_col="st", id_col="i")
    got = {r["state"]: r for r in res.collect()}
    assert got["a"]["occupied_us"] == 0 and got["a"]["n_closed"] == 1
    assert got["b"]["occupied_us"] == 5_000_000
    # lead window, (k, state) aggregate, per-k total: all on ONE exchange
    plan = _plan(
        state_occupancy(df, key="k", ts_col="ts", state_col="st", id_col="i")
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan
