"""alerting.alert_state / alert_episodes vs an explicit sequential state
machine — the window (LOCF-of-marks) formulation must equal the naive
per-point loop on real data and on crafted hysteresis edge cases."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.alerting import (
    alert_episodes,
    alert_state,
)


def _machine(points, hi, lo, n_consec):
    """Naive sequential reference: returns [(id, alert_on, hi_run)]."""
    out, run, on = [], 0, 0
    for _ts, pid, v in sorted(points):
        run = run + 1 if v >= hi else 0
        if on and v <= lo:
            on = 0
        elif not on and run >= n_consec:
            on = 1
        out.append((pid, on, run))
    return out


def _to_df(spark, points, user=1):
    rows = [
        (user, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), pid, float(v))
        for i, (_o, pid, v) in enumerate(sorted(points))
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


CASES = [
    # single spike never fires (debounce)
    [(i, i, v) for i, v in enumerate([10, 200, 10, 10])],
    # fire on 2nd consecutive, stay on through the lo<v<hi band, clear at lo
    [(i, i, v) for i, v in enumerate([10, 150, 160, 90, 80, 60, 10, 10])],
    # clear then immediate refire
    [(i, i, v) for i, v in enumerate([150, 150, 50, 150, 150, 50])],
    # run interrupted just before firing
    [(i, i, v) for i, v in enumerate([150, 90, 150, 90, 150, 150, 10])],
    # starts in the dead band: stays off
    [(i, i, v) for i, v in enumerate([90, 90, 90, 61, 119, 90])],
    # on at series end (open episode)
    [(i, i, v) for i, v in enumerate([10, 150, 150, 90])],
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_state_matches_machine_edges(spark, case):
    pts = CASES[case]
    got = {
        r["event_id"]: (r["alert_on"], r["hi_run"])
        for r in alert_state(_to_df(spark, pts), hi=120.0, lo=60.0, n_consec=2)
        .collect()
    }
    want = {pid: (on, run) for pid, on, run in _machine(pts, 120.0, 60.0, 2)}
    assert got == want


def test_state_matches_machine_real_data(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        r["event_id"]: (r["alert_on"], r["hi_run"])
        for r in alert_state(ev, hi=120.0, lo=60.0, n_consec=2).collect()
    }
    want = {}
    for u, pts in (
        ev.groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "event_id", "value")).alias("p"))
        .collect()
    ):
        for pid, on, run in _machine(
            [(p["ts"], p["event_id"], p["value"]) for p in pts], 120.0, 60.0, 2
        ):
            want[pid] = (on, run)
    assert got == want


def test_episodes_cover_exactly_the_on_points(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    st = alert_state(ev, hi=120.0, lo=60.0, n_consec=2)
    eps = alert_episodes(ev, hi=120.0, lo=60.0, n_consec=2).collect()
    n_on = st.filter("alert_on = 1").count()
    assert sum(e["n_points"] for e in eps) == n_on
    assert all(e["start_ts"] <= e["end_ts"] for e in eps)
    # every episode's peak is >= hi: it contains the firing run's end point
    assert all(e["peak_value"] >= 120.0 for e in eps)
    assert len(eps) > 0


def test_single_exchange_plan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = alert_state(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_hw_forecast_matches_python_recurrence(spark):
    """holt_winters_forecast: bit-exact vs the explicit recurrence +
    ring-slot forecast; singleton series forecast flat."""
    from timeseriestokenizer_spark.operators.smoothing import (
        holt_winters_forecast,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r["user_id"], r["h"]): r["yhat"]
        for r in holt_winters_forecast(
            ev, key="user_id", ts_col="ts", val_col="value",
            id_col="event_id", period=4, horizon=3,
        ).collect()
    }
    a, bcf, g, m = 0.5, 0.25, 0.25, 4
    want = {}
    for u, pts in (
        ev.groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "event_id", "value")).alias("p"))
        .collect()
    ):
        vals = [p["value"] for p in sorted(pts, key=lambda p: (p["ts"], p["event_id"]))]
        l = float(vals[0])
        b = float(vals[1]) - float(vals[0]) if len(vals) >= 2 else 0.0
        seas = [0.0] * m
        for t, x in enumerate(vals[1:], start=1):
            s_old = seas[t % m]
            l_new = a * (x - s_old) + (1.0 - a) * (l + b)
            b = bcf * (l_new - l) + (1.0 - bcf) * b
            seas[t % m] = g * (x - l_new) + (1.0 - g) * s_old
            l = l_new
        for h in (1, 2, 3):
            want[(u, h)] = l + float(h) * b + seas[(len(vals) - 1 + h) % m]
    assert got == want

    one = spark.createDataFrame(
        [(9, "2024-01-01 00:00:00", 1, 42.0)],
        "user_id long, ts string, event_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = holt_winters_forecast(
        one, key="user_id", ts_col="ts", val_col="value", id_col="event_id"
    ).collect()
    assert all(r["yhat"] == 42.0 for r in rows) and len(rows) == 4


def test_best_changepoint_planted_and_plan(spark):
    """best_changepoint: finds a planted level shift at the exact index,
    matches the numpy argmax oracle on real data, one exchange."""
    import datetime as dt

    import numpy as np

    from timeseriestokenizer_spark.operators.anomaly import best_changepoint

    rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i,
         100 if i < 30 else 500)
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, cents long"
    )
    r = best_changepoint(df).collect()[0]
    assert r["split_k"] == 30
    assert r["left_mean"] == 100.0 and r["right_mean"] == 500.0

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    )
    got = {
        r["user_id"]: (r["split_k"], r["score"])
        for r in best_changepoint(ev).collect()
    }
    for u, pts in (
        ev.groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "event_id", "cents")).alias("p"))
        .collect()
    ):
        v = np.array(
            [p["cents"] for p in sorted(pts, key=lambda p: (p["ts"], p["event_id"]))],
            dtype=np.int64,
        )
        n = len(v)
        s = np.cumsum(v)
        ks = np.arange(1, n)
        a = (n * s[:-1] - ks * s[-1]).astype(np.float64)
        score = a * a / (ks * (n - ks)).astype(np.float64)
        best = int(np.argmax(score))  # first max == smallest k
        assert got[u] == (best + 1, float(score[best]))

    plan = best_changepoint(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
