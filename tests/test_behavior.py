"""operators/behavior.py: handcrafted fixtures for the weekly profile
(ISO weekday convention), cohort retention (two planted cohorts), and
funnel matching (order sensitivity, duplicate-timestamp tiebreak, state
freeze after completion, zero-progress rows)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.behavior import (
    cohort_retention,
    funnel_steps,
    weekly_profile,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weekly_profile_math(spark):
    # 2024-01-01 is a Monday → ISO weekday 0
    rows = [
        (1, "2024-01-01 09:00", 10), (1, "2024-01-08 09:30", 30),  # same cell
        (1, "2024-01-02 09:00", 5),   # Tuesday
        (1, "2024-01-07 23:00", 7),   # Sunday → weekday 6
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "v"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    got = {
        (r["weekday"], r["hour"]): r
        for r in weekly_profile(df, key="k", val_col="v").collect()
    }
    mon9 = got[(0, 9)]
    assert (mon9["n"], mon9["total"], mon9["mean"]) == (2, 40, 20.0)
    assert (mon9["vmin"], mon9["vmax"]) == (10, 30)
    assert got[(1, 9)]["n"] == 1 and got[(6, 23)]["total"] == 7


def test_cohort_retention_matrix(spark):
    rows = [
        # cohort A (day 1): two users; one returns day 2, one day 3
        (1, "2024-01-01"), (2, "2024-01-01"),
        (1, "2024-01-02"), (1, "2024-01-02"),  # two events same day
        (2, "2024-01-03"),
        # cohort B (day 2): one user, never returns
        (3, "2024-01-02"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    got = {
        (str(r["cohort_date"]), r["offset_days"]): (r["n_active"], r["n_events"])
        for r in cohort_retention(df, key="k").collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2)
    assert got[("2024-01-01", 1)] == (1, 2)  # user 1 with 2 events
    assert got[("2024-01-01", 2)] == (1, 1)
    assert got[("2024-01-02", 0)] == (1, 1)
    assert len(got) == 4


@pytest.fixture(scope="module")
def funnel_df(spark):
    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: clean 0 → 1 → 2
        (10, 1, 0, 0), (11, 1, 1, 1), (12, 1, 2, 2),
        # user 2: 1 before 0 → the early 1 must NOT count; reaches stage 2 only
        (20, 2, 0, 1), (21, 2, 1, 0), (22, 2, 2, 1),
        # user 3: zero progress (only stage 2 events)
        (30, 3, 0, 2), (31, 3, 1, 2),
        # user 4: completes, then later events must not change the state
        (40, 4, 0, 0), (41, 4, 1, 1), (42, 4, 2, 2), (43, 4, 3, 0),
        # user 5: duplicate timestamp — stage 0 at id 50, stage 1 at SAME ts,
        # larger id → (ts, id) order makes it count
        (50, 5, 0, 0), (51, 5, 0, 1),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "k", "mins", "stage"])
    pdf["ts"] = base + pd.to_timedelta(pdf.pop("mins"), unit="m")
    return spark.createDataFrame(pdf)


def test_funnel_semantics(spark, funnel_df):
    got = {
        r["k"]: r
        for r in funnel_steps(
            funnel_df, stages=[0, 1, 2], key="k", stage_col="stage"
        ).collect()
    }
    assert len(got) == 5  # every key, zero-progress included
    assert got[1]["stages_reached"] == 3 and got[1]["completed"]
    us = 60_000_000
    epoch = pd.Timestamp("2024-01-01").value // 1000
    assert got[1]["completed_ts_us"] == epoch + 2 * us
    assert got[2]["stages_reached"] == 2 and not got[2]["completed"]
    assert got[2]["completed_ts_us"] is None
    assert got[3]["stages_reached"] == 0
    assert got[4]["stages_reached"] == 3
    assert got[4]["completed_ts_us"] == epoch + 2 * us  # frozen at completion
    assert got[5]["stages_reached"] == 2  # same-ts tiebreak by id


def test_funnel_plan_and_args(spark, funnel_df):
    res = funnel_steps(funnel_df, stages=[0, 1], key="k", stage_col="stage")
    plan = _plan(res)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Python" not in plan
    with pytest.raises(ValueError):
        funnel_steps(funnel_df, stages=[], key="k", stage_col="stage")
