"""operators/trend.py: NumPy-oracle parity for the OLS trend fit and the
Spearman (average-rank) monotonic trend, edge cases (1-point, constant,
tied values, duplicate timestamps), and the one-exchange plan pins —
HashPartitioning(key) must satisfy every window AND the final groupBy
(the rollup-cascade precedent)."""

import numpy as np
import pandas as pd
import pytest

from timeseriestokenizer_spark.operators.trend import (
    mann_kendall,
    spearman_trend,
    theil_sen,
    trend_fit,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def trend_df(spark):
    """5 series: clean up-trend, noisy down-trend with heavy value ties,
    constant, single point, and a monotonic-but-nonlinear (quadratic)
    series where Spearman must read 1.0 while OLS R² < 1."""
    rng = np.random.default_rng(11)
    rows, eid = [], 0
    base = pd.Timestamp("2024-03-01")
    for i in range(60):  # series 0: y = 3x + noise
        rows.append((eid, 0, base + pd.Timedelta(minutes=5 * i),
                     int(3 * i + rng.integers(-4, 5)))); eid += 1
    for i in range(50):  # series 1: down-trend, values snapped to 10s (ties)
        rows.append((eid, 1, base + pd.Timedelta(minutes=7 * i),
                     int(((200 - 2 * i + rng.integers(-9, 10)) // 10) * 10))); eid += 1
    rows.append((eid, 1, rows[65][2], 55)); eid += 1  # dup ts inside series 1
    for i in range(12):  # series 2: constant
        rows.append((eid, 2, base + pd.Timedelta(minutes=3 * i), 42)); eid += 1
    rows.append((eid, 3, base, 7)); eid += 1  # series 3: single point
    for i in range(30):  # series 4: strictly increasing quadratic
        rows.append((eid, 4, base + pd.Timedelta(minutes=2 * i), i * i)); eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    return spark.createDataFrame(pdf), pdf


def _series(pdf):
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        yield uid, g["value"].to_numpy(dtype=np.int64)


def test_trend_fit_oracle(spark, trend_df):
    df, pdf = trend_df
    got = {r["user_id"]: r for r in trend_fit(df, key="user_id").collect()}
    for uid, y in _series(pdf):
        n = len(y)
        x = np.arange(1, n + 1, dtype=np.int64)
        sxx = n * int((x * x).sum()) - int(x.sum()) ** 2
        sxy = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        syy = n * int((y * y).sum()) - int(y.sum()) ** 2
        r = got[uid]
        assert r["n_points"] == n
        if sxx == 0:  # single point
            assert r["slope"] is None and r["intercept"] is None and r["r2"] is None
            continue
        slope = sxy / sxx
        assert r["slope"] == slope, uid
        assert r["intercept"] == (float(y.sum()) - slope * float(x.sum())) / float(n)
        if syy == 0:  # constant series: defined slope 0, undefined R²
            assert r["slope"] == 0.0 and r["r2"] is None
        else:
            assert r["r2"] == (float(sxy) * float(sxy)) / (float(sxx) * float(syy))
    # directional sanity on the planted shapes
    assert got[0]["slope"] > 2.5 and got[0]["r2"] > 0.95
    assert got[1]["slope"] < 0
    assert 0 < got[4]["r2"] < 1  # nonlinear: good but imperfect linear fit


def test_spearman_oracle(spark, trend_df):
    df, pdf = trend_df
    got = {r["user_id"]: r for r in spearman_trend(df, key="user_id").collect()}
    for uid, y in _series(pdf):
        n = len(y)
        r = got[uid]
        assert r["n_points"] == n
        # average ranks exactly as the operator carries them: w = 2*avg_rank
        u = 2 * np.arange(1, n + 1, dtype=np.int64)
        order = pd.Series(y).rank(method="average").to_numpy() * 2
        w = order.astype(np.int64)
        assert np.array_equal(order, w), "2*avg_rank must be integral"
        suu = n * int((u * u).sum()) - int(u.sum()) ** 2
        sww = n * int((w * w).sum()) - int(w.sum()) ** 2
        suw = n * int((u * w).sum()) - int(u.sum()) * int(w.sum())
        if suu == 0 or sww == 0:  # 1-point or constant
            assert r["spearman_rho"] is None
            continue
        assert r["spearman_rho"] == float(suw) / np.sqrt(float(suu) * float(sww))
    # monotone quadratic: rho exactly 1 while OLS R² was < 1
    assert got[4]["spearman_rho"] == 1.0
    assert got[0]["spearman_rho"] > 0.95 and got[1]["spearman_rho"] < -0.8


def test_mann_kendall_oracle(spark, trend_df):
    df, pdf = trend_df
    got = {r["user_id"]: r for r in mann_kendall(df, key="user_id").collect()}
    assert 3 not in got  # single-point series: no pairs, absent
    for uid, y in _series(pdf):
        n = len(y)
        if n < 2:
            continue
        r = got[uid]
        s = sum(
            int(np.sign(y[j] - y[i])) for i in range(n) for j in range(i + 1, n)
        )
        assert r["n_points"] == n and r["s_stat"] == s
        n0 = n * (n - 1) // 2
        _, counts = np.unique(y, return_counts=True)
        n1 = int((counts * (counts - 1) // 2).sum())
        var_num = n * (n - 1) * (2 * n + 5) - int(
            (counts * (counts - 1) * (2 * counts + 5)).sum()
        )
        if n0 - n1 > 0:
            assert r["tau_b"] == s / np.sqrt(float(n0 - n1) * float(n0))
        else:
            assert r["tau_b"] is None
        if s == 0:
            assert r["z_stat"] == 0.0
        elif var_num > 0:
            corr = s - 1 if s > 0 else s + 1
            assert r["z_stat"] == corr / np.sqrt(var_num / 18.0)
        else:
            assert r["z_stat"] is None
    # the clean up-trend is significant, the constant series is S=0/Z=0
    assert got[0]["z_stat"] > 3 and got[1]["z_stat"] < -3
    assert got[2]["s_stat"] == 0 and got[2]["z_stat"] == 0.0
    assert got[4]["tau_b"] == 1.0  # strictly monotone, no ties


def test_theil_sen_oracle(spark, trend_df):
    df, pdf = trend_df
    got = {r["user_id"]: r for r in theil_sen(df, key="user_id").collect()}
    assert 3 not in got
    for uid, y in _series(pdf):
        n = len(y)
        if n < 2:
            continue
        slopes = sorted(
            (float(y[j]) - float(y[i])) / float(j - i)
            for i in range(n)
            for j in range(i + 1, n)
        )
        m = len(slopes)
        r = got[uid]
        assert r["n_pairs"] == m
        assert r["theil_slope"] == slopes[(m + 1) // 2 - 1], uid
    assert abs(got[0]["theil_slope"] - 3.0) < 0.2  # robust to the noise
    assert got[2]["theil_slope"] == 0.0  # constant


def test_theil_sen_ignores_outlier(spark):
    """One wild point among 21: OLS slope bends, Theil-Sen holds 1.0."""
    base = pd.Timestamp("2024-01-01")
    # off-center outlier: at the midpoint its OLS leverage would be zero
    rows = [(i, 0, base + pd.Timedelta(minutes=i), i if i != 18 else 10_000)
            for i in range(21)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    )
    ts_row = theil_sen(df, key="user_id").collect()[0]
    ols_row = trend_fit(df, key="user_id").collect()[0]
    assert ts_row["theil_slope"] == 1.0
    assert abs(ols_row["slope"] - 1.0) > 5


def test_trend_plans_single_exchange(spark, trend_df):
    df, _ = trend_df
    for res in (
        trend_fit(df, key="user_id"),
        spearman_trend(df, key="user_id"),
        mann_kendall(df, key="user_id"),
        theil_sen(df, key="user_id"),
    ):
        plan = _plan(res)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Join" not in plan  # pairwise stats without a self-join
        assert "Python" not in plan  # pure Catalyst, no UDF stage
