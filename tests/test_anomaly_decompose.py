"""operators/anomaly.py + operators/decompose.py + the new signal/text
operators (time_weighted_avg, counter_increase, repetition_stats):
NumPy-oracle parity on a synthetic multi-series fixture (integer values —
the integer-exact float contract), edge cases (1-point, constant,
duplicate-timestamp series), and the one-exchange plan-shape pins."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.functions.signals import (
    counter_increase,
    time_weighted_avg,
)
from timeseriestokenizer_spark.functions.textstats import repetition_stats
from timeseriestokenizer_spark.operators.anomaly import (
    cusum_changepoints,
    mad_outliers,
)
from timeseriestokenizer_spark.operators.decompose import (
    acf,
    seasonal_decompose,
    seasonal_strength,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def series_df(spark):
    """4 series: noisy with a level shift (cusum target), seasonal
    period-6 (strength target), constant, and a 1-point stub; plus
    duplicate timestamps inside series 0."""
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-03-01")
    # series 0: 80 points, level shift at midpoint, two duplicate ts
    vals = np.concatenate([rng.integers(90, 110, 40), rng.integers(140, 160, 40)])
    for i, v in enumerate(vals):
        t = base + pd.Timedelta(minutes=7 * i)
        rows.append((eid, 0, t, int(v))); eid += 1
    rows.append((eid, 0, rows[5][2], 999)); eid += 1  # dup ts
    # series 1: seasonal period 6
    for i in range(72):
        v = 100 + [30, 10, -20, -30, -5, 15][i % 6] + int(rng.integers(0, 3))
        rows.append((eid, 1, base + pd.Timedelta(minutes=11 * i), v)); eid += 1
    # series 2: constant
    for i in range(10):
        rows.append((eid, 2, base + pd.Timedelta(minutes=13 * i), 42)); eid += 1
    # series 3: single point
    rows.append((eid, 3, base, 7)); eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df = spark.createDataFrame(pdf)
    return df, pdf


def _sorted_series(pdf):
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        yield uid, g["value"].to_numpy(dtype=np.float64), g["event_id"].to_numpy()


def test_cusum_matches_recurrence(spark, series_df):
    df, pdf = series_df
    h = 30.0
    got = {
        r["event_id"]: r
        for r in cusum_changepoints(
            df, key="user_id", val_col="value", threshold=h
        ).collect()
    }
    for uid, x, ids in _sorted_series(pdf):
        mean = x.sum() / len(x)
        sp = sn = 0.0
        for v, i in zip(x, ids):
            sp = max(0.0, sp + (v - mean))
            sn = max(0.0, sn - (v - mean))
            r = got[int(i)]
            assert abs(r["cusum_pos"] - sp) < 1e-9 * max(1, abs(sp)), (uid, i)
            assert abs(r["cusum_neg"] - sn) < 1e-9 * max(1, abs(sn))
            assert r["alarm_pos"] == (sp > h) and r["alarm_neg"] == (sn > h)
    # the level-shift series must actually alarm; the constant one never
    assert any(got[int(i)]["alarm_pos"] for i in pdf[pdf.user_id == 0].event_id)
    assert not any(
        got[int(i)]["alarm_pos"] or got[int(i)]["alarm_neg"]
        for i in pdf[pdf.user_id == 2].event_id
    )


def test_cusum_single_exchange(spark, series_df):
    df, _ = series_df
    assert _plan(cusum_changepoints(df, key="user_id", val_col="value")).count(
        "Exchange"
    ) == 1


def test_mad_outliers_oracle(spark, series_df):
    df, pdf = series_df
    got = {r["event_id"]: r for r in mad_outliers(df, key="user_id", val_col="value").collect()}
    for uid, g in pdf.groupby("user_id"):
        x = g["value"].to_numpy(dtype=np.float64)
        med = float(np.percentile(x, 50))
        dev = np.abs(x - med)
        mad = float(np.percentile(dev, 50))
        for v, i in zip(x, g["event_id"]):
            r = got[int(i)]
            assert r["med"] == med and r["mad"] == mad
            assert r["is_outlier"] == (abs(v - med) > 3.0 * 1.4826 * mad), (uid, i)
    # the planted 999 in series 0 must be flagged; constants never are
    dup_id = int(pdf[(pdf.user_id == 0) & (pdf.value == 999)].event_id.iloc[0])
    assert got[dup_id]["is_outlier"]
    assert not any(got[int(i)]["is_outlier"] for i in pdf[pdf.user_id == 2].event_id)


def test_seasonal_decompose_oracle(spark, series_df):
    df, pdf = series_df
    m = 4
    got = {
        r["event_id"]: r
        for r in seasonal_decompose(df, key="user_id", val_col="value", period=m).collect()
    }
    for uid, x, ids in _sorted_series(pdf):
        n = len(x)
        trend = np.full(n, np.nan)
        for t in range(2, n - 2):
            trend[t] = (0.5 * x[t - 2] + x[t - 1] + x[t] + x[t + 1] + 0.5 * x[t + 2]) / m
        detr = x - trend
        seas = {}
        for p in range(m):
            vals = detr[p::m]
            vals = vals[~np.isnan(vals)]
            seas[p] = vals.mean() if len(vals) else None
        for t, i in enumerate(ids):
            r = got[int(i)]
            assert r["phase"] == t % m
            if np.isnan(trend[t]):
                assert r["trend"] is None and r["remainder"] is None
            else:
                assert abs(r["trend"] - trend[t]) < 1e-9
                assert abs(r["remainder"] - (detr[t] - seas[t % m])) < 1e-9
            if seas[t % m] is None:
                assert r["seasonal"] is None
            else:
                assert abs(r["seasonal"] - seas[t % m]) < 1e-9


def test_acf_oracle_and_plan(spark, series_df):
    df, pdf = series_df
    res = acf(df, key="user_id", val_col="value", max_lag=5)
    assert _plan(res).count("Exchange") == 1
    got = {(r["user_id"], r["lag"]): r for r in res.collect()}
    for uid, x, _ in _sorted_series(pdf):
        c = x - x.sum() / len(x)
        den = float((c * c).sum())
        for k in range(1, 6):
            r = got[(uid, k)]
            assert r["n_points"] == len(x)
            if den == 0 or len(x) <= k:
                expect = None if den == 0 else 0.0
            else:
                expect = float((c[:-k] * c[k:]).sum()) / den
            if expect is None:
                assert r["acf"] is None
            else:
                assert abs(r["acf"] - expect) < 1e-9, (uid, k)
    # seasonal series: strong positive autocorrelation at nothing < 6;
    # the period-6 signal shows up as the max |acf| at lag 6 among 1..5+6
    res6 = {
        (r["user_id"], r["lag"]): r["acf"]
        for r in acf(df, key="user_id", val_col="value", max_lag=6).collect()
    }
    assert res6[(1, 6)] > 0.8
    assert all(res6[(1, k)] < res6[(1, 6)] for k in range(1, 6))


def test_seasonal_strength_finds_period(spark, series_df):
    df, pdf = series_df
    res = seasonal_strength(
        df, key="user_id", val_col="value", periods=(4, 6, 8, 12)
    )
    assert _plan(res).count("Exchange") == 1
    rows = res.collect()
    best = {r["user_id"]: r["period"] for r in rows if r["is_best"]}
    assert best[1] == 6  # planted period
    # numpy oracle for every (series, period)
    got = {(r["user_id"], r["period"]): r for r in rows}
    for uid, x, _ in _sorted_series(pdf):
        for P in (4, 6, 8, 12):
            m = len(x) // P
            if m == 0:
                assert (uid, P) not in got
                continue
            tr = x[: m * P].reshape(m, P)
            mean = tr.mean()
            expect = m * ((tr.mean(axis=0) - mean) ** 2).sum()
            r = got[(uid, P)]
            assert r["m_cycles"] == m
            assert abs(r["strength"] - expect) < 1e-6 * max(1, expect), (uid, P)
    # exactly one best per series that has any candidate
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["is_best"])
    assert all(sum(v) == 1 for v in per_user.values())


def test_time_weighted_avg_oracle(spark):
    """Handcrafted bucket: v=10 holds 10 min, v=40 holds 50 min (to the
    bucket end) → TWA 35; plain avg would say 25. Plus a duplicate-ts
    point (zero weight) and a lone-point bucket (full tail weight)."""
    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [1, 1, 1, 1],
            "ts": pd.to_datetime(
                [
                    "2024-03-01 10:00:00",
                    "2024-03-01 10:10:00",
                    "2024-03-01 10:10:00",
                    "2024-03-01 11:30:00",
                ]
            ),
            "value": [10, 999, 40, 7],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["user_id"], str(r["bucket_ts"])): r
        for r in time_weighted_avg(df, key="user_id", val_col="value", tier="1h", order_cols=["event_id"]).collect()
    }
    b10 = got[(1, "2024-03-01 10:00:00")]
    # 10 min of 10, 0 min of 999 (dup ts), 50 min of 40
    assert abs(b10["twa"] - (10 * 600 + 40 * 3000) / 3600) < 1e-12
    assert b10["covered_us"] == 3600 * 1_000_000 and b10["n_points"] == 3
    b11 = got[(1, "2024-03-01 11:00:00")]
    assert b11["twa"] == 7.0 and b11["covered_us"] == 30 * 60 * 1_000_000
    assert _plan(
        time_weighted_avg(df, key="user_id", val_col="value", tier="1h", order_cols=["event_id"])
    ).count("Exchange") == 1


def test_counter_increase_oracle(spark):
    """Counter 5→15→3(reset)→10 within one hour: increase = 10+3+7 = 20;
    next hour's lone sample contributes its delta to its own bucket."""
    pdf = pd.DataFrame(
        {
            "event_id": range(5),
            "user_id": [1] * 5,
            "ts": pd.to_datetime(
                [
                    "2024-03-01 10:00:00",
                    "2024-03-01 10:10:00",
                    "2024-03-01 10:20:00",
                    "2024-03-01 10:40:00",
                    "2024-03-01 11:05:00",
                ]
            ),
            "value": [5, 15, 3, 10, 12],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        str(r["bucket_ts"]): r
        for r in counter_increase(df, key="user_id", val_col="value", tier="1h").collect()
    }
    assert got["2024-03-01 10:00:00"]["increase"] == 10 + 3 + 7
    assert got["2024-03-01 10:00:00"]["n_deltas"] == 3
    assert got["2024-03-01 11:00:00"]["increase"] == 2
    assert got["2024-03-01 11:00:00"]["n_deltas"] == 1


def test_repetition_stats_oracle(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b a b a b",  # bigrams ab,ba,ab,ba,ab → top 3/5, dup 5/5
                    "w x y z",  # all unique → top 1/3, dup 0
                    "solo",  # <2 tokens → absent
                    "  pad  pad  ",  # whitespace runs collapse: pad pad → 1 bigram
                ],
            }
        )
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert 2 not in got
    assert got[0]["n_bigrams"] == 5 and got[0]["top_bigram_count"] == 3
    assert abs(got[0]["top_bigram_frac"] - 0.6) < 1e-12
    assert got[0]["dup_bigram_frac"] == 1.0
    assert got[1]["top_bigram_count"] == 1 and got[1]["dup_bigram_frac"] == 0.0
    assert got[3]["n_bigrams"] == 1 and got[3]["top_bigram_frac"] == 1.0
    # text column must not survive past the scan stage (it dies at the
    # tokenize projection; only fixed-width keys ride the shuffles)
    plan = _plan(repetition_stats(docs))
    assert plan.count("Exchange") <= 2


def test_median_filter_oracle(spark, series_df):
    """numpy truncated-frame rolling median (linear interpolation ==
    quantile_cont == Spark percentile) must match exactly: integer input
    keeps every median on the .5 grid."""
    from timeseriestokenizer_spark.operators.anomaly import median_filter

    df, pdf = series_df
    res = median_filter(df, key="user_id", val_col="value", window_rows=5)
    assert _plan(res).count("Exchange") == 1
    got = {r["event_id"]: r for r in res.collect()}
    for uid, x, ids in _sorted_series(pdf):
        for t, i in enumerate(ids):
            lo, hi = max(0, t - 2), min(len(x), t + 3)
            expect = float(np.percentile(x[lo:hi], 50))
            r = got[int(i)]
            assert r["value_in"] == x[t]
            assert r["median_smooth"] == expect, (uid, i)
    # the planted 999 spike in series 0 must be smoothed away
    dup_id = int(pdf[(pdf.user_id == 0) & (pdf.value == 999)].event_id.iloc[0])
    assert got[dup_id]["median_smooth"] < 200


def test_ar2_forecast_oracle(spark, series_df):
    """Yule-Walker closed form replayed in numpy with the identical
    operation sequence (BIGINT product-sums, then scalar doubles);
    degenerate series (constant, 1-point) yield NULL coefficients."""
    from timeseriestokenizer_spark.operators.decompose import ar2_forecast

    df, pdf = series_df
    res = ar2_forecast(df, key="user_id", val_col="value")
    got = {r["user_id"]: r for r in res.collect()}
    for uid, g in pdf.groupby("user_id"):
        x = (
            g.sort_values(["ts", "event_id"])["value"]
            .to_numpy(dtype=np.int64)
        )
        n = len(x)
        r = got[uid]
        assert r["n_points"] == n
        c = n * x - x.sum()  # division-free centering, exact int64
        denom = int((c * c).sum())
        if denom == 0 or n < 3:
            assert r["phi1"] is None and r["forecast_next"] is None
            continue
        r1 = float(int((c[:-1] * c[1:]).sum())) / float(denom)
        r2 = float(int((c[:-2] * c[2:]).sum())) / float(denom)
        det = 1.0 - r1 * r1
        if abs(det) <= 1e-12:
            assert r["phi1"] is None
            continue
        phi1 = r1 * (1.0 - r2) / det
        phi2 = (r2 - r1 * r1) / det
        mean = float(int(x.sum())) / float(n)
        fc = mean + phi1 * (x[-1] - mean) + phi2 * (x[-2] - mean)
        assert abs(r["phi1"] - phi1) < 1e-12 * max(1, abs(phi1)), uid
        assert abs(r["phi2"] - phi2) < 1e-12 * max(1, abs(phi2))
        assert abs(r["forecast_next"] - fc) < 1e-9 * max(1, abs(fc))
    # the seasonal series' AR(2) fit must be stationary-ish, not NULL
    assert got[1]["phi1"] is not None


def _dtw_full_matrix(a, b):
    """Independent O(n·m) full-matrix DTW oracle (L1 cost)."""
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.iinfo(np.int64).max // 4, dtype=np.int64)
    D[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(int(a[i - 1]) - int(b[j - 1]))
            D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return int(D[n, m])


def test_dtw_known_alignments(spark):
    """Handcrafted: identical-shape different-pacing series score 0 under
    DTW (Euclidean would not); a constant offset costs len·offset."""
    from timeseriestokenizer_spark.operators.dtw import dtw_to

    rows = []
    for i, v in enumerate([1, 2, 3, 4]):
        rows.append((i, 0, i, v))
    for i, v in enumerate([1, 1, 2, 2, 3, 3, 4]):  # same shape, slower
        rows.append((10 + i, 1, i, v))
    for i, v in enumerate([3, 4, 5, 6]):  # +2 offset
        rows.append((20 + i, 2, i, v))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "tsec", "value"])
    pdf["ts"] = pd.Timestamp("2024-03-01") + pd.to_timedelta(pdf.pop("tsec"), unit="m")
    df = spark.createDataFrame(pdf)
    res = dtw_to(df, key="user_id", val_col="value")
    assert _plan(res).count("Exchange") == 1
    got = {r["user_id"]: r for r in res.collect()}
    assert got[0]["dtw_dist"] == 0 and got[0]["m_points"] == 4
    assert got[1]["dtw_dist"] == 0  # elastic alignment absorbs the pacing
    # +2 offset: warping stretches the endpoints (3 eats b=1,2,3; 6 eats
    # b=4 thrice → 2+1+0+0+1+2 = 6, beating the diagonal's 8) but a
    # level shift can never reach 0 — the elastic-vs-amplitude boundary
    assert got[2]["dtw_dist"] == 6


def test_dtw_matches_full_matrix_oracle(spark, series_df):
    from timeseriestokenizer_spark.operators.dtw import dtw_to

    df, pdf = series_df
    got = {r["user_id"]: r for r in dtw_to(df, key="user_id", val_col="value").collect()}
    series = {
        uid: g.sort_values(["ts", "event_id"])["value"].to_numpy(dtype=np.int64)
        for uid, g in pdf.groupby("user_id")
    }
    b = series[min(series)]
    for uid, a in series.items():
        r = got[uid]
        assert r["n_points"] == len(a) and r["m_points"] == len(b)
        assert r["dtw_dist"] == _dtw_full_matrix(a, b), uid
    assert got[min(series)]["dtw_dist"] == 0


def test_diversity_stats_oracle(spark):
    from timeseriestokenizer_spark.functions.textstats import diversity_stats

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "a a a a",        # n=4 d=1 sq=16: simpson 1, eff vocab 1
                    "A b a B c",      # lowercased: a2 b2 c1 → n=5 d=3 sq=9
                    "u v w x",        # uniform: simpson 1/n
                ],
            }
        )
    )
    got = {r["doc_id"]: r for r in diversity_stats(docs).collect()}
    r0 = got[0]
    assert (r0["n_tokens"], r0["distinct_tokens"]) == (4, 1)
    assert r0["simpson_d"] == 1.0 and r0["effective_vocab"] == 1.0
    assert r0["top_token_share"] == 1.0
    r1 = got[1]
    assert (r1["n_tokens"], r1["distinct_tokens"]) == (5, 3)
    assert r1["simpson_d"] == 9.0 / 25.0
    assert r1["effective_vocab"] == 25.0 / 9.0
    assert r1["type_token_ratio"] == 3.0 / 5.0 and r1["top_token_share"] == 2.0 / 5.0
    r2 = got[2]
    assert r2["simpson_d"] == 0.25 and r2["effective_vocab"] == 4.0
    # zero shuffles: scan -> project only
    plan = _plan(diversity_stats(docs))
    assert "Exchange" not in plan and "Python" not in plan


def test_trailing_count_semantics(spark):
    from timeseriestokenizer_spark.functions.signals import trailing_count

    base = pd.Timestamp("2024-05-01")
    mins = [0, 30, 59, 60, 61]
    rows = [(i, 1, base + pd.Timedelta(minutes=m), 0) for i, m in enumerate(mins)]
    rows.append((9, 1, base + pd.Timedelta(minutes=59), 0))  # dup ts peer
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    )
    got = {
        r["event_id"]: r["n_trailing"]
        for r in trailing_count(df, key="user_id", window_s=3600).collect()
    }
    # half-open (t-1h, t]: the t=0 event has aged out exactly at t=60min
    assert got[0] == 1
    assert got[1] == 2
    assert got[2] == 4 and got[9] == 4  # dup-ts peers count each other
    assert got[3] == 4  # 30, 59, 59, 60 — NOT the t=0 event
    assert got[4] == 5  # 30, 59, 59, 60, 61
    flagged = trailing_count(df, key="user_id", window_s=3600, limit=4).collect()
    assert {r["event_id"]: r["is_burst"] for r in flagged}[4] is True


def test_winsorize_oracle(spark, series_df):
    from timeseriestokenizer_spark.operators.anomaly import winsorize

    df, pdf = series_df
    got = {r["event_id"]: r for r in winsorize(df, key="user_id", val_col="value").collect()}
    for uid, g in pdf.groupby("user_id"):
        x = np.sort(g["value"].to_numpy())
        n = len(x)
        lo = x[int(np.floor((n - 1) * 0.05))]
        hi = x[int(np.floor((n - 1) * 0.95))]
        for v, i in zip(g["value"], g["event_id"]):
            r = got[int(i)]
            assert (r["lo_bound"], r["hi_bound"]) == (lo, hi), uid
            assert r["clipped"] == min(max(v, lo), hi)
            assert r["clipped_hi"] == (v > hi) and r["clipped_lo"] == (v < lo)
    # the planted 999 in series 0 must clip; constant series never clips
    dup_id = int(pdf[(pdf.user_id == 0) & (pdf.value == 999)].event_id.iloc[0])
    assert got[dup_id]["clipped_hi"] and got[dup_id]["clipped"] < 999
    assert all(
        not (got[int(i)]["clipped_lo"] or got[int(i)]["clipped_hi"])
        for i in pdf[pdf.user_id == 2].event_id
    )
    # single-point series: both bounds are the value itself
    solo = int(pdf[pdf.user_id == 3].event_id.iloc[0])
    assert got[solo]["lo_bound"] == got[solo]["hi_bound"] == got[solo]["clipped"]
    # one exchange, JVM only
    plan = _plan(winsorize(df, key="user_id", val_col="value"))
    assert plan.count("Exchange hashpartitioning") == 1 and "Python" not in plan


def test_period_over_period_gap_immunity(spark):
    from timeseriestokenizer_spark.functions.signals import period_over_period

    # user 1: days 1,2,8,9,15 — 8↔1, 9↔2, 15↔8 pair up; 1,2 have no prior.
    # user 2: days 1,8,10 — day 10 has NO day-3 partner: a ROWS lag(1)
    # would mis-align onto day 8; the value-bounded frame yields NULL.
    rows = [
        (1, "2024-01-01", 10), (1, "2024-01-02", 20), (1, "2024-01-08", 30),
        (1, "2024-01-09", 40), (1, "2024-01-15", 60),
        (2, "2024-01-01", 5), (2, "2024-01-08", 7), (2, "2024-01-10", 9),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "v"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    res = period_over_period(df, key="k", val_col="v", period_days=7)
    got = {(r["k"], str(r["day"])): r for r in res.collect()}
    r8 = got[(1, "2024-01-08")]
    assert (r8["prev_total"], r8["delta_total"], r8["ratio"]) == (10, 20, 3.0)
    assert got[(1, "2024-01-15")]["prev_total"] == 30
    assert got[(1, "2024-01-01")]["prev_total"] is None
    # the gap day: lag(1) would have found day 8; the range frame must not
    r10 = got[(2, "2024-01-10")]
    assert r10["prev_total"] is None and r10["delta_total"] is None
    assert r10["ratio"] is None
    assert got[(2, "2024-01-08")]["prev_total"] == 5
    # two shuffles, both post-partial-aggregate (only per-day partials ride
    # them, never raw rows): (k, day) combine, then the k re-cluster; JVM only
    plan = _plan(period_over_period(df, key="k", val_col="v", period_days=7))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_sum" in plan and "Python" not in plan


def test_period_over_period_zero_prior_total(spark):
    from timeseriestokenizer_spark.functions.signals import period_over_period

    rows = [(1, "2024-01-01", 0), (1, "2024-01-08", 5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "v"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    got = {
        str(r["day"]): r
        for r in period_over_period(df, key="k", val_col="v").collect()
    }
    r = got["2024-01-08"]
    # prior period exists but totals 0: delta is exact, ratio refuses 5/0
    assert (r["prev_total"], r["delta_total"], r["ratio"]) == (0, 5, None)


def test_histogram_drift_tvd(spark):
    """Integer-exact TVD drift: planted shift registers, identical
    distributions give 0, a single-period key gives NULL, and the
    statistic matches a pure-Python oracle exactly."""
    from collections import Counter
    from datetime import datetime, timedelta

    from timeseriestokenizer_spark.operators.drift import histogram_drift

    t0 = datetime(2024, 1, 1)
    rows = []
    # key A: uniform over [0,100) before, shifted to [100,200) after
    for i in range(300):
        rows.append(("A", t0 + timedelta(hours=i % 200), float(i % 100)))
        rows.append(("A", t0 + timedelta(days=20, hours=i % 200),
                     100.0 + float(i % 100)))
    # key B: identical histograms both sides
    for i in range(120):
        rows.append(("B", t0 + timedelta(hours=i), float(i % 40)))
        rows.append(("B", t0 + timedelta(days=20, hours=i), float(i % 40)))
    # key C: before only
    for i in range(50):
        rows.append(("C", t0 + timedelta(hours=i), float(i)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = {
        r["user_id"]: r
        for r in histogram_drift(
            df, "user_id", "ts", "value", "2024-01-15 00:00:00",
            lo=0.0, hi=200.0, n_bins=20,
        ).collect()
    }

    def oracle(vals1, vals2, lo=0.0, hi=200.0, nb=20):
        w = (hi - lo) / nb
        def b(v):
            return min(nb - 1, max(0, int((v - lo) // w)))
        c1, c2 = Counter(map(b, vals1)), Counter(map(b, vals2))
        n1, n2 = sum(c1.values()), sum(c2.values())
        num = sum(abs(n2 * c1.get(i, 0) - n1 * c2.get(i, 0)) for i in range(nb))
        return n1, n2, num, num / (2 * n1 * n2)

    a1 = [float(i % 100) for i in range(300)]
    a2 = [100.0 + float(i % 100) for i in range(300)]
    n1, n2, num, tvd = oracle(a1, a2)
    assert (out["A"]["n_before"], out["A"]["n_after"]) == (n1, n2)
    assert out["A"]["tvd_num"] == num
    assert out["A"]["tvd"] == tvd
    assert out["A"]["tvd"] == 1.0  # disjoint supports -> full mass moved
    assert out["B"]["tvd"] == 0.0
    assert out["C"]["n_after"] == 0 and out["C"]["tvd"] is None

    # plan: raw stream aggregated once on (key,bin); window + final agg
    # share the key exchange -> exactly 2 shuffles, all JVM
    plan = (
        histogram_drift(df, "user_id", "ts", "value", "2024-01-15 00:00:00",
                        0.0, 200.0, 20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Python" not in plan, plan


def test_histogram_drift_series_from_tier(spark):
    """Drift read from rollup state: day-over-day TVD off the long-format
    histogram tier, aligned by bucket arithmetic (a dark day yields NULL
    on both adjacent comparisons, never a cross-gap comparison)."""
    from datetime import datetime, timedelta

    from timeseriestokenizer_spark.operators.drift import (
        histogram_drift_series,
    )
    from timeseriestokenizer_spark.operators.rollup import (
        histogram_rollup_tier,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    # day 0 and day 1: identical value mixes; day 2 missing entirely;
    # day 3: all mass in one new bin
    for d in (0, 1):
        for i in range(60):
            rows.append((t0 + timedelta(days=d, minutes=i), float(i % 100)))
    for i in range(40):
        rows.append((t0 + timedelta(days=3, minutes=i), 999.0))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    hist = histogram_rollup_tier(df, "1d", val_col="value",
                                 edges=[50.0, 150.0])
    out = {r["bucket_ts"]: r for r in histogram_drift_series(hist).collect()}

    d0, d1, d3 = (t0 + timedelta(days=d) for d in (0, 1, 3))
    d2, d4 = t0 + timedelta(days=2), t0 + timedelta(days=4)
    assert out[d0]["tvd"] is None          # nothing before day 0
    assert out[d1]["tvd"] == 0.0           # identical histograms
    assert out[d2]["tvd"] is None and out[d2]["n_cur"] == 0  # dark day
    assert out[d3]["tvd"] is None          # prev day dark -> no comparison
    assert out[d4]["tvd"] is None and out[d4]["n_cur"] == 0  # phantom after last
    # exact numerator on the identical day: all cross terms cancel
    assert out[d1]["tvd_num"] == 0 and out[d1]["n_prev"] == 60


def test_weighted_percentile_exact(spark):
    """Weighted percentile: numpy-free handcrafted oracle — cum weight in
    value order crosses p*total at a value the key contains; zero-weight
    rows carry no mass; one-exchange plan."""
    from timeseriestokenizer_spark.operators.anomaly import (
        weighted_percentile,
    )

    rows = [
        # key A: values 1..4 with weights 1,1,1,7 -> total 10
        #   p50: cum(1,2,3)=3 < 5, value 4 crosses (cum 10) -> 4
        #   p30: cum at value 3 = 3 >= 3 -> 3
        ("A", 1, 1), ("A", 2, 1), ("A", 3, 1), ("A", 4, 7),
        # key B: one heavy value + zero-weight noise that must not count
        ("B", 10, 5), ("B", 99, 0),
    ]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    p50 = {r["k"]: r for r in weighted_percentile(df, "k", "v", "w", 0.5).collect()}
    assert (p50["A"]["wp50"], p50["A"]["w_total"]) == (4, 10)
    assert (p50["B"]["wp50"], p50["B"]["w_total"]) == (10, 5)
    p30 = {r["k"]: r["wp30"] for r in weighted_percentile(df, "k", "v", "w", 0.3).collect()}
    assert p30["A"] == 3

    plan = (
        weighted_percentile(df, "k", "v", "w", 0.5)
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Python" not in plan, plan


def test_asof_join_tolerance(spark):
    """merge_asof-style tolerance: a match older than the window drops the
    WHOLE row (all fields null together), an in-window match carries all
    fields; forward direction mirrors."""
    from datetime import datetime, timedelta

    from timeseriestokenizer_spark.operators.asof import asof_join

    t0 = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", t0 + timedelta(seconds=5)), ("k", t0 + timedelta(seconds=100))],
        "key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", t0, 1.0, "fresh")],
        "key string, ts timestamp, px double, tag string",
    )
    out = {
        r["ts"]: r
        for r in asof_join(left, right, "key", tolerance_s=10.0).collect()
    }
    near, far = t0 + timedelta(seconds=5), t0 + timedelta(seconds=100)
    assert (out[near]["asof_px"], out[near]["asof_tag"]) == (1.0, "fresh")
    assert out[far]["asof_px"] is None and out[far]["asof_tag"] is None
    # without tolerance the stale match carries
    base = {
        r["ts"]: r for r in asof_join(left, right, "key").collect()
    }
    assert base[far]["asof_px"] == 1.0
    # forward: right at t+3 within 5s of left at t0 -> match; 100s -> not
    fwd_right = spark.createDataFrame(
        [("k", t0 + timedelta(seconds=8), 2.0, "next")],
        "key string, ts timestamp, px double, tag string",
    )
    fwd = {
        r["ts"]: r
        for r in asof_join(
            left, fwd_right, "key", direction="forward", tolerance_s=5.0
        ).collect()
    }
    assert fwd[near]["asof_px"] == 2.0
    assert fwd[far]["asof_px"] is None
