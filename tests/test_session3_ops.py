"""Engine tests vs in-test NumPy oracles for the round-5 session-3
operators: correlate.ccf, drift.ks_drift, trend.predict_linear,
decompose.dft_power. The DuckDB value-hash proof lives in
tests/test_pending_contract.py (rows ccf_lead_lag / ks_drift /
predict_linear / dft_dominant); these tests pin the SEMANTICS on planted
fixtures a random table can't exercise (a known lead, a known
distribution shift, an exact line, a planted period).
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (key, minute_offset, x, y) -> DataFrame with ts/event_id."""
    data = [
        (k, T0 + dt.timedelta(minutes=m), i, int(x), int(y))
        for i, (k, m, x, y) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "k string, ts timestamp, event_id long, x long, y long"
    )


def _ccf_oracle(x, y, max_lag):
    x, y = np.asarray(x, dtype=object), np.asarray(y, dtype=object)
    n = len(x)
    cx = x * n - sum(x)
    cy = y * n - sum(y)
    denom = math.sqrt(float(sum(cx * cx))) * math.sqrt(float(sum(cy * cy)))
    out = {}
    for k in range(-max_lag, max_lag + 1):
        tot = 0
        for t in range(n):
            u = t + k
            if 0 <= u < n:
                tot += cx[t] * cy[u]
        out[k] = None if denom == 0.0 else float(tot) / denom
    return out


class TestCcf:
    def test_matches_numpy_oracle(self, spark):
        rng = np.random.RandomState(7)
        x = rng.randint(0, 1000, size=40)
        y = rng.randint(0, 1000, size=40)
        df = _events(spark, [("a", i, x[i], y[i]) for i in range(40)])
        from timeseriestokenizer_spark.operators.correlate import ccf

        got = {
            r["lag"]: r["ccf"]
            for r in ccf(
                df, key="k", x_col="x", y_col="y", max_lag=3, min_points=10
            ).collect()
        }
        want = _ccf_oracle(x, y, 3)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_planted_lead_sets_best_lag(self, spark):
        # y is x delayed by 2 steps (x leads): x_t aligns with y_{t+2},
        # so the CCF peaks at lag +2 under the positive-k-shifts-y-forward
        # convention.
        rng = np.random.RandomState(11)
        x = rng.randint(0, 1000, size=60)
        y = np.roll(x, 2)
        y[:2] = rng.randint(0, 1000, size=2)
        df = _events(spark, [("a", i, x[i], y[i]) for i in range(60)])
        from timeseriestokenizer_spark.operators.correlate import ccf

        rows = ccf(
            df, key="k", x_col="x", y_col="y", max_lag=3, min_points=10
        ).collect()
        assert all(r["best_lag"] == 2 for r in rows)
        peak = {r["lag"]: r["ccf"] for r in rows}[2]
        assert peak > 0.9

    def test_short_and_constant_series(self, spark):
        from timeseriestokenizer_spark.operators.correlate import ccf

        rows = [("short", i, i, i) for i in range(5)] + [
            ("flat", i, 7, i * 3) for i in range(20)
        ]
        out = ccf(
            _events(spark, rows), key="k", x_col="x", y_col="y",
            max_lag=3, min_points=10,
        ).collect()
        # short series filtered entirely; flat series has zero x-variance
        # so every ccf is NULL and best_lag falls back to the smallest lag
        assert {r["k"] for r in out} == {"flat"}
        assert all(r["ccf"] is None for r in out)
        assert all(r["best_lag"] == -3 for r in out)


def _ks_oracle(a, b):
    vals = sorted(set(a) | set(b))
    na, nb, best = len(a), len(b), 0
    for v in vals:
        ca = sum(1 for t in a if t <= v)
        cb = sum(1 for t in b if t <= v)
        best = max(best, abs(ca * nb - cb * na))
    return best / (na * nb)


class TestKsDrift:
    def test_matches_exhaustive_oracle_with_ties(self, spark):
        rng = np.random.RandomState(3)
        a = [int(v) for v in rng.randint(0, 30, size=80)]  # dense ties
        b = [int(v) for v in rng.randint(5, 35, size=50)]
        rows = [("u", i, v, 0) for i, v in enumerate(a)] + [
            ("u", 1000 + i, v, 1) for i, v in enumerate(b)
        ]
        df = _events(spark, rows)
        from timeseriestokenizer_spark.operators.drift import ks_drift

        out = ks_drift(
            df, split_expr=F.col("y") == 0, key="k", val_col="x"
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_a"], r["n_b"]) == (80, 50)
        assert r["ks_d"] == pytest.approx(_ks_oracle(a, b), abs=0)

    def test_identical_and_disjoint(self, spark):
        rows = (
            [("same", i, v, s) for s in (0, 1) for i, v in enumerate(range(10))]
            + [("disj", i, i, 0) for i in range(10)]
            + [("disj", 100 + i, 1000 + i, 1) for i in range(10)]
            + [("onesided", i, i, 0) for i in range(10)]
        )
        from timeseriestokenizer_spark.operators.drift import ks_drift

        out = {
            r["k"]: r["ks_d"]
            for r in ks_drift(
                _events(spark, rows), split_expr=F.col("y") == 0,
                key="k", val_col="x",
            ).collect()
        }
        assert out == {"same": 0.0, "disj": 1.0}  # one-sided key dropped


class TestPredictLinear:
    def test_exact_line_recovered(self, spark):
        # v = 40 + 3 * seconds: slope and the 1h-ahead point are exact.
        rows = [
            ("u", dt.timedelta(seconds=60 * i), 40 + 3 * 60 * i)
            for i in range(20)
        ]
        df = spark.createDataFrame(
            [("u", T0 + d, v) for _, d, v in rows], "k string, ts timestamp, v long"
        )
        from timeseriestokenizer_spark.operators.trend import predict_linear

        r = predict_linear(
            df, key="k", ts_col="ts", val_col="v", horizon_s=3600
        ).collect()[0]
        assert r["slope_per_s"] == pytest.approx(3.0, abs=0)
        last_s = 60 * 19
        assert r["predicted"] == pytest.approx(40 + 3 * (last_s + 3600), abs=1e-9)

    def test_zero_time_variance_is_null(self, spark):
        df = spark.createDataFrame(
            [("u", T0, 1), ("u", T0 + dt.timedelta(microseconds=500), 9)],
            "k string, ts timestamp, v long",
        )
        from timeseriestokenizer_spark.operators.trend import predict_linear

        r = predict_linear(df, key="k", ts_col="ts", val_col="v").collect()[0]
        assert r["slope_per_s"] is None and r["predicted"] is None

    def test_matches_numpy_polyfit(self, spark):
        rng = np.random.RandomState(5)
        secs = np.sort(rng.choice(np.arange(0, 100000), size=50, replace=False))
        vals = rng.randint(0, 50000, size=50)
        df = spark.createDataFrame(
            [
                ("u", T0 + dt.timedelta(seconds=int(s)), int(v))
                for s, v in zip(secs, vals)
            ],
            "k string, ts timestamp, v long",
        )
        from timeseriestokenizer_spark.operators.trend import predict_linear

        r = predict_linear(
            df, key="k", ts_col="ts", val_col="v", horizon_s=3600
        ).collect()[0]
        slope, intercept = np.polyfit(secs.astype(float), vals.astype(float), 1)
        assert r["slope_per_s"] == pytest.approx(slope, rel=1e-9)
        assert r["predicted"] == pytest.approx(
            intercept + slope * (float(secs[-1]) + 3600.0), rel=1e-9
        )


class TestDftPower:
    def test_planted_period_wins(self, spark):
        # A clean period-6 sinusoid (integer amplitude) must put its power
        # at p=6 far above the other candidates.
        n = 120
        vals = [int(round(1000 * math.sin(2 * math.pi * t / 6))) + 5000 for t in range(n)]
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.decompose import dft_power

        rows = dft_power(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()
        assert all(r["best_period"] == 6 for r in rows)
        power = {r["period"]: r["spec_power"] for r in rows}
        assert power[6] > 100 * max(power[p] for p in (4, 8))

    def test_matches_numpy_oracle(self, spark):
        rng = np.random.RandomState(9)
        vals = rng.randint(0, 100000, size=75)
        df = _events(spark, [("a", i, int(v), 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.decompose import (
            dft_power,
            dft_tables,
        )

        got = {
            r["period"]: r["spec_power"]
            for r in dft_power(
                df, key="k", ts_col="ts", val_col="x", id_col="event_id"
            ).collect()
        }
        n = len(vals)
        c0 = [int(v) * n - int(vals.sum()) for v in vals]
        for p, (ic, isn) in dft_tables((4, 6, 8, 12), 1000).items():
            a = sum(c * ic[m % p] for m, c in enumerate(c0))
            b = sum(c * isn[m % p] for m, c in enumerate(c0))
            want = float(a) * float(a) + float(b) * float(b)
            assert got[p] == pytest.approx(want, rel=1e-15)

    def test_constant_series_all_zero_power(self, spark):
        df = _events(spark, [("a", i, 42, 0) for i in range(30)])
        from timeseriestokenizer_spark.operators.decompose import dft_power

        rows = dft_power(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()
        assert all(r["spec_power"] == 0.0 for r in rows)
        assert all(r["best_period"] == 4 for r in rows)


def _pettitt_oracle(vals):
    """Brute-force Pettitt: U_k = sum_{i<=k} sum_{j>k} sign(x_i - x_j)."""
    n = len(vals)
    best_k, best_u = None, -1
    for k in range(1, n):
        u = sum(
            (vals[i] > vals[j]) - (vals[i] < vals[j])
            for i in range(k)
            for j in range(k, n)
        )
        if abs(u) > best_u:
            best_k, best_u = k, abs(u)
    return best_k, best_u


class TestPettitt:
    def test_planted_level_shift(self, spark):
        rng = np.random.RandomState(13)
        vals = [int(v) for v in rng.randint(0, 50, 40)] + [
            int(v) for v in rng.randint(200, 250, 40)
        ]
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.anomaly import pettitt_changepoint

        r = pettitt_changepoint(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()[0]
        assert r["k_star"] == 40
        assert r["u_abs"] == 40 * 40  # clean split: every cross pair counts once

    def test_matches_bruteforce_with_ties(self, spark):
        rng = np.random.RandomState(17)
        vals = [int(v) for v in rng.randint(0, 12, 60)]  # dense ties
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.anomaly import pettitt_changepoint

        r = pettitt_changepoint(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()[0]
        k_want, u_want = _pettitt_oracle(vals)
        assert (r["k_star"], r["u_abs"]) == (k_want, u_want)
        assert r["change_ts"] == T0 + dt.timedelta(minutes=k_want - 1)


def _mw_oracle(a, b):
    """Pair-counting Mann-Whitney U for sample a, plus tie-corrected z."""
    u = sum((x > y) + 0.5 * (x == y) for x in a for y in b)
    na, nb, n = len(a), len(b), len(a) + len(b)
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(list(a) + list(b)).values())
    var = na * nb * ((n**3 - n) - ties) / (12 * n * (n - 1))
    z = None if var == 0 else (u - na * nb / 2) / math.sqrt(var)
    return u, z


class TestRankSumShift:
    def test_matches_pair_counting_oracle(self, spark):
        rng = np.random.RandomState(19)
        a = [int(v) for v in rng.randint(0, 25, 70)]
        b = [int(v) for v in rng.randint(10, 35, 45)]
        rows = [("u", i, v, 0) for i, v in enumerate(a)] + [
            ("u", 500 + i, v, 1) for i, v in enumerate(b)
        ]
        from timeseriestokenizer_spark.operators.drift import rank_sum_shift

        r = rank_sum_shift(
            _events(spark, rows), split_expr=F.col("y") == 0,
            key="k", val_col="x",
        ).collect()[0]
        u_want, z_want = _mw_oracle(a, b)
        assert r["u_stat"] == pytest.approx(u_want, abs=0)
        assert r["z"] == pytest.approx(z_want, rel=1e-12)

    def test_all_tied_gives_null_z(self, spark):
        rows = [("u", i, 7, i % 2) for i in range(20)]
        from timeseriestokenizer_spark.operators.drift import rank_sum_shift

        r = rank_sum_shift(
            _events(spark, rows), split_expr=F.col("y") == 0,
            key="k", val_col="x",
        ).collect()[0]
        assert r["z"] is None
        assert r["u_stat"] == pytest.approx(10 * 10 / 2)  # pure-tie midranks

    def test_direction_of_shift(self, spark):
        # B strictly above A: U_A = 0, z maximally negative.
        rows = [("u", i, i, 0) for i in range(15)] + [
            ("u", 100 + i, 1000 + i, 1) for i in range(15)
        ]
        from timeseriestokenizer_spark.operators.drift import rank_sum_shift

        r = rank_sum_shift(
            _events(spark, rows), split_expr=F.col("y") == 0,
            key="k", val_col="x",
        ).collect()[0]
        assert r["u_stat"] == 0.0 and r["z"] < -4.0


def _rdp_oracle(ys, eps):
    """Textbook recursive RDP on integer series, integer arithmetic."""
    n = len(ys)
    kept = {0, n - 1}

    def rec(lo, hi):
        if hi - lo < 2:
            return
        dx, dy = hi - lo, ys[hi] - ys[lo]
        best_c2, best_j = -1, -1
        for j in range(lo + 1, hi):
            cross = dx * (ys[j] - ys[lo]) - dy * (j - lo)
            if cross * cross > best_c2:
                best_c2, best_j = cross * cross, j
        if best_c2 > eps * eps * (dx * dx + dy * dy):
            kept.add(best_j)
            rec(lo, best_j)
            rec(best_j, hi)

    rec(0, n - 1)
    return kept


class TestRdpKeep:
    def _run(self, spark, vals, eps):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.downsample import rdp_keep

        rows = rdp_keep(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id",
            epsilon=eps,
        ).collect()
        return {r["event_id"]: r["kept"] for r in rows}

    def test_straight_line_keeps_only_endpoints(self, spark):
        got = self._run(spark, [100 + 7 * i for i in range(50)], eps=1)
        assert sum(got.values()) == 2 and got[0] == 1 and got[49] == 1

    def test_spike_survives(self, spark):
        vals = [0] * 60
        vals[33] = 10_000
        got = self._run(spark, vals, eps=50)
        assert got[33] == 1
        assert sum(got.values()) == 3  # endpoints + the spike

    def test_matches_recursive_oracle(self, spark):
        rng = np.random.RandomState(23)
        vals = [int(v) for v in rng.randint(0, 5000, 80)]
        for eps in (0, 100, 1000):
            got = self._run(spark, vals, eps=eps)
            want = _rdp_oracle(vals, eps)
            assert {i for i, k in got.items() if k == 1} == want, eps


def _sampen_oracle(ys, r):
    nt = len(ys) - 2
    b = a = 0
    for i in range(nt):
        for j in range(i + 1, nt):
            if max(abs(ys[i] - ys[j]), abs(ys[i + 1] - ys[j + 1])) <= r:
                b += 1
                if abs(ys[i + 2] - ys[j + 2]) <= r:
                    a += 1
    e = None if a == 0 or b == 0 else round(-math.log(a / b), 6)
    return b, a, e


class TestSampleEntropy:
    def _run(self, spark, vals, r):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.anomaly import sample_entropy

        return sample_entropy(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id", r=r
        ).collect()[0]

    def test_matches_exhaustive_oracle(self, spark):
        rng = np.random.RandomState(29)
        vals = [int(v) for v in rng.randint(0, 300, 70)]
        got = self._run(spark, vals, r=60)
        b, a, e = _sampen_oracle(vals, 60)
        assert (got["b_count"], got["a_count"]) == (b, a)
        assert got["sampen"] == pytest.approx(e, abs=1e-6)

    def test_periodic_is_more_regular_than_noise(self, spark):
        periodic = [100 * (i % 4) for i in range(80)]
        rng = np.random.RandomState(31)
        noise = [int(v) for v in rng.randint(0, 400, 80)]
        ep = self._run(spark, periodic, r=50)["sampen"]
        en = self._run(spark, noise, r=50)["sampen"]
        assert ep == pytest.approx(0.0, abs=1e-9)  # every B-match extends
        assert en is None or en > 0.5

    def test_short_series_null(self, spark):
        got = self._run(spark, [1, 2, 3], r=10)
        assert (got["b_count"], got["a_count"], got["sampen"]) == (0, 0, None)


def _smk_oracle(vals, period):
    n = len(vals)
    S = 0
    var = 0
    from collections import Counter

    for p in range(period):
        idx = [i for i in range(n) if i % period == p]
        np_ = len(idx)
        for a in range(np_):
            for b_ in range(a + 1, np_):
                vi, vj = vals[idx[a]], vals[idx[b_]]
                S += (vj > vi) - (vj < vi)
        tvar = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(vals[i] for i in idx).values()
        )
        var += np_ * (np_ - 1) * (2 * np_ + 5) - tvar
    if S == 0:
        z = 0.0
    elif var > 0:
        z = (S - 1 if S > 0 else S + 1) / math.sqrt(var / 18.0)
    else:
        z = None
    return S, z


class TestSeasonalMannKendall:
    def _run(self, spark, vals, period):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.trend import (
            seasonal_mann_kendall,
        )

        return seasonal_mann_kendall(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id",
            period=period,
        ).collect()[0]

    def test_pure_seasonal_has_zero_trend(self, spark):
        # period-12 pattern repeated exactly: every phase is constant,
        # so S = 0 and Z = 0 — the case plain MK would misread.
        vals = [100 * (i % 12) for i in range(96)]
        r = self._run(spark, vals, 12)
        assert (r["s_stat"], r["z_stat"]) == (0, 0.0)

    def test_trend_under_seasonality_detected(self, spark):
        vals = [100 * (i % 12) + 3 * i for i in range(96)]
        r = self._run(spark, vals, 12)
        S, z = _smk_oracle(vals, 12)
        assert r["s_stat"] == S and S > 0
        assert r["z_stat"] == pytest.approx(z, rel=1e-12)
        assert r["z_stat"] > 3.0

    def test_matches_oracle_with_ties_and_short_phases(self, spark):
        rng = np.random.RandomState(37)
        vals = [int(v) for v in rng.randint(0, 8, 13)]  # one 2-pt phase
        r = self._run(spark, vals, 12)
        S, z = _smk_oracle(vals, 12)
        assert r["s_stat"] == S
        assert r["n_points"] == 13
        if z is None:
            assert r["z_stat"] is None or r["z_stat"] == 0.0
        else:
            assert r["z_stat"] == pytest.approx(z, rel=1e-12)


class TestAsofLerp:
    def _run(self, spark, samples, probes):
        sdf = spark.createDataFrame(
            [("a", T0 + dt.timedelta(seconds=s), int(v)) for s, v in samples],
            "k string, ts timestamp, v long",
        )
        pdf = spark.createDataFrame(
            [("a", i, T0 + dt.timedelta(seconds=s)) for i, s in enumerate(probes)],
            "k string, pid long, ts timestamp",
        )
        from timeseriestokenizer_spark.operators.asof import asof_lerp

        rows = asof_lerp(
            pdf, sdf, "k", left_ts="ts", right_ts="ts", val_col="v"
        ).collect()
        return {r["pid"]: r["lerp_v"] for r in rows}

    def test_interior_midpoints_and_exact_hits(self, spark):
        got = self._run(
            spark,
            samples=[(0, 100), (10, 200), (30, 100)],
            probes=[0, 5, 10, 15, 25, 30],
        )
        assert got[0] == 100.0  # exact hit on first sample
        assert got[1] == 150.0  # halfway up
        assert got[2] == 200.0  # exact hit
        assert got[3] == pytest.approx(175.0)  # quarter down the 20s leg
        assert got[4] == pytest.approx(125.0)
        assert got[5] == 100.0

    def test_no_extrapolation(self, spark):
        got = self._run(
            spark, samples=[(10, 100), (20, 200)], probes=[5, 25, 10, 20]
        )
        assert got[0] is None and got[1] is None  # outside the bracket
        assert got[2] == 100.0 and got[3] == 200.0

    def test_linear_series_recovered_exactly(self, spark):
        # samples on v = 40 + 3s at s ∈ {0, 60, 120, ...}: any probe inside
        # recovers the line exactly (the lerp chain is exact on this data)
        samples = [(60 * i, 40 + 3 * 60 * i) for i in range(10)]
        probes = list(range(0, 541, 7))
        got = self._run(spark, samples, probes)
        for i, s in enumerate(probes):
            assert got[i] == pytest.approx(40 + 3 * s, abs=1e-9), s


def _hurst_oracle(vals, ws=(8, 16, 32)):
    from timeseriestokenizer_spark.operators.trend import hurst_xvals

    xs = hurst_xvals(ws)
    n = len(vals)
    var_m = {}
    for w in ws:
        k = n // w
        if k < 2:
            return None
        sb = [sum(vals[b * w : (b + 1) * w]) for b in range(k)]
        s1, s2 = sum(sb), sum(b * b for b in sb)
        var_m[w] = float(k * s2 - s1 * s1) / float(k * k * w * w)
    if any(v <= 0 for v in var_m.values()):
        return None
    ysv = [math.log(var_m[w]) for w in ws]
    xbar = sum(xs) / len(xs)
    ybar = ((ysv[0] + ysv[1]) + ysv[2]) / 3.0
    sxy = sum((y - ybar) * (x - xbar) for x, y in zip(xs, ysv))
    sxx = sum((x - xbar) * (x - xbar) for x in xs)
    return round(1.0 + (sxy / sxx) / 2.0, 6)


class TestHurstVar:
    def _run(self, spark, vals):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.trend import hurst_var

        return hurst_var(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()[0]

    def test_matches_python_oracle(self, spark):
        rng = np.random.RandomState(41)
        vals = [int(v) for v in rng.randint(0, 10000, 256)]
        r = self._run(spark, vals)
        assert r["hurst"] == pytest.approx(_hurst_oracle(vals), abs=1e-6)

    def test_white_noise_near_half_random_walk_near_one(self, spark):
        rng = np.random.RandomState(43)
        noise = [int(v) for v in rng.randint(0, 10000, 1024)]
        steps = rng.randint(-50, 51, 1024)
        walk = [int(v) for v in np.cumsum(steps) + 100000]
        h_noise = self._run(spark, noise)["hurst"]
        h_walk = self._run(spark, walk)["hurst"]
        assert 0.3 < h_noise < 0.7
        assert h_walk > 0.85
        assert h_walk > h_noise + 0.2

    def test_short_or_constant_series_null(self, spark):
        # < 64 points can't give 2 full blocks at w=32 → NULL by contract
        assert self._run(spark, [1, 2, 3] * 10)["hurst"] is None
        assert self._run(spark, ([1, 2, 3] * 43))["hurst"] is not None
        r = self._run(spark, [7] * 100)  # constant: zero variance
        assert r["hurst"] is None


def _pacf_oracle(vals, kmax=5):
    n = len(vals)
    c0 = [v * n - sum(vals) for v in vals]
    denom = sum(c * c for c in c0)
    if denom <= 0:
        return {k: None for k in range(1, kmax + 1)}
    r = {
        k: float(sum(c0[t] * c0[t + k] for t in range(n - k))) / float(denom)
        for k in range(1, kmax + 1)
    }
    phi = {(1, 1): r[1]}
    for k in range(2, kmax + 1):
        num, den = r[k], 1.0
        for j in range(1, k):
            num -= phi[(k - 1, j)] * r[k - j]
            den -= phi[(k - 1, j)] * r[j]
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    return {k: phi[(k, k)] for k in range(1, kmax + 1)}


class TestPacf:
    def _run(self, spark, vals):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.decompose import pacf

        rows = pacf(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()
        return {r["lag"]: r["pacf"] for r in rows}

    def test_matches_durbin_levinson_oracle(self, spark):
        rng = np.random.RandomState(59)
        vals = [int(v) for v in rng.randint(0, 5000, 120)]
        got = self._run(spark, vals)
        want = _pacf_oracle(vals)
        for k in range(1, 6):
            assert got[k] == pytest.approx(want[k], rel=1e-12), k

    def test_ar1_cuts_off_after_lag_one(self, spark):
        # x_t = 0.7 x_{t-1} + noise (integerized): PACF(1) large, 2..5 small
        rng = np.random.RandomState(61)
        x, vals = 0.0, []
        for _ in range(400):
            x = 0.7 * x + rng.normal(0, 100)
            vals.append(int(round(x)) + 10000)
        got = self._run(spark, vals)
        assert got[1] > 0.5
        for k in range(2, 6):
            assert abs(got[k]) < 0.2, (k, got[k])

    def test_constant_series_all_null(self, spark):
        got = self._run(spark, [42] * 50)
        assert all(got[k] is None for k in range(1, 6))


class TestLjungBox:
    def _run(self, spark, vals):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.decompose import ljung_box

        return ljung_box(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()[0]

    def test_matches_python_oracle(self, spark):
        rng = np.random.RandomState(67)
        vals = [int(v) for v in rng.randint(0, 5000, 150)]
        n = len(vals)
        c0 = [v * n - sum(vals) for v in vals]
        denom = sum(c * c for c in c0)
        acc = 0.0
        for k in range(1, 6):
            rk = float(sum(c0[t] * c0[t + k] for t in range(n - k))) / float(denom)
            acc += (rk * rk) / float(n - k)
        want = float(n * (n + 2)) * acc
        assert self._run(spark, vals)["q_stat"] == pytest.approx(want, rel=1e-12)

    def test_autocorrelated_far_exceeds_noise(self, spark):
        rng = np.random.RandomState(71)
        noise = [int(v) for v in rng.randint(0, 5000, 300)]
        walk = [int(v) for v in np.cumsum(rng.randint(-50, 51, 300)) + 10000]
        q_noise = self._run(spark, noise)["q_stat"]
        q_walk = self._run(spark, walk)["q_stat"]
        assert q_noise < 20  # ~chi2(5) scale for white noise
        assert q_walk > 500 and q_walk > 50 * q_noise

    def test_short_and_constant_null(self, spark):
        assert self._run(spark, [1, 2, 3, 4, 5])["q_stat"] is None  # n == h
        assert self._run(spark, [9] * 40)["q_stat"] is None


class TestOuHalflife:
    def _run(self, spark, vals):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.decompose import ou_halflife

        return ou_halflife(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()[0]

    def test_ar1_halflife_recovered(self, spark):
        # φ = 0.8 ⇒ theoretical half-life ln2/ln(1/0.8) ≈ 3.106 steps;
        # the sample estimate on 3000 points lands near it.
        rng = np.random.RandomState(73)
        x, vals = 0.0, []
        for _ in range(3000):
            x = 0.8 * x + rng.normal(0, 50)
            vals.append(int(round(x)) + 5000)
        r = self._run(spark, vals)
        assert 0.7 < r["phi"] < 0.9
        want = -math.log(2.0) / math.log(r["phi"])
        assert r["halflife_steps"] == pytest.approx(want, abs=1e-6)
        assert 2.0 < r["halflife_steps"] < 5.5

    def test_oscillating_and_constant_null(self, spark):
        osc = [100 if i % 2 else -100 for i in range(200)]  # φ < 0
        r = self._run(spark, osc)
        assert r["phi"] < 0 and r["halflife_steps"] is None
        r2 = self._run(spark, [7] * 50)
        assert r2["phi"] is None and r2["halflife_steps"] is None


class TestRunsAndTurningPoints:
    def _runs(self, spark, vals):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.decompose import runs_test

        out = runs_test(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()
        return out[0] if out else None

    def _tp(self, spark, vals):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.decompose import turning_points

        return turning_points(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()[0]

    def test_runs_extremes(self, spark):
        # a two-valued series collapses under median tie-dropping (the
        # median IS one of the sides), so plant one middle sentinel that
        # becomes the median and drops out, leaving a clean dichotomy
        alt = [10 if i % 2 else 90 for i in range(60)] + [50]
        r = self._runs(spark, alt)
        assert r["r_runs"] == 60 and r["z_runs"] > 5
        blocks = [10] * 20 + [50] + [90] * 20
        r2 = self._runs(spark, blocks)
        assert r2["r_runs"] == 2 and r2["z_runs"] < -5
        # all equal: every row ties the median → no output row
        assert self._runs(spark, [7] * 20) is None

    def test_runs_counts_match_bruteforce(self, spark):
        rng = np.random.RandomState(79)
        vals = [int(v) for v in rng.randint(0, 100, 75)]
        med = sorted(vals)[(len(vals) + 1) // 2 - 1]  # lower median
        sides = [v > med for v in vals if v != med]
        runs = 1 + sum(a != b for a, b in zip(sides, sides[1:]))
        r = self._runs(spark, vals)
        assert r["r_runs"] == runs
        assert r["n1"] == sum(sides) and r["n0"] == len(sides) - sum(sides)

    def test_turning_points_extremes(self, spark):
        saw = [0 if i % 2 else 100 for i in range(50)]  # every interior turns
        r = self._tp(spark, saw)
        assert r["t_points"] == 48 and r["z_turning"] > 5
        mono = list(range(50))  # no turning points
        r2 = self._tp(spark, mono)
        assert r2["t_points"] == 0 and r2["z_turning"] < -5
        # plateaus: strict comparisons see no extremum
        r3 = self._tp(spark, [1, 5, 5, 1] * 10)
        rng = np.random.RandomState(83)
        vals = [int(v) for v in rng.randint(0, 1000, 100)]
        r4 = self._tp(spark, vals)
        t_want = sum(
            1
            for i in range(1, 99)
            if (vals[i - 1] < vals[i] > vals[i + 1])
            or (vals[i - 1] > vals[i] < vals[i + 1])
        )
        assert r4["t_points"] == t_want
        assert abs(r4["z_turning"]) < 3  # random data: no signal


class TestVarianceRatio:
    def _run(self, spark, vals):
        df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
        from timeseriestokenizer_spark.operators.trend import variance_ratio

        return variance_ratio(
            df, key="k", ts_col="ts", val_col="x", id_col="event_id"
        ).collect()[0]

    def test_matches_python_oracle(self, spark):
        rng = np.random.RandomState(89)
        vals = [int(v) for v in rng.randint(0, 5000, 200)]
        r = self._run(spark, vals)
        d = [b - a for a, b in zip(vals, vals[1:])]
        m = len(d)
        D = sum(d)
        ssd = sum((m * di - D) ** 2 for di in d)
        var1 = float(ssd) / (float(m * m) * float(m))
        for q in (2, 4, 8):
            ys = [vals[t + q] - vals[t] for t in range(len(vals) - q)]
            ssy = sum((m * y - q * D) ** 2 for y in ys)
            varq = float(ssy) / (float(m * m) * float(m - q + 1))
            assert r[f"vr_{q}"] == pytest.approx(varq / (q * var1), rel=1e-12)

    def test_regimes(self, spark):
        rng = np.random.RandomState(97)
        walk = [int(v) for v in np.cumsum(rng.randint(-50, 51, 600)) + 100000]
        r_walk = self._run(spark, walk)
        for q in (2, 4, 8):
            assert 0.6 < r_walk[f"vr_{q}"] < 1.5, (q, r_walk[f"vr_{q}"])
        # strong mean reversion: white noise LEVELS (differences anti-correlate)
        noise = [int(v) for v in rng.randint(0, 10000, 600)]
        r_rev = self._run(spark, noise)
        assert r_rev["vr_8"] < 0.4
        # momentum needs POSITIVELY AUTOCORRELATED increments (a pure
        # drift is absorbed by the mean): AR(1) steps with phi = 0.8
        d, steps = 0.0, []
        for _ in range(600):
            d = 0.8 * d + rng.normal(0, 30)
            steps.append(int(round(d)))
        mom = [int(v) for v in np.cumsum(steps) + 500000]
        r_tr = self._run(spark, mom)
        assert r_tr["vr_8"] > 2.0

    def test_constant_series_null(self, spark):
        r = self._run(spark, [5] * 100)
        assert all(r[f"vr_{q}"] is None for q in (2, 4, 8))


class TestTransitionConcentration:
    def test_deterministic_vs_uniform(self, spark):
        rows = []
        # user "det": a -> b always; b -> a always (concentration 1)
        for i in range(40):
            rows.append(("det", T0 + dt.timedelta(minutes=i), i, "a" if i % 2 == 0 else "b"))
        # user "uni": x -> y/z alternating evenly (concentration 1/2)
        seq = ["x", "y", "x", "z"] * 10
        for i, t in enumerate(seq):
            rows.append(("uni", T0 + dt.timedelta(minutes=i), 1000 + i, t))
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, event_id long, event_type string"
        )
        from timeseriestokenizer_spark.operators.behavior import (
            transition_concentration,
        )

        out = {
            (r["k"], r["prev_type"]): r
            for r in transition_concentration(
                df, key="k", ts_col="ts", type_col="event_type",
                id_col="event_id",
            ).collect()
        }
        assert out[("det", "a")]["concentration"] == 1.0
        assert out[("det", "a")]["top_next"] == "b"
        r = out[("uni", "x")]
        assert r["concentration"] == pytest.approx(0.5)
        assert r["n_targets"] == 2 and r["top_next"] == "y"  # tie → lexical


class TestBenfordDeviation:
    def _run(self, spark, vals):
        df = spark.createDataFrame(
            [("a", int(v)) for v in vals], "k string, v long"
        )
        from timeseriestokenizer_spark.operators.drift import benford_deviation

        out = benford_deviation(df, key="k", val_col="v").collect()
        return out[0] if out else None

    def test_benford_like_vs_concentrated(self, spark):
        # geometric spread across decades is near-Benford
        rng = np.random.RandomState(101)
        benfordish = [int(10 ** (u * 5)) + 1 for u in rng.uniform(0, 1, 4000)]
        r1 = self._run(spark, benfordish)
        assert r1["benford_tvd"] < 0.08  # sampling + the +1 offset at small decades
        # every value leads with 9: maximal deviation ≈ 1 - log10(10/9)
        r2 = self._run(spark, [9000 + i for i in range(900)])
        assert r2["benford_tvd"] > 0.85

    def test_matches_python_oracle_and_drops_nonpositive(self, spark):
        from timeseriestokenizer_spark.operators.drift import benford_expected

        rng = np.random.RandomState(103)
        vals = [int(v) for v in rng.randint(1, 10**6, 500)] + [0, -5, -17]
        r = self._run(spark, vals)
        pos = [v for v in vals if v > 0]
        n = len(pos)
        assert r["n_points"] == n
        e = benford_expected()
        c = [0] * 10
        for v in pos:
            c[int(str(v)[0])] += 1
        num = sum(abs(10**6 * c[d] - e[d - 1] * n) for d in range(1, 10))
        assert r["benford_tvd"] == pytest.approx(num / (2 * 10**6 * n), abs=0)


def test_sample_entropy_chunked_path_identical(spark):
    """Force the multi-chunk pair scan (tiny cell budget) and pin it to
    the single-chunk result — the counts must not depend on chunking."""
    rng = np.random.RandomState(107)
    vals = [int(v) for v in rng.randint(0, 300, 120)]
    df = _events(spark, [("a", i, v, 0) for i, v in enumerate(vals)])
    from timeseriestokenizer_spark.operators.anomaly import sample_entropy

    one = sample_entropy(
        df, key="k", ts_col="ts", val_col="x", id_col="event_id", r=60
    ).collect()[0]
    many = sample_entropy(
        df, key="k", ts_col="ts", val_col="x", id_col="event_id", r=60,
        cell_budget=500,  # step ≈ 4 rows per chunk at nt = 118
    ).collect()[0]
    assert (one["b_count"], one["a_count"], one["sampen"]) == (
        many["b_count"], many["a_count"], many["sampen"],
    )
