"""Gorilla pack/unpack exactness + compression sanity (SURVEY §5.2.2)."""

import numpy as np
import pandas as pd
import pytest

from timeseriestokenizer_spark.operators.gorilla import (
    gorilla_pack,
    gorilla_unpack,
    pack_series,
    unpack_series,
)


def _roundtrip(ts, vals):
    blob = pack_series(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, v2 = unpack_series(blob)
    assert np.array_equal(ts2, np.asarray(ts, np.int64))
    assert np.array_equal(
        v2.view(np.uint64), np.asarray(vals, np.float64).view(np.uint64)
    )  # bit-exact incl. NaN
    return blob


def test_roundtrip_regular_cadence():
    ts = np.arange(0, 60_000_000 * 100, 60_000_000)  # every minute, µs
    vals = np.sin(np.arange(100) / 5.0) * 100
    blob = _roundtrip(ts, vals)
    assert len(blob) < len(ts) * 16  # compresses


def test_roundtrip_constant_values_high_ratio():
    ts = np.arange(0, 1_000_000 * 500, 1_000_000)
    vals = np.full(500, 42.5)
    blob = _roundtrip(ts, vals)
    # constant value + constant cadence → ~2 bits/point after header
    assert len(blob) < 200


def test_roundtrip_adversarial():
    rng = np.random.RandomState(0)
    ts = np.cumsum(rng.randint(1, 10**7, 300)).astype(np.int64)
    vals = rng.standard_normal(300) * 1e12
    _roundtrip(ts, vals)


def test_roundtrip_specials():
    ts = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    vals = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0])
    _roundtrip(ts, vals)


def test_roundtrip_empty_and_single():
    _roundtrip(np.array([], np.int64), np.array([], np.float64))
    _roundtrip(np.array([123456789], np.int64), np.array([3.14]))


def test_roundtrip_negative_and_huge_dod():
    ts = np.array([10**17, 10**17 + 1, 10**17 + 10**12, 10**17 + 10**12 + 5], np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    _roundtrip(ts, vals)


def test_spark_pack_unpack(spark):
    rng = np.random.RandomState(1)
    pdf = pd.DataFrame(
        {
            "series_id": np.repeat(["a", "b"], 200),
            "ts": pd.to_datetime(
                np.concatenate([np.cumsum(rng.randint(1, 1000, 200))] * 2) * 1000,
                unit="us",
            ),
            # integer-valued floats → long trailing-zero runs → XOR compresses
            "value": np.floor(np.sin(np.arange(400) / 7.0) * 50),
        }
    )
    df = spark.createDataFrame(pdf)
    packed = gorilla_pack(df, "series_id", "ts", "value").cache()
    stats = {r["series_id"]: r for r in packed.collect()}
    assert stats["a"]["n_points"] == 200
    assert stats["a"]["packed_bytes"] < stats["a"]["raw_bytes"]
    out = gorilla_unpack(packed).toPandas().sort_values(["series_id", "ts"])
    exp = pdf.sort_values(["series_id", "ts"])
    assert np.array_equal(
        out["ts"].astype("datetime64[us]").to_numpy(),
        exp["ts"].astype("datetime64[us]").to_numpy(),
    )
    assert np.array_equal(out["value"].to_numpy(), exp["value"].to_numpy())
    packed.unpersist()


@pytest.mark.parametrize("seed", [2, 3, 4])
def test_roundtrip_property_random(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(2, 400)
    ts = np.cumsum(rng.randint(0, 2**40, n)).astype(np.int64)
    kinds = rng.randint(0, 3)
    if kinds == 0:
        vals = rng.standard_normal(n)
    elif kinds == 1:
        vals = np.round(rng.standard_normal(n), 1)  # repeating low-entropy
    else:
        vals = rng.choice([0.0, 1.5, np.nan], n)
    _roundtrip(ts, vals)


def test_ewma_matches_explicit_recurrence(spark):
    """EWMA engine path == explicit Python recurrence: bit-exact at dyadic
    alpha, and within float tolerance at a non-dyadic alpha."""
    import numpy as np
    import pandas as pd

    from timeseriestokenizer_spark.operators.smoothing import ewma

    rng = np.random.RandomState(3)
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    expected = {}
    for s in ("a", "b"):
        x = np.round(rng.uniform(0, 100, 40), 2)
        y = x[0]
        for i, v in enumerate(x):
            if i:
                y = 0.5 * y + 0.5 * v
            rows.append((s, base + pd.Timedelta(seconds=i), float(v), eid))
            expected[eid] = y
            eid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "ts", "value", "event_id"])
    )
    got = {r["event_id"]: r["ewma"] for r in ewma(df, alpha=0.5).collect()}
    assert got == expected  # BIT-exact at dyadic alpha

    got3 = {r["event_id"]: r["ewma"] for r in ewma(df, alpha=0.3).collect()}
    y = {}
    eid = 0
    for s in ("a", "b"):
        prev = None
        for e in range(40):
            v = [r for r in rows if r[3] == eid][0][2]
            prev = v if prev is None else 0.3 * v + 0.7 * prev
            y[eid] = prev
            eid += 1
    assert all(abs(got3[k] - y[k]) < 1e-9 for k in y)  # non-dyadic: tolerance


def test_holt_matches_explicit_recurrence(spark):
    """Holt smoothing vs an explicit Python recurrence: bit-exact at
    dyadic (0.5, 0.5); 1e-9 tolerance at non-dyadic coefficients (same
    float contract as ewma)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from timeseriestokenizer_spark.operators.smoothing import holt

    rng = np.random.RandomState(13)
    rows = []
    eid = 0
    base = pd.Timestamp("2026-07-01")
    for k in ("a", "b"):
        for i in range(60):
            rows.append((k, (base + pd.Timedelta(seconds=5 * i)).to_pydatetime(),
                         eid, round(float(rng.uniform(0, 100)), 2)))
            eid += 1
    rows.append(("solo", base.to_pydatetime(), eid, 42.0))  # singleton: trend 0
    df = spark.createDataFrame(rows, "k string, ts timestamp, event_id long, value double")

    def reference(vals, a, bcf):
        l = vals[0]
        b = vals[1] - vals[0] if len(vals) >= 2 else 0.0
        out = [(l, b)]
        for x in vals[1:]:
            ln = a * x + (1 - a) * (l + b)
            b = bcf * (ln - l) + (1 - bcf) * b
            l = ln
            out.append((l, b))
        return out

    for a, bcf, exact in ((0.5, 0.5, True), (0.3, 0.2, False)):
        got = {
            r["event_id"]: (r["holt_level"], r["holt_trend"])
            for r in holt(df, key="k", alpha=a, beta=bcf).collect()
        }
        eid = 0
        for k in ("a", "b"):
            vals = [v for kk, _, _, v in rows if kk == k]
            for l, b in reference(vals, a, bcf):
                gl, gb = got[eid]
                if exact:
                    assert (gl, gb) == (l, b), eid
                else:
                    assert abs(gl - l) < 1e-9 and abs(gb - b) < 1e-9, eid
                eid += 1
        assert got[max(got)] == (42.0, 0.0)  # singleton series

def test_holt_winters_matches_explicit_recurrence(spark):
    """Holt-Winters triple smoothing vs an explicit Python recurrence:
    bit-exact at the contract coefficients (0.5, 0.25, 0.25, m=4) AND at
    a second parameter set; checks the seasonal ring wraps correctly
    (series longer than several periods), the t<m zero-season cold start,
    and the singleton/short-series branches."""
    import numpy as np
    import pandas as pd

    from timeseriestokenizer_spark.operators.smoothing import holt_winters

    rng = np.random.RandomState(29)
    rows = []
    eid = 0
    base = pd.Timestamp("2026-07-01")
    # seasonal signal: sin wave + noise so the season slots matter
    for k in ("a", "b"):
        for i in range(50):
            v = round(10.0 * float(np.sin(2 * np.pi * (i % 4) / 4))
                      + float(rng.uniform(0, 5)), 2)
            rows.append((k, (base + pd.Timedelta(seconds=5 * i)).to_pydatetime(),
                         eid, v))
            eid += 1
    rows.append(("short", base.to_pydatetime(), eid, 7.0))
    rows.append(("short", (base + pd.Timedelta(seconds=5)).to_pydatetime(), eid + 1, 9.0))
    rows.append(("solo", base.to_pydatetime(), eid + 2, 42.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, event_id long, value double")

    def reference(vals, a, bcf, g, m):
        l = vals[0]
        b = vals[1] - vals[0] if len(vals) >= 2 else 0.0
        seas = [0.0] * m
        out = [(l, b, 0.0)]
        for t, x in enumerate(vals[1:], start=1):
            s_old = seas[t % m]
            ln = a * (x - s_old) + (1.0 - a) * (l + b)
            b = bcf * (ln - l) + (1.0 - bcf) * b
            sn = g * (x - ln) + (1.0 - g) * s_old
            seas[t % m] = sn
            l = ln
            out.append((l, b, sn))
        return out

    for a, bcf, g, m in ((0.5, 0.25, 0.25, 4), (0.5, 0.5, 0.5, 3)):
        got = {
            r["event_id"]: (r["hw_level"], r["hw_trend"], r["hw_season"])
            for r in holt_winters(
                df, key="k", alpha=a, beta=bcf, gamma=g, period=m
            ).collect()
        }
        assert len(got) == len(rows)
        eid = 0
        for k in ("a", "b"):
            vals = [v for kk, _, _, v in rows if kk == k]
            for want in reference(vals, a, bcf, g, m):
                assert got[eid] == want, (k, eid)
                eid += 1
        assert got[eid] == (7.0, 2.0, 0.0)       # short: b = x1-x0, s0 = 0
        want_short = reference([7.0, 9.0], a, bcf, g, m)[1]
        assert got[eid + 1] == want_short
        assert got[eid + 2] == (42.0, 0.0, 0.0)  # singleton


def test_ewm_band_recurrence_and_breach(spark):
    """EW control band: bit-equal to the explicit Python recurrence, band
    judged by PRIOR state (the spike flags, its successor judged by the
    already-widened band), first point never breaches."""
    import math
    from datetime import datetime, timedelta

    from timeseriestokenizer_spark.operators.smoothing import ewm_band

    t0 = datetime(2024, 1, 1)
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 10.3, 50.0, 10.0]
    rows = [("s", t0 + timedelta(minutes=i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, ts timestamp, event_id long, value double"
    )
    got = {
        r["event_id"]: r
        for r in ewm_band(df, alpha=0.25, z=3.0).collect()
    }

    a, z = 0.25, 3.0
    m, v = vals[0], 0.0
    exp = [(0, m, v, False)]
    for i, x in enumerate(vals[1:], start=1):
        d = x - m
        br = v > 0.0 and abs(d) > z * math.sqrt(v)
        step = a * d
        m = m + step
        v = (1.0 - a) * (v + step * d)
        exp.append((i, m, v, br))
    for i, em, ev, ebr in exp:
        r = got[i]
        assert r["ewm_mean"] == em and r["ewm_var"] == ev  # bit-equal
        assert r["breach"] == ebr
    # the planted spike breaches; nothing before it does
    assert got[8]["breach"] is True
    assert not any(got[i]["breach"] for i in range(8))


def test_kalman_level_recurrence_and_convergence(spark):
    """kalman_level == explicit same-op-order Python recurrence BIT-exactly
    (the op sequence is the contract, divisions included); the gain
    converges to the Riccati steady state; a singleton series emits its
    own value with gain 0 and prior variance r."""
    import math

    import numpy as np
    import pandas as pd

    from timeseriestokenizer_spark.operators.smoothing import kalman_level

    q, r = 0.25, 1.0
    rng = np.random.RandomState(9)
    base = pd.Timestamp("2024-01-01")
    rows, expected = [], {}
    eid = 0
    for s in ("a", "b"):
        z = np.round(rng.uniform(0, 50, 60), 2)
        x, p = float(z[0]), r
        for i, v in enumerate(z):
            if i:
                p_pred = p + q
                gain = p_pred / (p_pred + r)
                x = x + gain * (float(v) - x)
                p = (1.0 - gain) * p_pred
            else:
                gain = 0.0
            rows.append((s, base + pd.Timedelta(seconds=i), float(v), eid))
            expected[eid] = (x, p, gain)
            eid += 1
    rows.append(("solo", base, 7.25, eid))
    expected[eid] = (7.25, r, 0.0)
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "ts", "value", "event_id"])
    )
    got = {
        rr["event_id"]: (rr["kf_mean"], rr["kf_var"], rr["kf_gain"])
        for rr in kalman_level(df, q=q, r=r).collect()
    }
    assert got == expected  # bit-exact, divisions and all

    # steady-state gain: K* solves K = (P+q)/(P+q+r) with P = (1-K)(P+q)
    # -> P* = (q + sqrt(q*q + 4*q*r)) / 2 pre-update variance fixed point
    p_star = (q + math.sqrt(q * q + 4.0 * q * r)) / 2.0
    k_star = p_star / (p_star + r)
    last_gain = got[59][2]  # 60th point of series "a"
    assert abs(last_gain - k_star) < 1e-9
