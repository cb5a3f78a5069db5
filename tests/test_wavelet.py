"""operators/wavelet.py: the level-k coefficients must equal the ITERATED
pairwise average/difference pyramid (the defining recursion, not the
closed-form block sums the implementation uses), one level must invert
exactly, odd tails truncate per level, and the plan stays one-exchange
JVM-only."""

import numpy as np
import pandas as pd
import pytest

from timeseriestokenizer_spark.operators.wavelet import haar_dwt


def _pyramid(x, levels):
    """Reference recursion: a_k from pairwise means of a_{k-1}."""
    out = {}
    a = x.astype(np.float64)
    for k in range(1, levels + 1):
        m = len(a) // 2
        ap = (a[0 : 2 * m : 2] + a[1 : 2 * m : 2]) / 2.0
        dt = (a[0 : 2 * m : 2] - a[1 : 2 * m : 2]) / 2.0
        out[k] = (ap, dt)
        a = ap
    return out


@pytest.fixture(scope="module")
def wav_df(spark):
    rng = np.random.default_rng(3)
    rows, eid = [], 0
    base = pd.Timestamp("2024-02-01")
    for uid, n in [(0, 16), (1, 13), (2, 3), (3, 1)]:  # odd tails + tiny series
        for i in range(n):
            rows.append((eid, uid, base + pd.Timedelta(minutes=i),
                         int(rng.integers(-500, 500)))); eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    return spark.createDataFrame(pdf), pdf


def test_haar_matches_pyramid(spark, wav_df):
    df, pdf = wav_df
    res = haar_dwt(df, key="user_id", levels=3).collect()
    got = {(r["user_id"], r["level"], r["idx"]): (r["approx"], r["detail"]) for r in res}
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        x = g["value"].to_numpy()
        if len(x) < 2:
            continue
        ref = _pyramid(x, 3)
        for k in range(1, 4):
            ap, dt = ref[k]
            # closed-form truncation: floor(n/2^k) blocks of the ORIGINAL series
            nb = len(x) // (1 << k)
            for b in range(nb):
                assert got[(uid, k, b)] == (ap[b], dt[b]), (uid, k, b)
    # counts: per level exactly floor(n/2^k) blocks, nothing else
    expect = sum(len(g) // (1 << k) for _, g in pdf.groupby("user_id") for k in (1, 2, 3))
    assert len(res) == expect
    assert not [r for r in res if r["user_id"] == 3]  # 1-point series absent


def test_haar_level_roundtrip(spark, wav_df):
    df, pdf = wav_df
    got = {
        (r["user_id"], r["idx"]): r
        for r in haar_dwt(df, key="user_id", levels=1).collect()
    }
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        x = g["value"].to_numpy()
        for b in range(len(x) // 2):
            r = got[(uid, b)]
            assert r["approx"] + r["detail"] == x[2 * b]
            assert r["approx"] - r["detail"] == x[2 * b + 1]


def test_haar_plan_and_args(spark, wav_df):
    df, _ = wav_df
    plan = haar_dwt(df, key="user_id", levels=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "Join" not in plan
    with pytest.raises(ValueError):
        haar_dwt(df, key="user_id", levels=0)
