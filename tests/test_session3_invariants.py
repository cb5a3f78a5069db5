"""Structural invariants of the session-3 operators — properties that
fixed-fixture oracle equality cannot certify (equality only pins one
input). Each invariant is the mathematical signature of the operator
class: rank statistics MUST be invariant under strictly monotone value
transforms, a cross-correlation MUST be antisymmetric in (signal swap,
lag negation), entropy/geometry screens MUST be translation invariant.
A regression here means the implementation stopped computing the
statistic it claims.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _df(spark, vals, second=None):
    second = second if second is not None else [0] * len(vals)
    return spark.createDataFrame(
        [
            ("a", T0 + dt.timedelta(minutes=i), i, int(x), int(y))
            for i, (x, y) in enumerate(zip(vals, second))
        ],
        "k string, ts timestamp, event_id long, x long, y long",
    )


@pytest.fixture(scope="module")
def vals():
    rng = np.random.RandomState(47)
    return [int(v) for v in rng.randint(0, 500, 90)]


def _monotone(vs):
    """A strictly increasing, deliberately non-affine integer map."""
    return [7 * v * v + 3 * v + 11 for v in vs]  # strictly ↑ for v >= 0


def test_pettitt_is_rank_invariant(spark, vals):
    from timeseriestokenizer_spark.operators.anomaly import pettitt_changepoint

    def run(vs):
        r = pettitt_changepoint(
            _df(spark, vs), key="k", ts_col="ts", val_col="x",
            id_col="event_id",
        ).collect()[0]
        return (r["k_star"], r["u_abs"])

    assert run(vals) == run(_monotone(vals))


def test_seasonal_mk_is_rank_invariant(spark, vals):
    from timeseriestokenizer_spark.operators.trend import seasonal_mann_kendall

    def run(vs):
        r = seasonal_mann_kendall(
            _df(spark, vs), key="k", ts_col="ts", val_col="x",
            id_col="event_id", period=12,
        ).collect()[0]
        return (r["s_stat"], r["z_stat"])

    assert run(vals) == run(_monotone(vals))


def test_ks_and_rank_sum_are_rank_invariant(spark, vals):
    from timeseriestokenizer_spark.operators.drift import ks_drift, rank_sum_shift

    split = F.col("event_id") < 45

    def run(vs):
        ks = ks_drift(_df(spark, vs), split, key="k", val_col="x").collect()[0]
        mw = rank_sum_shift(
            _df(spark, vs), split, key="k", val_col="x"
        ).collect()[0]
        return (ks["ks_d"], mw["u_stat"], mw["z"])

    assert run(vals) == run(_monotone(vals))


def test_ccf_antisymmetry(spark, vals):
    # swapping the two signals and negating the lag must give the same r:
    # r_xy(k) = r_yx(-k) — the defining CCF identity.
    from timeseriestokenizer_spark.operators.correlate import ccf

    rng = np.random.RandomState(53)
    other = [int(v) for v in rng.randint(0, 500, len(vals))]

    def run(xc, yc):
        rows = ccf(
            _df(spark, vals, other), key="k", x_col=xc, y_col=yc,
            max_lag=3, min_points=10,
        ).collect()
        return {r["lag"]: r["ccf"] for r in rows}

    fwd, rev = run("x", "y"), run("y", "x")
    for k in range(-3, 4):
        assert fwd[k] == rev[-k], k


def test_sample_entropy_translation_and_r_monotonicity(spark, vals):
    from timeseriestokenizer_spark.operators.anomaly import sample_entropy

    def run(vs, r):
        row = sample_entropy(
            _df(spark, vs), key="k", ts_col="ts", val_col="x",
            id_col="event_id", r=r,
        ).collect()[0]
        return (row["b_count"], row["a_count"], row["sampen"])

    shifted = [v + 10_000 for v in vals]
    assert run(vals, 60) == run(shifted, 60)
    counts = [run(vals, r)[:2] for r in (20, 60, 180)]
    for (b1, a1), (b2, a2) in zip(counts, counts[1:]):
        assert b1 <= b2 and a1 <= a2  # matches only grow with tolerance


def test_rdp_translation_invariance(spark, vals):
    from timeseriestokenizer_spark.operators.downsample import rdp_keep

    def run(vs):
        rows = rdp_keep(
            _df(spark, vs), key="k", ts_col="ts", val_col="x",
            id_col="event_id", epsilon=40,
        ).collect()
        return tuple(sorted(r["event_id"] for r in rows if r["kept"] == 1))

    assert run(vals) == run([v - 250 for v in vals])
