"""Swinging-door trending: canonical shape cases + the reconstruction
tolerance property on real data."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.downsample import swinging_door


def _df(spark, vals, step_s=60):
    rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * step_s), i, float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


def _kept(spark, vals, E):
    out = swinging_door(_df(spark, vals), comp_dev=E).collect()
    return sorted(r["event_id"] for r in out if r["kept"] == 1)


def test_exact_line_keeps_only_endpoints(spark):
    vals = [10.0 + 3.5 * i for i in range(50)]
    assert _kept(spark, vals, 2.0) == [0, 49]


def test_step_jump_archives_the_corner(spark):
    vals = [10.0] * 10 + [100.0] * 10
    kept = _kept(spark, vals, 5.0)
    assert 0 in kept and 19 in kept
    # the corner points around the jump must survive
    assert 9 in kept or 10 in kept


def test_single_spike_survives(spark):
    vals = [10.0] * 5 + [200.0] + [10.0] * 5
    kept = _kept(spark, vals, 5.0)
    assert 5 in kept


def test_short_series_all_kept(spark):
    assert _kept(spark, [1.0], 5.0) == [0]
    assert _kept(spark, [1.0, 99.0], 5.0) == [0, 1]


def test_reconstruction_tolerance_and_compression(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    E = 15.0
    out = swinging_door(ev, comp_dev=E)
    joined = (
        ev.join(out, "event_id")
        .select("user_id", "ts", "value", "kept")
        .collect()
    )
    by_user: dict = {}
    for r in joined:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["value"], r["kept"])
        )
    n_all = n_kept = 0
    for pts in by_user.values():
        pts.sort()
        anchors = [i for i, p in enumerate(pts) if p[2] == 1]
        n_all += len(pts)
        n_kept += len(anchors)
        # linear interpolation between consecutive kept points stays within
        # 2E of every skipped point (SDT's conservative deviation bound:
        # the archived slope is chord-of-valid-corridor, not corridor edge)
        for a, b in zip(anchors, anchors[1:]):
            t0, v0, _ = pts[a]
            t1, v1, _ = pts[b]
            for i in range(a + 1, b):
                t, v, _ = pts[i]
                frac = (t - t0).total_seconds() / (t1 - t0).total_seconds()
                interp = v0 + frac * (v1 - v0)
                assert abs(v - interp) <= 2 * E + 1e-9
    # real compression on real data
    assert n_kept < n_all
    assert n_kept >= 2 * len(by_user)


def test_one_exchange_plan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = swinging_door(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
