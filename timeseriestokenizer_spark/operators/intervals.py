"""Interval algebra over per-key event streams: gaps-and-islands merge
of overlapping intervals, total-coverage rollup, and SCD2 run
compression (collapse consecutive equal values into validity windows).

Graft-new warehouse operators (the reference has no interval algebra;
its nearest neighbor is the chron-split interval tiling,
/root/reference/utils/dataset_split.py — SURVEY.md §2 marks J4). They
complement sessionize (gap-threshold islands over POINTS) with islands
over INTERVALS and state runs.

Scale shape: every window and groupBy clusters on ``key`` (or a
superset), so the whole pipeline — island flags, island ids, merge
aggregation, the SCD2 lead() — runs on ONE hash exchange
(HashPartitioning(key) satisfies all of it; the rollup-cascade
precedent pinned in tests/test_plan_shapes.py).

Float contract: starts/ends are caller-provided NUMERIC columns
(e.g. epoch µs BIGINTs — CLAUDE.md: exact-µs arithmetic); every output
here is BIGINT min/max/sum/count arithmetic, no floats anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key: str = "conv_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping-or-touching [start, end] intervals per key into
    maximal islands. An interval joins the current island when its start
    is ≤ the running max end of all earlier intervals (ordered by
    (start, end)); touching endpoints merge. Island identity is
    order-insensitive under ties: equal starts see the running max
    including each other, so they can never split an island.

    Returns (key, island, start, end, n_merged), one row per island."""
    s, e = F.col(start_col), F.col(end_col)
    w = W.partitionBy(key).orderBy(s, e)
    prev_max_end = F.max(e).over(w.rowsBetween(W.unboundedPreceding, -1))
    is_new = prev_max_end.isNull() | (s > prev_max_end)
    island = F.sum(is_new.cast("long")).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.select(F.col(key), s.alias("s"), e.alias("e"), island.alias("island"))
        .groupBy(key, "island")
        .agg(
            F.min("s").alias("start"),
            F.max("e").alias("end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
    )


def interval_coverage(
    df: DataFrame,
    key: str = "conv_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per-key total covered extent after merging overlaps — the
    "how much wall-clock was this series actually active" question a
    naive sum(end − start) double-counts. All BIGINT: total coverage,
    island count, overall extent [first_start, last_end], and the
    uncovered gap total (extent − coverage)."""
    m = merge_intervals(df, key=key, start_col=start_col, end_col=end_col)
    return m.groupBy(key).agg(
        F.sum(F.col("end") - F.col("start")).alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_merged").alias("n_intervals"),
        F.min("start").alias("first_start"),
        F.max("end").alias("last_end"),
        (
            F.max("end") - F.min("start") - F.sum(F.col("end") - F.col("start"))
        ).alias("gap_total"),
    )


def scd2_compress(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Collapse consecutive equal values into SCD2 validity windows:
    one row per run with valid_from (run's first timestamp µs),
    valid_to (NEXT run's valid_from; NULL while current — the
    half-open [from, to) slowly-changing-dimension convention), the
    value, and the run length. NULL values form runs too (null-safe
    change detection via <=>).

    The change flag, run ids, run aggregation, and the valid_to lead all
    cluster on ``key`` — one exchange."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = W.partitionBy(key).orderBy(F.col(ts_col), F.col(id_col))
    v, prev = F.col(val_col), F.lag(F.col(val_col)).over(w)
    first_row = F.row_number().over(w) == 1
    changed = first_row | ~v.eqNullSafe(prev)
    run = F.sum(changed.cast("long")).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = (
        df.select(
            F.col(key),
            ts_us.alias("ts_us"),
            v.alias("v"),
            F.col(id_col).alias("_id"),
            run.alias("run"),
        )
        .groupBy(key, "run")
        .agg(
            F.min("ts_us").alias("valid_from"),
            F.first("v").alias("value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    wrun = W.partitionBy(key).orderBy("run")
    return runs.select(
        F.col(key),
        F.col("run"),
        F.col("valid_from"),
        F.lead("valid_from").over(wrun).alias("valid_to"),
        F.col("value"),
        F.col("n_rows"),
    )


def state_occupancy(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    state_col: str = "state",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-in-state: attribute the half-open span [tᵢ, tᵢ₊₁) between
    consecutive events to the EARLIER event's state (the LOCF
    convention every tier read uses), then total per (key, state) —
    "how long was each conversation in each phase", which raw event
    counts mis-state whenever dwell times differ.

    Each key's LAST event opens no span (no successor — counted in
    ``n_visits``, absent from ``n_closed``/``occupied_us``). Duplicate
    timestamps order by (ts, id) so zero-width spans land
    deterministically. ``share`` is occupied_us over the key's total
    span — one exact-BIGINT division, NULL for single-event keys
    (never a 0/0 NaN).

    ONE exchange: the lead() window, the (key, state) aggregate and the
    per-key total all cluster on ``key`` (HashPartitioning(key)
    satisfies the superset grouping — the rollup-cascade precedent)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    wlead = W.partitionBy(key).orderBy(F.col("_us"), F.col("_id"))
    spans = df.select(
        F.col(key),
        F.col(state_col).alias("state"),
        us.alias("_us"),
        F.col(id_col).alias("_id"),
    ).withColumn("dur_us", F.lead("_us").over(wlead) - F.col("_us"))
    agg = spans.groupBy(key, "state").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.count("dur_us").alias("n_closed"),
        F.coalesce(F.sum("dur_us"), F.lit(0)).alias("occupied_us"),
    )
    wk = W.partitionBy(key)
    total = F.sum("occupied_us").over(wk)
    return agg.select(
        F.col(key),
        F.col("state"),
        F.col("n_visits"),
        F.col("n_closed"),
        F.col("occupied_us"),
        F.when(
            total > 0,
            F.col("occupied_us").cast("double") / total.cast("double"),
        ).alias("share"),
    )
