"""Sessionization: split each key's event stream into sessions at
inactivity gaps — the canonical segmentation for conversation/agent
transcripts (a conv_id's turn stream often spans days; training and
analytics both want the burst-of-activity unit).

Two forms:

* ``sessionize`` — per-EVENT session labels via lag + running sum inside
  one window (one hash shuffle on key; the label is a deterministic
  function of content, so re-runs and repartitions agree). Use when every
  row needs its session id (e.g. before per-session packing or TPE).
* ``session_agg`` — per-SESSION aggregates via Spark's native
  ``F.session_window`` (merging gap-windows inside the aggregation
  operator; also the streaming form — works under ``withWatermark`` for
  late-data-bounded online sessionization). Use when only session-level
  rows are needed; it never materializes per-event labels.

Both define a session break as gap > ``gap_s`` (strictly greater, so
events exactly ``gap_s`` apart stay in one session — matching
``session_window``'s half-open [start, last+gap) semantics is NOT intended
here; the two forms are cross-checked on counts in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``session_idx`` (0-based per key) and ``session_id``
    ("<key>#<idx>") columns. ``order_cols`` breaks timestamp ties
    deterministically (e.g. turn_idx / event_id)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    # exact microsecond arithmetic — unix_timestamp() floors to seconds and
    # would misjudge sub-second gaps; the cast handles parquet TIMESTAMP_NTZ
    # (both CLAUDE.md gotchas)
    ts_c = F.col(ts_col).cast("timestamp")
    gap_us = F.unix_micros(ts_c) - F.unix_micros(F.lag(ts_c).over(w))
    is_break = F.when(gap_us > int(gap_s) * 1_000_000, 1).otherwise(0)
    run = W.partitionBy(key).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    out = df.withColumn("session_idx", F.sum(is_break).over(run).cast("long"))
    return out.withColumn(
        "session_id", F.concat_ws("#", F.col(key), F.col("session_idx"))
    )


def session_agg(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    aggs: list | None = None,
) -> DataFrame:
    """Per-session aggregates via the native session_window operator
    (batch AND streaming: add withWatermark upstream for online use).
    Returns (key, session_start, session_end, n_events [+ aggs])."""
    agged = df.groupBy(key, F.session_window(ts_col, gap).alias("sw")).agg(
        F.count(F.lit(1)).alias("n_events"), *(aggs or [])
    )
    keep = [c for c in agged.columns if c not in (key, "sw")]
    return agged.select(
        key,
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        *keep,
    )
