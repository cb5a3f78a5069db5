"""Per-turn signal derivation over the transcripts table.

The reference treats each CSV column as an independent series
(transform_files_into_tokens.py:160-166); here each conversation's turn
stream is the series (BASELINE.json north_star) and the per-turn signals are:

* latency_s   — ts - lag(ts) over (conv_id order by turn_idx)  [SURVEY W1/W4]
* n_chars     — length(text)
* n_tokens    — whitespace token count (see functions/textstats.py for the
                BPE-ish regex variant)
* is_tool_call — tool IS NOT NULL

All JVM-side expressions — no Python in this hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def derive_signals(transcripts: DataFrame) -> DataFrame:
    """Full-fidelity signals: keeps every transcript column (incl. text, for
    the per-turn text-equality invariant). The lag window shuffles whole rows
    — for rollup-only pipelines use signals_narrow, which projects the text
    down to its counts BEFORE the shuffle."""
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.withColumn(
            "latency_s",
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            ).cast("double")
            / 1e6,
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")).cast("long"))
        .withColumn("is_tool_call", F.col("tool").isNotNull())
    )


def signals_narrow(transcripts: DataFrame) -> DataFrame:
    r"""Shuffle-lean signals for rollups: text reduces to (n_chars, n_tokens)
    row-locally BEFORE the lag window, so the per-conv shuffle carries ~40B
    rows instead of full transcripts (~10-20x less shuffle IO at 100TB —
    the text column never leaves the scan stage).

    n_tokens = size(split(trim(text), r"\s+")) — measured 2x FASTER than the
    allocation-free-looking regexp_count form (48 s vs 92 s for the 80M-turn
    scan at 32 cores, same JVM back-to-back): Spark's split fast-paths the
    regex while regexp_count walks the full NFA per match. Same values.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    narrow = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.col("tool").isNotNull().alias("is_tool_call"),
    )
    return narrow.withColumn(
        "latency_s",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).cast("double") / 1e6,
    )


def counter_rate(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Monotonic-counter delta and per-second rate with RESET correction
    (the monitoring-classic `rate()` semantics): per key in time order,
    delta = v - lag(v), except a NEGATIVE delta means the counter restarted
    from ~0 — the post-reset value itself is the increase. First row per
    key has no predecessor → NULL delta/rate.

    Pure window arithmetic (one shuffle on key, whole-stage codegen);
    exact-µs elapsed time so sub-second scrapes divide correctly."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    ts_c = F.col(ts_col).cast("timestamp")
    prev_v = F.lag(val_col).over(w)
    dt_us = F.unix_micros(ts_c) - F.unix_micros(F.lag(ts_c).over(w))
    raw = F.col(val_col) - prev_v
    delta = F.when(prev_v.isNull(), F.lit(None).cast("double")).when(
        raw < 0, F.col(val_col)
    ).otherwise(raw)
    return df.withColumn("counter_delta", delta.cast("double")).withColumn(
        "rate_per_s",
        F.when(
            dt_us > 0, F.round(delta * F.lit(1_000_000.0) / dt_us, 6)
        ).otherwise(F.lit(None).cast("double")),
    )


def time_weighted_avg(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tier: str = "1h",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average per (key, tier bucket) — the irregular-series
    mean that plain avg() gets wrong (a value that HELD for 50 minutes
    should weigh 50x one that held for one). LOCF weighting: each point's
    value holds from its ts until the series' next point or the bucket
    end, whichever is earlier; the span before the bucket's first point
    is uncovered (no carry-in from the previous bucket — the composable
    form; carry-in is gapfill_locf's job upstream).

    Integer-exact: weights are exact BIGINT microseconds; with an
    integer value column the weighted sum is an exact BIGINT product-sum
    and the single final division is engine-identical (see
    operators/anomaly.py float contract). Duplicate-timestamp points get
    zero weight (their successor supersedes them in the same µs) and an
    all-zero-weight bucket yields NULL, documented.

    One exchange on ``key`` (the window), then groupBy(key, bucket) —
    clustered on a superset of key, same exchange (rollup-cascade
    precedent)."""
    from ..operators.rollup import TIER_SECONDS, bucket_ts

    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    ts_c = F.col(ts_col).cast("timestamp")
    t_us = F.unix_micros(ts_c)
    bucket = bucket_ts(tier, ts_c)
    bucket_end_us = F.unix_micros(bucket) + F.lit(
        TIER_SECONDS[tier] * 1_000_000
    )
    next_us = F.lead(t_us).over(w)
    w_us = F.least(F.coalesce(next_us, bucket_end_us), bucket_end_us) - t_us
    stage = df.select(
        F.col(key),
        bucket.alias("bucket_ts"),
        F.col(val_col).alias("v"),
        w_us.alias("w_us"),
    )
    num = F.sum(F.col("v") * F.col("w_us"))
    den = F.sum("w_us")
    return stage.groupBy(key, "bucket_ts").agg(
        F.when(den > 0, num.cast("double") / den.cast("double")).alias("twa"),
        den.alias("covered_us"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )


def counter_increase(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tier: str = "1h",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Bucketed `increase()` (the monitoring classic): per (key, tier
    bucket), the sum of reset-corrected counter deltas attributed to the
    later sample of each adjacent pair — composes counter_rate's reset
    rule (negative delta ⇒ restart, post-reset value is the increase)
    with the tier rollup. The series' first sample contributes no delta.

    Integer input stays exact end-to-end (delta and sum are BIGINT);
    same one-exchange shape as time_weighted_avg."""
    from ..operators.rollup import bucket_ts

    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    prev_v = F.lag(val_col).over(w)
    raw = F.col(val_col) - prev_v
    delta = F.when(prev_v.isNull(), F.lit(None)).when(
        raw < 0, F.col(val_col)
    ).otherwise(raw)
    stage = df.select(
        F.col(key),
        bucket_ts(tier, F.col(ts_col).cast("timestamp")).alias("bucket_ts"),
        delta.alias("delta"),
    )
    return stage.groupBy(key, "bucket_ts").agg(
        F.sum("delta").alias("increase"),
        F.count("delta").cast("long").alias("n_deltas"),
    )


def rolling_zscore(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    window_rows: int = 10,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Rolling anomaly score: each point's z-score against the PRECEDING
    ``window_rows`` points of its own series (self-excluded, so a spike
    cannot mask itself) — the standard online outlier screen for latency /
    volume series.

    Computed from explicit power sums (n, Σx, Σx²) over the window frame
    rather than a stddev aggregate: the two engines' stddev implementations
    differ in summation algorithm (Welford vs naive) in the last ulps, but
    identical frames summed the same way give identical doubles, so the
    4-dp rounded score is oracle-stable. NULL until the window has at least
    2 points or while the window variance is ~0."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-int(window_rows), -1)
    )
    n = F.count(val_col).over(w).cast("double")
    s1 = F.sum(val_col).over(w)
    s2 = F.sum(F.col(val_col) * F.col(val_col)).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = (F.col(val_col) - mean) / F.sqrt(var)
    return df.withColumn(
        "zscore",
        F.when((n >= 2) & (var > 1e-12), F.round(z, 4)).otherwise(
            F.lit(None).cast("double")
        ),
    )


def trailing_count(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    window_s: int = 3600,
    limit: int | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Rate-limit audit: for every event, how many events the same key
    produced in the trailing ``window_s`` seconds — the half-open
    (t − window, t] convention (an event exactly ``window_s`` old has
    aged out). A RANGE frame over exact epoch-µs BIGINTs, so duplicate
    timestamps are frame PEERS and count each other symmetrically —
    order-insensitive by construction, no tiebreak needed. Exact BIGINT
    counts; with ``limit`` set, flags breaching events.

    One exchange; the frame is value-bounded so state per partition is
    O(events in window), the streaming-window analogue in batch."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lo = -(int(window_s) * 1_000_000 - 1)
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_us"))
        .rangeBetween(lo, W.currentRow)
    )
    out = df.select(
        F.col(key), F.col(id_col), us.alias("_us")
    ).select(
        F.col(key),
        F.col(id_col),
        F.col("_us").alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
    )
    if limit is not None:
        out = out.withColumn("is_burst", F.col("n_trailing") > int(limit))
    return out


def period_over_period(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    period_days: int = 7,
) -> DataFrame:
    """Calendar-aligned period-over-period change: per (key, day) count
    and exact sum, plus the SAME key's values exactly ``period_days``
    earlier — via a RANGE frame pinned to [p PRECEDING, p PRECEDING]
    over the epoch-day index, which is JOIN-FREE and, unlike
    ``lag(p)``, immune to missing days (a gap day shifts a ROWS lag
    onto the wrong date; a value-bounded frame just finds nothing and
    yields NULL, the honest answer).

    delta_* are exact BIGINT subtractions (NULL when no prior period);
    ratio is the one float — a single exact-operand division, NULL
    rather than a division blow-up when the prior total is 0.

    Shape: groupBy(key, day) shuffles map-side-combined partials (far
    smaller than raw), then the frame re-clusters on ``key`` — the
    second exchange moves only per-day aggregates."""
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = (
        df.select(F.col(key), day.alias("day"), F.col(val_col).alias("v"))
        .groupBy(key, "day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .withColumn("_di", F.datediff(F.col("day"), F.lit("1970-01-01")))
    )
    p = int(period_days)
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_di"))
        .rangeBetween(-p, -p)
    )
    prev_n = F.max("n").over(w)
    prev_total = F.max("total").over(w)
    return daily.select(
        F.col(key),
        F.col("day"),
        F.col("n"),
        F.col("total"),
        prev_n.alias("prev_n"),
        prev_total.alias("prev_total"),
        (F.col("n") - prev_n).alias("delta_n"),
        (F.col("total") - prev_total).alias("delta_total"),
        F.when(
            prev_total != 0,
            F.col("total").cast("double") / prev_total.cast("double"),
        ).alias("ratio"),
    )
