"""Tiered continuous aggregates (1m/5m/1h/1d retention tiers).

The engine's rollup keeps *reaggregatable* state per bucket — counts and sums
rather than averages — so every coarser tier derives **exactly** from the
finer one without touching raw data (a cascade, like continuous aggregates in
a time-series store). Averages are exposed as sum/count at read time.

At 100TB scale this matters: the 1m rollup is the only pass over raw data;
5m/1h/1d are cheap shuffles over already-tiny tiers, and each tier's groupBy
keys are (conv_id, bucket_ts) which Spark partial-aggregates map-side before
the shuffle. Skewed hot conversations go through operators/salting.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIERS = {"1m": "minute", "5m": None, "1h": "hour", "1d": "day"}
TIER_SECONDS = {"1m": 60, "5m": 300, "1h": 3600, "1d": 86400}

def _state_aggs():
    """Reaggregatable state kept per (conv_id, bucket) — built lazily (column
    expressions need an active SparkContext)."""
    return [
        ("n_turns", F.count(F.lit(1))),
        ("n_lat", F.count("latency_s")),
        ("sum_lat", F.sum("latency_s")),
        ("min_lat", F.min("latency_s")),
        ("max_lat", F.max("latency_s")),
        ("sum_chars", F.sum("n_chars")),
        ("sum_tokens", F.sum("n_tokens")),
        ("n_tool_calls", F.sum(F.col("is_tool_call").cast("long"))),
    ]


def bucket_ts(tier: str, col="ts"):
    """Tier bucket timestamp. 1m/1h/1d via date_trunc; 5m via epoch floor
    (date_trunc has no 5-minute unit)."""
    if tier == "5m":
        return F.timestamp_seconds(F.floor(F.unix_timestamp(F.col(col) if isinstance(col, str) else col) / 300) * 300)
    return F.date_trunc(TIERS[tier], col)


def rollup_tier(signals: DataFrame, tier: str, key: str = "conv_id") -> DataFrame:
    """Roll per-turn signals into one tier directly from raw signals."""
    return (
        signals.withColumn("bucket_ts", bucket_ts(tier))
        .groupBy(key, "bucket_ts")
        .agg(*[expr.alias(name) for name, expr in _state_aggs()])
    )


def rollup_from_finer(finer: DataFrame, tier: str, key: str = "conv_id") -> DataFrame:
    """Derive a coarser tier exactly from a finer tier's state (cascade)."""
    return (
        finer.withColumn("bucket_ts2", bucket_ts(tier, "bucket_ts"))
        .groupBy(key, "bucket_ts2")
        .agg(
            F.sum("n_turns").alias("n_turns"),
            F.sum("n_lat").alias("n_lat"),
            F.sum("sum_lat").alias("sum_lat"),
            F.min("min_lat").alias("min_lat"),
            F.max("max_lat").alias("max_lat"),
            F.sum("sum_chars").alias("sum_chars"),
            F.sum("sum_tokens").alias("sum_tokens"),
            F.sum("n_tool_calls").alias("n_tool_calls"),
        )
        .withColumnRenamed("bucket_ts2", "bucket_ts")
    )


def rollup_cascade(signals: DataFrame, key: str = "conv_id") -> dict[str, DataFrame]:
    """All four tiers: 1m from raw, then 5m←1m, 1h←5m, 1d←1h."""
    t1m = rollup_tier(signals, "1m", key)
    t5m = rollup_from_finer(t1m, "5m", key)
    t1h = rollup_from_finer(t5m, "1h", key)
    t1d = rollup_from_finer(t1h, "1d", key)
    return {"1m": t1m, "5m": t5m, "1h": t1h, "1d": t1d}


def with_derived_metrics(tier_df: DataFrame) -> DataFrame:
    """Read-time metrics derived from the reaggregatable state."""
    return (
        tier_df.withColumn("avg_lat", F.col("sum_lat") / F.col("n_lat"))
        .withColumn("avg_chars", F.col("sum_chars") / F.col("n_turns"))
        .withColumn("tool_call_rate", F.col("n_tool_calls") / F.col("n_turns"))
    )
