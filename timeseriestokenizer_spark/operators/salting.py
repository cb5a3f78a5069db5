"""Salted two-stage aggregation for skewed hot keys (SURVEY §4.2, north_rule
"partitioning / shuffle / skew handled explicitly").

One hot conversation can dominate a shuffle partition (the Zipf fixture makes
conv lengths heavy-tailed). The standard fix: append a salt to the group key,
partially aggregate (conv_id, salt, bucket), then merge the S partials. The
engine's rollup state is reaggregatable by construction (counts/sums/min/max),
so the second stage is exact.

Note: plain hash aggregation already does map-side partial aggregation — the
salt matters when the *post-shuffle* per-key state is still heavy, which for
pure rollups only happens at extreme cardinality ratios; AQE skew-join
handles the join-side analog. We still expose it explicitly because grouped
*map* UDFs (applyInPandas: TPE, Gorilla) have NO partial aggregation — there,
salting by (conv_id, day-bucket) is the only way to bound a group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt (hash of the ordinal-ish columns, not rand())."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(key, "ts"), F.lit(n_salts)).cast("int")
    )


def salted_rollup(signals: DataFrame, tier: str, n_salts: int = 8, key: str = "conv_id") -> DataFrame:
    """Two-stage salted rollup: stage 1 groups (key, salt, bucket) — spreading
    a hot key over n_salts reducers — stage 2 merges partials exactly."""
    from .rollup import bucket_ts, rollup_from_finer, _state_aggs

    stage1 = (
        with_salt(signals, key, n_salts)
        .withColumn("bucket_ts", bucket_ts(tier))
        .groupBy(key, "_salt", "bucket_ts")
        .agg(*[expr.alias(name) for name, expr in _state_aggs()])
    )
    # stage 2: same tier (bucket_ts already aligned) → merge partials
    return rollup_from_finer(stage1.drop("_salt"), tier, key=key)
