"""Retention: the third leg of "rollup + downsample + retention"
(BASELINE.json north_star).

Policy model (continuous-aggregate style): each tier keeps a window of
recent buckets hot; buckets older than the tier's TTL either age out
entirely (coarser tiers retain the history) or move to the Gorilla cold
tier as packed blobs. Because every coarser tier derives exactly from finer
state (operators/rollup.py), dropping expired fine buckets loses no
information the policy wants kept.

    POLICY = {"1m": 7*86400, "5m": 30*86400, "1h": 180*86400, "1d": None}
    (None = keep forever)

apply_retention is pure DataFrame filtering — partition-prunable when tiers
are stored under days(bucket_ts); cold_pack reuses operators/gorilla.py per
(series, day) so blobs stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_POLICY: dict[str, int | None] = {
    "1m": 7 * 86400,
    "5m": 30 * 86400,
    "1h": 180 * 86400,
    "1d": None,
}


def split_expired(
    tier_df: DataFrame, now_ts, keep_seconds: int | None, ts_col: str = "bucket_ts"
) -> tuple[DataFrame, DataFrame]:
    """(hot, expired) split of a tier by its TTL. keep_seconds=None keeps all
    (expired side empty). The cutoff predicate is a plain comparison on the
    bucket timestamp — with a days(bucket_ts) layout it prunes at the scan."""
    if keep_seconds is None:
        return tier_df, tier_df.filter(F.lit(False))
    cutoff = F.lit(now_ts).cast("timestamp") - F.expr(f"interval {keep_seconds} seconds")
    return (
        tier_df.filter(F.col(ts_col) >= cutoff),
        tier_df.filter(F.col(ts_col) < cutoff),
    )


def apply_retention(
    tiers: dict[str, DataFrame],
    now_ts,
    policy: dict[str, int | None] = None,
    ts_col: str = "bucket_ts",
) -> dict[str, dict[str, DataFrame]]:
    """Apply a TTL policy to every tier: {tier: {"hot": df, "expired": df}}."""
    policy = policy or DEFAULT_POLICY
    out = {}
    for tier, df in tiers.items():
        hot, expired = split_expired(df, now_ts, policy.get(tier), ts_col)
        out[tier] = {"hot": hot, "expired": expired}
    return out


def cold_pack_expired(
    expired: DataFrame,
    key: str = "conv_id",
    ts_col: str = "bucket_ts",
    value_col: str = "sum_lat",
) -> DataFrame:
    """Pack an expired tier's (ts, value) points into Gorilla blobs per
    (series, day) — bounded groups, exact unpack (operators/gorilla.py)."""
    from .gorilla import gorilla_pack

    with_day = expired.withColumn("_day", F.to_date(ts_col).cast("string"))
    return gorilla_pack(with_day, [key, "_day"], ts_col, value_col)
