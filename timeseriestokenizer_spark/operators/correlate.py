"""Cross-series correlation — the align-and-compare analytics every
rollup store serves ("which conversations' latency moves together?").

Graft-new (the reference processes each series independently; it has no
cross-series operator). Two shapes, chosen for scale honesty:

* ``correlate_to``: ONE series against the whole corpus — linear. The
  target's bucket vector broadcasts into a hash join against everyone
  else's tier rows; at 10^8 series this is the shape you actually run.
* ``correlate_pairs``: all-pairs within an explicit key subset — the
  per-bucket self-join is quadratic in the subset size BY DEFINITION, so
  the subset is a required argument when the corpus is large (pass
  ``keys=None`` only when the series count itself is bounded, as in the
  contract fixture). The candidates-to-verify pattern from the dedup
  family applies upstream: use SAX words / MinHash to choose the subset.

Float contract: Pearson r from EXPLICIT power sums (n, Σa, Σb, Σab, Σa²,
Σb²) — the rolling_zscore precedent: both engines aggregate the same
terms and evaluate the identical closed form, with the result rounded to
6 dp on both sides (engine summation-order ulps live below that). Zero
variance on either side yields NULL (guarded division, portable).

Alignment: series are first bucketed to a tier (default 1h, avg value
per bucket rounded to 6 dp so the joined inputs are already
engine-identical), then joined on bucket_ts. A pair's r uses only
buckets BOTH series occupy; pairs with fewer than ``min_overlap``
buckets are dropped (corr over 2 points is noise, and the filter keeps
the output deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import bucket_ts


def _bucketed(df: DataFrame, key: str, ts_col: str, val_col: str, tier: str):
    return (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(
            F.col(key).cast("string").alias("k"),
            bucket_ts(tier, ts_col).alias("bucket_ts"),
        )
        .agg(F.round(F.avg(val_col), 6).alias("v"))
    )


def _corr_from_pairs(joined: DataFrame, min_overlap: int) -> DataFrame:
    agg = joined.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.sum("va").alias("sa"),
        F.sum("vb").alias("sb"),
        F.sum(F.col("va") * F.col("vb")).alias("sab"),
        F.sum(F.col("va") * F.col("va")).alias("sa2"),
        F.sum(F.col("vb") * F.col("vb")).alias("sb2"),
    )
    n = F.col("n_overlap").cast("double")
    cov = n * F.col("sab") - F.col("sa") * F.col("sb")
    var_a = n * F.col("sa2") - F.col("sa") * F.col("sa")
    var_b = n * F.col("sb2") - F.col("sb") * F.col("sb")
    denom = F.sqrt(var_a) * F.sqrt(var_b)
    return (
        agg.filter(F.col("n_overlap") >= int(min_overlap))
        .select(
            "key_a",
            "key_b",
            "n_overlap",
            F.round(
                F.when(denom > 0.0, cov / denom).otherwise(F.lit(None)), 6
            ).alias("corr"),
        )
    )


def correlate_pairs(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tier: str = "1h",
    min_overlap: int = 10,
    keys: list[str] | None = None,
) -> DataFrame:
    """All-pairs Pearson correlation within ``keys`` (or all series when
    None — bounded corpora only; see module docstring). Returns
    (key_a < key_b, n_overlap, corr)."""
    b = _bucketed(df, key, ts_col, val_col, tier)
    if keys is not None:
        b = b.filter(F.col("k").isin([str(x) for x in keys]))
    left = b.select(F.col("k").alias("key_a"), "bucket_ts", F.col("v").alias("va"))
    right = b.select(F.col("k").alias("key_b"), "bucket_ts", F.col("v").alias("vb"))
    joined = left.join(right, "bucket_ts").filter(F.col("key_a") < F.col("key_b"))
    return _corr_from_pairs(joined, min_overlap)


def correlate_to(
    df: DataFrame,
    target_key: str,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tier: str = "1h",
    min_overlap: int = 10,
) -> DataFrame:
    """ONE series vs the whole corpus — the linear production shape: the
    target's bucket vector (tier-sized, tiny) broadcasts into an equi-join
    on bucket_ts against everyone else's tier rows. Returns
    (key_a = target, key_b, n_overlap, corr)."""
    b = _bucketed(df, key, ts_col, val_col, tier)
    target = b.filter(F.col("k") == str(target_key)).select(
        F.col("k").alias("key_a"), "bucket_ts", F.col("v").alias("va")
    )
    rest = b.filter(F.col("k") != str(target_key)).select(
        F.col("k").alias("key_b"), "bucket_ts", F.col("v").alias("vb")
    )
    joined = rest.join(F.broadcast(target), "bucket_ts")
    return _corr_from_pairs(joined, min_overlap)
