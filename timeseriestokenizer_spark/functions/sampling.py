"""Deterministic hash-based sampling and train/test splitting.

The 100 TB story: `df.sample()` draws from a per-partition RNG — the result
changes with partition layout, retries, and AQE re-planning, so a pipeline
re-run selects a DIFFERENT sample (poison for training-data reproducibility
and for join-ability of two independently-sampled tables). Content-hash
sampling fixes all of it:

* membership depends ONLY on (key columns, seed) — stable across reruns,
  partitionings, engines, and cluster sizes;
* no shuffle: the predicate is a row-local Catalyst expression, pushed
  into the scan's data filters;
* two tables sampled with the same keys+seed select ALIGNED rows (the
  "consistent sampling" property — preds and trues stay joinable);
* the hash is md5 (identical in Spark and DuckDB), so the driver's oracle
  reproduces the exact row set, not a statistical lookalike.

Bucketing: u = first 15 hex digits of md5(key || ':' || seed) as an integer
uniform in [0, 16^15); keep iff u < fraction * 16^15. 60 bits of hash →
fraction resolution ~1e-18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 16 ** 15  # md5 15-hex-digit prefix, < 2^63


def _hash_u(key_cols: list[str], seed: int):
    """Uniform 60-bit integer from the row's key columns + seed (portable:
    md5 and string concat behave identically in Spark and DuckDB)."""
    parts: list = []
    for c in key_cols:
        parts.append(F.col(c).cast("string"))
        parts.append(F.lit(":"))
    parts.append(F.lit(str(seed)))
    return F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_cols: list[str], fraction: float, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by content hash."""
    return df.filter(_hash_u(key_cols, seed) < int(fraction * _HASH_SPACE))


def with_hash_split(
    df: DataFrame,
    key_cols: list[str],
    test_fraction: float = 0.2,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Add 'train'/'test' labels, stable under reruns and repartitioning —
    an example's split NEVER changes when data is added or the cluster is
    resized (only on a seed change), the property training pipelines need
    to avoid test-set leakage across runs."""
    return df.withColumn(
        out_col,
        F.when(
            _hash_u(key_cols, seed) < int(test_fraction * _HASH_SPACE), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10% but
    keep 100% of low-resource languages). The per-stratum thresholds ride a
    literal CASE expression — no join, no shuffle, scan-local."""
    thresh = F.lit(int(default_fraction * _HASH_SPACE))
    for k, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == F.lit(k), F.lit(int(frac * _HASH_SPACE))
        ).otherwise(thresh)
    return df.filter(_hash_u(key_cols, seed) < thresh)


def weighted_sample_topk(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis A-Res scheme, hash-determinized: each row draws
    u in (0, 1] from its content hash and keeps exp-key
    -ln(u) / w; the k SMALLEST keys are the sample, which is distributed
    exactly like sequential weighted draws without replacement. The
    training-data use: sample documents proportional to quality/length
    without an RNG, so reruns, retries, and repartitions pick the SAME
    rows (same property as deterministic_sample, extended to weights).

    Scale shape: the key is a row-local expression; orderBy+limit compiles
    to TakeOrderedAndProject — per-partition top-k heaps merged on the
    driver side of the exchange, no global sort. Rows with w <= 0 are
    excluded (they'd have infinite keys anyway). The emitted sample_key is
    rounded to 9 dp with a content tie-break so the DuckDB oracle's ln()
    ulps cannot flip the selection order."""
    u = (_hash_u(key_cols, seed) + 1).cast("double") / float(_HASH_SPACE + 1)
    key = -F.log(u) / F.col(weight_col).cast("double")
    ranked = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", F.round(key, 9))
        .orderBy("sample_key", *key_cols)
        .limit(int(k))
    )
    return ranked
