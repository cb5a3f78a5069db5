"""Sparse feature extraction for unbounded vocabularies.

Feature hashing (the "hashing trick", Weinberger et al. 2009; Spark
MLlib's HashingTF is the same idea): project term counts into a fixed
``n_features``-dimensional space by hashing each term to its bucket —
no vocabulary table to fit, broadcast, or keep consistent across runs,
which is what makes it the scale path for text featurization: the only
state is the hash function.

Differences from MLlib's HashingTF, on purpose:

* the hash is the repo-standard md5 60-bit prefix (engine-portable —
  identical arithmetic in Spark SQL and DuckDB, so the contract oracle
  reproduces bucket ids exactly), not murmur3;
* output is the SPARSE long form (doc, feature, tf) instead of a vector
  type — the join-able, aggregate-able shape every downstream operator
  here consumes, and the only shape that survives 100 TB (a dense
  array<double> of width 2^20 per doc does not).

Scale shape: explode -> row-local bucket arithmetic -> ONE map-side-
combined groupBy (doc, feature). Text dies at the explode projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashing_tf(
    docs: DataFrame,
    n_features: int = 1024,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed term-frequency rows (doc, feature, tf): feature =
    md5-60-bit(term) mod ``n_features`` (both operands non-negative, so
    mod == pmod in every engine), tf = exact BIGINT count. Collisions are
    the accepted trade of the hashing trick; at the default 1024 buckets
    they fold rare terms together, never drop them — total tf per doc is
    conserved (== the doc's token count), which is the invariant tests
    should pin."""
    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    tok = docs.select(
        F.col(doc_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("_w")), 1, 15), 16, 10).cast("long"),
        F.lit(int(n_features)),
    )
    return (
        tok.groupBy(F.col(doc_col), bucket.alias("feature"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
