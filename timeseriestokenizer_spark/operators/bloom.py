"""Bloom-filter membership sketch — the set-MEMBERSHIP companion to the
CMS/KMV/HLL/KLL/MG tier family (Bloom, "Space/time trade-offs in hash
coding with allowable errors", CACM 1970).

The pipeline use is the candidates-then-verify doctrine's cheapest
prefilter: build a filter over the train side's key hashes once, probe the
eval/stream side row-locally, and only bloom-HIT keys proceed to the exact
(shuffling) semi-join — one-sided error in the safe direction (false
positives over-flag and get verified; a true member can never slip
through). At 100 TB the filter table is m-bits-worth of set positions
(kilobytes against terabytes) and broadcasts onto the probe scan.

Representation: the filter is a TABLE of distinct set bit positions
(pos_j(key) = md5-prefix(j ':' key) mod m — the repo's cross-engine hash),
not an opaque bitset blob: it stays mergeable by plain union-distinct,
partition-prunable, and exactly replayable by a SQL oracle (false
positives included — the pending contract row hash-matches hit flags, not
an error-rate band). PURE Catalyst end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 8192
DEFAULT_K_HASHES = 3


def _positions(key_col: str, m_bits: int, k_hashes: int):
    """Array of the key's k bit positions (md5-prefix hashes, j-salted)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{j}:"), F.col(key_col).cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                )
                .cast("long")
                % int(m_bits)
            ).cast("int")
            for j in range(int(k_hashes))
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """The filter as a table of distinct set positions (pos int) — at most
    m_bits rows no matter how many keys were inserted; merge two filters
    of the same (m, k) by union + distinct."""
    return (
        df.select(
            F.explode(_positions(key_col, m_bits, k_hashes)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """(key, bloom_hit): hit iff EVERY one of the key's (distinct — two
    salts may collide) positions is set. The filter side broadcasts; the
    probe is explode + join + one groupBy on the candidate key."""
    pos = candidates.select(
        F.col(key_col).alias("k"),
        F.explode(F.array_distinct(_positions(key_col, m_bits, k_hashes))).alias(
            "pos"
        ),
    )
    flagged = pos.join(
        F.broadcast(bloom.withColumn("hit", F.lit(1))), "pos", "left"
    )
    return flagged.groupBy("k").agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("hit"), F.lit(0))))
        .cast("int")
        .alias("bloom_hit")
    )
