"""Collocation (statistical phrase) mining over a document corpus.

Tokenizer-training prep: which adjacent word pairs co-occur far more
than chance ("new york", "machine learning") and deserve to be a single
unit? The textbook score is PMI = log p(w1w2)/(p(w1)p(w2)) — but the log
is monotone, so ranking by the LIFT ratio inside it is the same ranking
with none of the transcendental, and the ratio is a single IEEE division
of two exact BIGINT products:

    lift = (c12 * N_tok * N_tok) / (N_big * c1 * c2)

(c12 bigram count, c1/c2 unigram counts, N_tok total tokens, N_big total
bigrams — p(w1w2) = c12/N_big against unigram probabilities c/N_tok).
lift > 1 means "more than chance"; a min-count floor suppresses the
rare-pair noise PMI is notorious for.

Scale shape: bigrams are built ROW-LOCALLY (zip of the token array with
its own tail — no self-join, no window over the corpus), then one
groupBy each for bigram and unigram counts; the two count tables join on
the word columns (linear, vocab-bounded); the two corpus totals ride
broadcast 1-row anchors (never a collect). Top-k compiles to
TakeOrderedAndProject — no global sort materializes.

Overflow note: the products stay in BIGINT up to ~3e6-token test corpora
squared; beyond ~1e9 total tokens move the lift algebra to DECIMAL(38,0)
or rank by the equivalent log-sum — at that scale the ranking, not the
bit pattern, is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collocation_lift(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent word pairs by lift (see module doc), among pairs
    seen at least ``min_count`` times. Emits (w1, w2, c12, c1, c2, lift);
    ordering ties break on (w1, w2) so the selected set is deterministic
    in any engine. All counts are exact BIGINTs; lift is one division."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = docs.select(F.explode(toks).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_tok = uni.agg(F.sum("c").alias("n_tok"))  # 1 row

    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.lit(0), F.size(toks) - 1)),
                F.slice(toks, 2, F.greatest(F.lit(0), F.size(toks) - 1)),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= F.lit(int(min_count)))
    )
    n_big = pairs.agg(F.count(F.lit(1)).alias("n_big"))  # 1 row

    scored = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            (
                (F.col("c12") * F.col("n_tok") * F.col("n_tok"))
                / (F.col("n_big") * F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("w1"), F.col("w2")
    ).limit(int(k))
