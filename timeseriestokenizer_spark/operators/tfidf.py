"""Corpus term ranking: TF-IDF distinctive-term extraction and BM25
relevance scoring over the documents table.

Graft-new LLM-data-pipeline operators (the reference has no corpus
ranking; its nearest neighbor is the token statistics family,
SURVEY.md §2 B9). They complement the dedup/contamination screens:
tfidf_top_terms surfaces what a document is ABOUT (topic tagging,
cluster labelling, boilerplate detection — a doc whose top terms are
navigation chrome is boilerplate), bm25_rank retrieves the corpus
documents most relevant to a query term set (eval-set curation,
targeted decontamination).

Tokenization is the house convention — ``split(lower(trim(text)),
'\\s+')`` — shared with diversity_stats / stopword_ratio so every text
screen agrees on what a token is.

Float contract (CLAUDE.md doctrine): tfidf_top_terms uses the
Robertson–Sparck Jones idf WITHOUT the log — idf = (N − df + 0.5) /
(df + 0.5) — because ln is not cross-engine bit-stable (the
doc_diversity precedent) while this rational is a fixed IEEE op
sequence on exact BIGINT-derived operands: bit-identical in any
engine, monotone in the same direction as log-idf, and it still
annihilates ubiquitous terms (df ≈ N ⇒ idf ≈ 0.5/N, so stopwords rank
last without a stopword list). bm25_rank keeps the standard
ln-idf — it is an ENGINE operator (pytest-verified against a pure
numpy oracle with tolerance), deliberately not a hash contract row:
its score is a transcendental plus an order-dependent Σ over query
terms.

Scale shape: explode → groupBy(doc, term) partial-aggregates map-side
(the term stream shrinks to per-doc counts before any exchange); df is
a second aggregate of that table; the tf⋈df join shuffles only
(doc, term, tf) triples — text never rides a shuffle. Corpus-global
scalars (N, avgdl) travel as a broadcast 1-row anchor (the
rfm_segments precedent), never a driver collect. The final top-k is a
per-doc row_number window — clustered on doc_id, bounded output."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _tokens(text_col: str) -> "F.Column":
    """House tokenization: lowercased whitespace split (see module doc)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def term_freq(
    docs: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """(doc, term, tf) counts. Empty terms (empty/whitespace-only docs)
    are dropped on both engines. One exchange on (doc, term), fed by
    map-side partial counts."""
    return (
        docs.select(F.col(doc_col), F.explode(_tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(doc_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Top-k distinctive terms per document by tf × RSJ-idf (log-free;
    module doc explains why). Emits (doc, term, tf, df, n_docs, score,
    rank); ties in the double score break on term ASC so the ranking is
    engine-identical even when two (tf, df) rationals round to the same
    double.

    score = CAST(tf AS DOUBLE) * ((CAST(N − df AS DOUBLE) + 0.5) /
    (CAST(df AS DOUBLE) + 0.5)) — the exact op TREE is part of the
    contract; any oracle must mirror it op-for-op (multiply-after-divide
    reassociation changes the last ulp)."""
    tf = term_freq(docs, text_col, doc_col)
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    anchor = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_tab, "term")
        .join(F.broadcast(anchor))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (
                ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
        )
    )
    wr = W.partitionBy(doc_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select(doc_col, "term", "tf", "df", "n_docs", "score", "rank")
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document to ``query_terms``
    (standard ln idf — engine operator, numpy-verified; see module doc
    for why it is not a hash contract row).

    idf(q) = ln(1 + (N − df + 0.5)/(df + 0.5))   (always ≥ 0)
    sat(tf) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score(doc) = Σ_q idf(q)·sat(tf_{doc,q})

    The query-term filter lands immediately after the explode — df for
    a query term counted from the filtered stream equals its corpus df
    (every doc containing the term survives the filter) — while dl and
    avgdl come from ALL documents via a length table + broadcast
    anchor, as BM25 requires. Only matching docs are emitted, with
    n_matched for AND-ish downstream filtering."""
    terms = sorted(set(query_terms))
    toks = docs.select(
        F.col(doc_col), F.explode(_tokens(text_col)).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(doc_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = docs.select(
        F.col(doc_col),
        F.size(F.filter(_tokens(text_col), lambda t: t != F.lit(""))).alias(
            "dl"
        ),
    )
    anchor = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    per_term = (
        tf.join(F.broadcast(df_tab), "term")
        .join(dl, doc_col)
        .join(F.broadcast(anchor))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
        )
        .withColumn(
            "sat",
            (F.col("tf").cast("double") * F.lit(float(k1) + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(float(k1))
                * (
                    F.lit(1.0 - float(b))
                    + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
    )
    return per_term.groupBy(doc_col).agg(
        F.sum(F.col("idf") * F.col("sat")).alias("bm25"),
        F.count(F.lit(1)).alias("n_matched"),
    )
