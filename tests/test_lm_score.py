"""unigram_lm_score: fluency ordering, smoothing floor, numpy oracle."""

from __future__ import annotations

import math

from timeseriestokenizer_spark.functions.textstats import unigram_lm_score


def test_common_words_outscore_gibberish(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again"),
            (2, "xqzvj kpwrt bnmlo zzyxw qqppr"),
            (3, "the the the the the"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lm_score"] for r in unigram_lm_score(docs).collect()}
    assert got[3] > got[1] > got[2]


def test_matches_python_oracle(spark):
    texts = {
        1: "a b c a b a",
        2: "c c d",
        3: "e",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    toks = {k: v.lower().split() for k, v in texts.items()}
    cnt: dict = {}
    for ws in toks.values():
        for w in ws:
            cnt[w] = cnt.get(w, 0) + 1
    n, v = sum(cnt.values()), len(cnt)
    want = {
        k: round(
            sum(math.log((cnt[w] + 1) / (n + v)) for w in ws) / len(ws), 6
        )
        for k, ws in toks.items()
    }
    got = {r["doc_id"]: r["lm_score"] for r in unigram_lm_score(docs).collect()}
    assert got == want


def test_real_corpus_spread(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = unigram_lm_score(docs).collect()
    assert len(rows) == docs.count()
    scores = sorted(r["lm_score"] for r in rows)
    assert scores[0] < scores[-1]  # the filter signal actually separates
    assert all(s < 0 for s in scores)
