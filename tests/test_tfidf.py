"""operators/tfidf.py: handcrafted-corpus math for the log-free RSJ
TF-IDF ranking (stopword annihilation without a stopword list, score
formula, tie-break) and a pure-Python BM25 oracle (standard ln idf,
tolerance compare — the module doc explains why BM25 is engine-only)."""

import math

import pandas as pd
import pytest

from timeseriestokenizer_spark.operators.tfidf import (
    bm25_rank,
    term_freq,
    tfidf_top_terms,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the apple is the apple of my eye the"),
        (2, "the banana the banana the banana"),
        (3, "the zebra grazes"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_term_freq_counts(spark, corpus):
    got = {
        (r["doc_id"], r["term"]): r["tf"] for r in term_freq(corpus).collect()
    }
    assert got[(1, "apple")] == 2 and got[(1, "the")] == 3
    assert got[(2, "banana")] == 3
    assert (3, "zebra") in got


def test_tfidf_scores_and_stopword_annihilation(spark, corpus):
    got = {
        (r["doc_id"], r["rank"]): r
        for r in tfidf_top_terms(corpus, k=3).collect()
    }
    # 'the' is in all 3 docs: idf = (3-3+0.5)/(3+0.5) = 1/7 — even at tf=3
    # it scores 3/7, below any df=1 term (idf (3-1+0.5)/1.5 = 5/3).
    top1 = got[(1, 1)]
    assert top1["term"] == "apple"
    assert top1["score"] == 2.0 * ((3 - 1 + 0.5) / (1 + 0.5))
    assert got[(2, 1)]["term"] == "banana" and got[(2, 1)]["score"] == 5.0
    # doc 1's df=1 singletons (eye, is, my, of) tie at score 5/3: term ASC
    assert got[(1, 2)]["term"] == "eye"
    assert got[(1, 3)]["term"] == "is"
    # 'the' ranks LAST everywhere despite being the most frequent term —
    # doc 1 (6 distinct terms) drops it from the top-3 entirely; docs 2/3
    # (2 and 3 distinct terms) keep it only in their final slot
    assert all(r["term"] != "the" for (d, _), r in got.items() if d == 1)
    assert got[(2, 2)]["term"] == "the"
    assert got[(3, 3)]["term"] == "the"


def test_tfidf_plan_broadcast_anchor_jvm_only(spark, corpus):
    plan = _plan(tfidf_top_terms(corpus, k=3))
    # corpus-size anchor travels as a broadcast, never a collect
    assert "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def _bm25_oracle(texts, query, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in texts}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, tv in toks.items():
        score, matched = 0.0, 0
        for q in set(query):
            tf = tv.count(q)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            sat = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tv) / avgdl))
            score += idf * sat
            matched += 1
        if matched:
            out[d] = (score, matched)
    return out


def test_bm25_matches_python_oracle(spark, corpus):
    texts = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    query = ["apple", "zebra", "banana"]
    want = _bm25_oracle(texts, query)
    got = {
        r["doc_id"]: (r["bm25"], r["n_matched"])
        for r in bm25_rank(corpus, query).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1]
        assert got[d][0] == pytest.approx(want[d][0], rel=1e-12)
    # non-matching docs are absent, never zero-score rows
    assert 3 in got and got[3][1] == 1


def test_bm25_jvm_only(spark, corpus):
    plan = _plan(bm25_rank(corpus, ["apple"]))
    assert "Python" not in plan


def test_collocation_lift_exact_and_plan(spark):
    """Lift ranking: exact counts and one-division lift vs a pure-Python
    oracle; 'new york' dominates; top-k compiles to TakeOrdered (no global
    sort materializes)."""
    from collections import Counter

    from timeseriestokenizer_spark.operators.collocations import (
        collocation_lift,
    )

    texts = [
        "new york is big new york is old",
        "new york and old boston x y",
        "is and x new york",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = collocation_lift(df, min_count=2, k=10).collect()

    uni, big = Counter(), Counter()
    n_tok = n_big = 0
    for t in texts:
        ws = t.split()
        uni.update(ws)
        n_tok += len(ws)
        big.update(zip(ws, ws[1:]))
        n_big += len(ws) - 1
    exp = {}
    for (w1, w2), c12 in big.items():
        if c12 >= 2:
            exp[(w1, w2)] = (
                c12, uni[w1], uni[w2],
                (c12 * n_tok * n_tok) / (n_big * uni[w1] * uni[w2]),
            )
    assert {(r["w1"], r["w2"]): (r["c12"], r["c1"], r["c2"], r["lift"])
            for r in got} == exp
    # ranking: the planted collocation wins
    assert (got[0]["w1"], got[0]["w2"]) == ("new", "york")
    assert got[0]["lift"] > 1.0

    plan = (
        collocation_lift(df, min_count=2, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan, plan
