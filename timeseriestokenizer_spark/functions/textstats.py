"""Text-analysis functions for training-data pipelines over a documents
table: token counting, quality scoring, language-ID heuristic, document
fingerprinting. String semantics (tokenization, regexes, hashing) are always
JVM-side Catalyst expressions; the per-document counting passes (repetition /
diversity) and the rolling-hash fingerprint run vectorized Python over Arrow
batches, tested against the NumPy oracle.

These are graft-added operators (not in the reference) required by the build
brief's training-data-pipeline scope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# BPE-ish token regex: letter runs, digit runs, single other non-space chars
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "ich", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
}


def ws_token_count(text_col="text"):
    """Whitespace token count."""
    return F.size(F.split(F.trim(text_col), r"\s+"))


def bpe_token_count(text_col="text"):
    """BPE-ish regex token count (letter runs / digit runs / punct chars)."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0)))


def with_token_counts(df: DataFrame, text_col="text") -> DataFrame:
    return df.withColumn("n_ws_tokens", ws_token_count(text_col).cast("long")).withColumn(
        "n_bpe_tokens", bpe_token_count(text_col).cast("long")
    )


def stopword_ratio(text_col="text", lang="en"):
    """Fraction of whitespace tokens that are (given-language) stopwords."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(words), F.lit(1))


def with_quality(df: DataFrame, text_col="text") -> DataFrame:
    """Quality signals: length, stopword ratio, punctuation ratio, mean word
    length, and a simple composite score in [0, 1]."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    n_words = F.greatest(F.size(words), F.lit(1))
    n_chars = F.length(text_col)
    punct = F.length(F.regexp_replace(text_col, r"[^!-/:-@\[-`{-~]", ""))
    out = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", F.size(words).cast("long"))
        .withColumn("stopword_ratio", stopword_ratio(text_col))
        .withColumn("punct_ratio", punct / F.greatest(n_chars, F.lit(1)))
        .withColumn(
            "mean_word_len",
            (n_chars - (F.size(words) - 1)) / n_words,
        )
    )
    # composite: long enough, some stopwords, not punct-heavy
    score = (
        F.least(F.col("n_words") / 50.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.3
    )
    return out.withColumn("quality_score", score)


def with_lang_guess(df: DataFrame, text_col="text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: CJK-codepoint share first, then
    argmax of per-language stopword hit counts (deterministic tie-break by
    language order en,de,es,fr)."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    cjk = F.length(F.regexp_replace(text_col, r"[^一-鿿]", ""))
    scores = []
    for lang in ["en", "de", "es", "fr"]:
        sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(sw, w))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax by hits; ties resolve to the EARLIER language in the list
    best = F.aggregate(
        F.array(*scores),
        scores[0],
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    guess = (
        F.when(cjk * 2 > F.length(text_col), F.lit("zh"))
        .when(best["hits"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )
    return df.withColumn("lang_guess", guess)


def md5_fingerprint(text_col="text"):
    """64-bit document fingerprint from the md5 prefix (cross-engine stable)."""
    return F.conv(F.substring(F.md5(text_col), 1, 15), 16, 10).cast("long")


_SANITIZE_MAP = {
    "°": "deg", "/": "_per_", "%": "pct", "(": "", ")": "", "*": "x",
    " ": "_", ".": "_",
}


def sanitize_name(col):
    """Filename/identifier sanitizer (F5 twin of the reference's char map at
    transform_files_into_tokens.py:94-123): special-char replacement, invalid
    char strip, underscore collapse."""
    out = col if not isinstance(col, str) else F.col(col)
    for src, dst in _SANITIZE_MAP.items():
        out = F.replace(out, F.lit(src), F.lit(dst))
    out = F.regexp_replace(out, r"[^A-Za-z0-9_\-]", "")
    return F.regexp_replace(out, r"_+", "_")


ROLL_BASE = 1000003
ROLL_MOD = (1 << 61) - 1


def rolling_fingerprint_udf():
    """Polynomial rolling hash over UTF-8 bytes mod 2^61-1 — the engine's
    content-defined fingerprint, vectorized ACROSS the Arrow batch: the
    Horner recurrence h = h*BASE + b runs one numpy step per byte POSITION
    over all documents at once (no per-byte Python loop — that form was
    ~100x slower and flagged in round 2).

    The 2^81-bit intermediate h*BASE is kept inside uint64 with the Mersenne
    trick: for M = 2^61-1, x*2^31 mod M is a 61-bit rotation
    ((x mod 2^30) << 31) + (x >> 30), so h*BASE = (h>>31)*BASE*2^31
    + (h&(2^31-1))*BASE needs only <2^63 products. Parity with the scalar
    twin (rolling_fingerprint_oracle) is pytest-pinned.

    Memory is BOUNDED: docs are sorted by length and processed in chunks
    whose padded matrix (rows x chunk_maxlen) never exceeds ~8M uint64 cells
    (64 MB), so one long outlier in an Arrow batch cannot force a
    rows x max_doc_len allocation (a 1 MB doc in a 10k-row batch would have
    padded out to ~80 GB in the naive dense form). Length-sorting also keeps
    the active-row mask near-full inside each chunk."""

    CELL_BUDGET = 1 << 23  # 8M uint64 cells = 64 MB padded matrix max

    @pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        bs = [(t or "").encode("utf-8") for t in texts]
        n = len(bs)
        if n == 0:
            return pd.Series([], dtype="int64")
        lens = np.array([len(b) for b in bs], dtype=np.int64)
        M = np.uint64(ROLL_MOD)
        BASE = np.uint64(ROLL_BASE)
        MASK30 = np.uint64((1 << 30) - 1)
        MASK31 = np.uint64((1 << 31) - 1)
        out = np.zeros(n, dtype=np.uint64)
        order = np.argsort(lens, kind="stable")
        start = 0
        while start < n:
            # grow the chunk while the padded matrix stays under budget;
            # lens is ascending along `order`, so the chunk max is its last len
            end = start + 1
            while end < n:
                width = max(int(lens[order[end]]), 1)
                if (end - start + 1) * width > CELL_BUDGET:
                    break
                end += 1
            idx = order[start:end]
            clens = lens[idx]
            L = int(clens.max())
            cn = len(idx)
            mat = np.zeros((cn, max(L, 1)), dtype=np.uint64)
            for row, i in enumerate(idx):
                if bs[i]:
                    mat[row, : len(bs[i])] = np.frombuffer(bs[i], dtype=np.uint8)
            h = np.zeros(cn, dtype=np.uint64)
            for j in range(L):
                active = clens > j
                hj = h[active]
                t1 = (hj >> np.uint64(31)) * BASE  # < 2^50
                t1 = ((t1 & MASK30) << np.uint64(31)) + (t1 >> np.uint64(30))
                y = t1 + (hj & MASK31) * BASE + mat[active, j]  # < 2^63
                y = (y & M) + (y >> np.uint64(61))
                y = (y & M) + (y >> np.uint64(61))
                h[active] = np.where(y == M, np.uint64(0), y)
            out[idx] = h
            start = end
        return pd.Series(out.astype(np.int64))

    return _udf


def rolling_fingerprint_oracle(text: str) -> int:
    """Driver-side twin of rolling_fingerprint_udf for parity tests."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * ROLL_BASE + b) % ROLL_MOD
    return h


def corpus_report(docs: DataFrame) -> DataFrame:
    """Corpus-composition report per (source, lang): volume, whitespace-token
    totals, mean quality, and exact-duplicate incidence — the summary a data
    curator reads before setting mixing weights for a training run.

    Scale shape: two hash aggregations (duplicate counting groups on md5 —
    fixed-width shuffle keys, never text — and the final rollup groups on
    the tiny (source, lang) key space with map-side partial aggregation)
    plus one equi-join on doc_id. avg_quality is rounded to 5 dp so the
    summation order of the distributed average cannot leak into oracle
    comparisons (CLAUDE.md float-parity rule)."""
    ann = with_quality(with_token_counts(docs))
    copies = docs.groupBy(F.md5("text").alias("_h")).agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    dup_flags = (
        docs.select("doc_id", F.md5("text").alias("_h"))
        .join(copies, "_h")
        .select("doc_id", (F.col("n_copies") > 1).alias("is_dup"))
    )
    return (
        ann.join(dup_flags, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws_tokens").alias("total_ws_tokens"),
            F.round(F.avg("quality_score"), 5).alias("avg_quality"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_docs"),
        )
    )


def repetition_stats(
    docs: DataFrame,
    text_col="text",
    doc_col="doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    table A1 'duplicate n-gram fraction'): per document, what fraction of
    its word bigrams is occupied by (a) its single most frequent bigram
    and (b) all bigrams occurring more than once. High values mark
    boilerplate / keyword-stuffed / looping docs — the standard quality
    screen a pretraining pipeline runs alongside [[doc_quality]] scores.

    Plan shape: the counts are per-document, so the whole computation is
    ROW-LOCAL — one JVM tokenizing projection (text dies there) and one
    Python counting pass, ZERO data shuffles (the repartition spreads the
    single-row-group scan; at real scale the source already has splits).
    Docs with fewer than two tokens have no bigrams and are absent from
    the output (documented; both engines agree).

    Fractions are exact BIGINT/BIGINT divisions — engine-identical,
    emitted unrounded."""
    # tokenize ONCE JVM-side (Java regex semantics stay in Catalyst; only
    # the token arrays cross to Python), then count per-doc bigrams in one
    # zero-exchange Python pass. The counts are entirely ROW-LOCAL, so the
    # former explode + groupBy(doc, bigram) + groupBy(doc) shuffled ~1M
    # bigram strings twice for nothing (guide §2.4: remove shuffles
    # outright). Bigrams are counted as adjacent-token PAIRS — tokens are
    # \s+-split so they contain no spaces, making the former
    # concat-with-space key injective and pair counting identical.
    if parallelism:
        # single-row-group sources pin the Python pass to one task (the
        # shingle_sets trade): spread the raw text once when asked
        docs = docs.repartition(parallelism, doc_col)
    toked = docs.select(
        F.col(doc_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
    ).filter(F.size("_toks") >= 2)
    id_type = docs.schema[doc_col].dataType.simpleString()

    def _rep(it):
        from collections import Counter

        import pandas as pd

        for pdf in it:
            ids, ns, tops, dups = [], [], [], []
            for d, toks in zip(pdf[doc_col], pdf["_toks"]):
                toks = list(toks)
                c = Counter(zip(toks, toks[1:]))
                ids.append(d)
                ns.append(len(toks) - 1)
                tops.append(max(c.values()))
                dups.append(sum(v for v in c.values() if v > 1))
            yield pd.DataFrame(
                {doc_col: ids, "n_bigrams": ns, "top": tops, "dup": dups}
            )

    counted = toked.mapInPandas(
        _rep, f"{doc_col} {id_type}, n_bigrams long, top long, dup long"
    )
    total = F.col("n_bigrams")
    return counted.select(
        F.col(doc_col),
        total.alias("n_bigrams"),
        F.col("top").alias("top_bigram_count"),
        (F.col("top").cast("double") / total.cast("double")).alias(
            "top_bigram_frac"
        ),
        (F.col("dup").cast("double") / total.cast("double")).alias(
            "dup_bigram_frac"
        ),
    )


def diversity_stats(docs: DataFrame, text_col="text", doc_col="doc_id") -> DataFrame:
    """Exact lexical-diversity screen per document: Simpson index
    D = Σc²/n² (repeat-probability of two random tokens), effective
    vocabulary n²/Σc² (the "how many equally-frequent tokens would look
    like this" inverse), type-token ratio d/n, and top-token share
    max(c)/n. Low effective vocabulary / high top-share mark the
    keyword-stuffed and looping docs that [[doc_repetition]] catches at
    the bigram level — this is the unigram companion.

    Deliberately NO entropy: Shannon's Σ(c/n)·ln(c/n) needs a
    transcendental whose last-ulp differs across engines (Math.log is
    not correctly rounded), so it cannot be hash-exact; every metric
    here is a ratio of exact BIGINTs instead — same screening power,
    bit-reproducible (Simpson's D is a monotone proxy for Rényi-2
    entropy exp(-H₂) = D).

    Plan shape: ZERO shuffles — tokens sort row-locally and one
    run-length ``aggregate`` pass (the mann_kendall tie-count pattern)
    produces n, distinct count, Σc² and max c; the text column dies in
    the projection. Scan → project, nothing else."""
    toked = docs.select(
        F.col(doc_col),
        F.array_sort(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "_st"
        ),
    ).filter(F.size("_st") >= 1)
    stats = F.expr(
        """aggregate(
             _st,
             named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT),
                          'n', CAST(0 AS BIGINT), 'd', CAST(0 AS BIGINT),
                          'sq', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)),
             (st, x) -> CASE WHEN st.prev IS NULL OR x != st.prev
                 THEN named_struct('prev', x, 'run', CAST(1 AS BIGINT),
                                   'n', st.n + 1, 'd', st.d + 1,
                                   'sq', st.sq + st.run * st.run,
                                   'mx', greatest(st.mx, st.run))
                 ELSE named_struct('prev', x, 'run', st.run + 1,
                                   'n', st.n + 1, 'd', st.d,
                                   'sq', st.sq, 'mx', st.mx) END,
             st -> named_struct('n', st.n, 'd', st.d,
                                'sq', st.sq + st.run * st.run,
                                'mx', greatest(st.mx, st.run)))"""
    )
    n, d = F.col("_s.n"), F.col("_s.d")
    sq, mx = F.col("_s.sq"), F.col("_s.mx")
    return toked.select(F.col(doc_col), stats.alias("_s")).select(
        F.col(doc_col),
        n.alias("n_tokens"),
        d.alias("distinct_tokens"),
        (sq.cast("double") / (n * n).cast("double")).alias("simpson_d"),
        ((n * n).cast("double") / sq.cast("double")).alias("effective_vocab"),
        (d.cast("double") / n.cast("double")).alias("type_token_ratio"),
        (mx.cast("double") / n.cast("double")).alias("top_token_share"),
    )


# Deliberately engine-portable regexes: ASCII character classes, bounded
# quantifiers, \b word boundaries — identical semantics in Java regex
# (Spark) and RE2 (DuckDB); no lookarounds (RE2 has none), no Unicode
# classes (Java's are Unicode-aware where RE2's are ASCII).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_LONGNUM_RE = r"\b[0-9]{10,15}\b"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Corpus PII scrub (C4/Dolma-style preprocessing): sequentially
    replace emails, IPv4 literals, then long digit runs (phone/account
    numbers) with typed placeholder tokens, counting each class AT ITS
    OWN STAGE — email digits can't double-count as a long number
    because the email is already gone when the digit pass runs. The
    staged order is part of the contract; any oracle must mirror it.

    Entirely JVM-side (regexp_count/regexp_replace — no Python in the
    hot path); emits per-doc counts, the redacted length, and an md5
    fingerprint of the redacted text (md5 is engine-identical, and the
    fingerprint travels the shuffle instead of the document — the
    dedup-key doctrine). Row-local: ZERO exchanges."""
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_num = F.regexp_count(t2, F.lit(PII_LONGNUM_RE))
    t3 = F.regexp_replace(t2, PII_LONGNUM_RE, "<NUM>")
    return df.select(
        *[F.col(c) for c in id_cols],
        n_email.cast("long").alias("n_email"),
        n_ip.cast("long").alias("n_ipv4"),
        n_num.cast("long").alias("n_longnum"),
        (n_email + n_ip + n_num).cast("long").alias("n_redactions"),
        F.length(t3).cast("long").alias("redacted_len"),
        F.md5(t3).alias("redacted_md5"),
    )


def oov_rate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary screening: for each eval doc, how many of its
    token INSTANCES use a word the training corpus never contains — the
    unigram sibling of ngram_contamination (there: eval text leaked INTO
    train; here: eval text the tokenizer/vocab trained on train has never
    seen). High OOV means the benchmark exercises vocabulary the model
    could only handle via fallback pieces.

    Scale shape (the shingle doctrine): the train side reduces to
    DISTINCT md5-60-bit word hashes — fixed-width ints, never strings, so
    the semi/anti join shuffles a bounded-width key regardless of word
    length; eval tokens carry only (id, hash). Emits (id, n_tok, n_oov,
    oov_frac) with oov_frac = one exact-BIGINT division, unrounded."""
    def _h(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    vocab = (
        train.select(F.explode(tokens).alias("_w"))
        .select(_h(F.col("_w")).alias("_hw"))
        .distinct()
    )
    ev = eval_df.select(
        F.col(id_col), F.explode(tokens).alias("_w")
    ).select(F.col(id_col), _h(F.col("_w")).alias("_hw"))
    oov = (
        ev.join(vocab, "_hw", "left_anti")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n_oov"))
    )
    totals = eval_df.select(
        F.col(id_col), F.size(tokens).cast("long").alias("n_tok")
    )
    return (
        totals.join(oov, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tok"),
            F.coalesce(F.col("_n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            (
                F.coalesce(F.col("_n_oov"), F.lit(0)).cast("long")
                / F.col("n_tok")
            ).alias("oov_frac"),
        )
    )


def unigram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """KenLM-style corpus-LM quality scoring, unigram with add-1 smoothing:
    train word counts on the corpus itself (one groupBy), then score each
    document by its mean token log-probability

        lm_score(d) = avg over tokens w of ln((count(w) + 1) / (N + V))

    — the standard pretraining-data filter signal (docs of rare/garbled
    tokens score far below fluent text; threshold or quantile-cut on it).
    Tokenization matches the corpus_report convention exactly (lowercase,
    whitespace split, empty tokens dropped) so the DuckDB oracle shares it.

    Scale shape: counts and scores are groupBy/join only — the vocabulary
    table shuffles by word (no driver collect, works at web-corpus vocab
    sizes), the one-row (N, V) total broadcasts, and the per-token logp is
    computed ONCE per vocab word, not per occurrence. Float contract:
    (cnt+1)/(N+V) is a correctly-rounded division of exact integers on
    both engines; ln may differ in the last ulp across libms and the
    per-doc avg is summation-order sensitive, so lm_score rounds to 6 dp
    (the repo's r6 convention)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    logp = counts.crossJoin(F.broadcast(totals)).select(
        "w",
        F.log(
            (F.col("cnt") + 1).cast("double")
            / (F.col("n_total") + F.col("v_size")).cast("double")
        ).alias("logp"),
    )
    return (
        toks.join(logp, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("lm_score"),
        )
    )
