"""Distributed (Spark-native) transcript generation for benchmark scale.

make_transcripts_pdf (datagen.py) builds small fixtures driver-side; this
module generates the same SHAPE of table entirely with Catalyst expressions —
spark.range → sequence/explode → xxhash64-derived columns — so a 10M+-turn
bench table materializes in parallel with no driver bottleneck (the way a
100TB synthetic load would be produced on a cluster).

Determinism: every column derives from xxhash64(conv_index, turn_idx, seed),
which is a fixed algorithm — same (C, avg_len, seed) → identical table at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transcripts_spark(
    spark,
    C: int,
    avg_len: int = 200,
    seed: int = 42,
    n_partitions: int | None = None,
    span_days: int = 30,
) -> DataFrame:
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    convs = spark.range(0, C, 1, n_partitions).select(
        F.col("id").alias("conv_index")
    )
    len_span = max(2, avg_len)
    conv_h = F.abs(F.xxhash64("conv_index", F.lit(seed)))
    convs = convs.withColumn(
        "conv_len", (F.lit(avg_len // 2) + conv_h % len_span).cast("int")
    ).withColumn("conv_start_s", (conv_h % (86400 * int(span_days))).cast("long"))

    turns = convs.select(
        "conv_index",
        "conv_start_s",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    )
    h = F.abs(F.xxhash64("conv_index", "turn_idx", F.lit(seed + 1)))
    base_epoch = 1767225600  # 2026-01-01T00:00:00Z
    ts = F.timestamp_seconds(
        F.lit(base_epoch)
        + F.col("conv_start_s")
        + F.col("turn_idx").cast("long") * 12
        + (h % 12)  # jitter < step → strictly increasing within conv
    )
    is_tool = (h % 10) == 0
    role = F.when(is_tool, "tool").when(
        F.col("turn_idx") % 2 == 0, "user"
    ).otherwise("assistant")
    tool = F.when(
        is_tool,
        F.element_at(F.array(F.lit("search"), F.lit("exec"), F.lit("read")), (h % 3 + 1).cast("int")),
    )
    conv_id = F.concat(F.lit("conv_"), F.lpad(F.col("conv_index").cast("string"), 6, "0"))
    text = F.repeat(
        F.concat(
            F.lit("turn "),
            F.col("turn_idx").cast("string"),
            F.lit(" of "),
            conv_id,
            F.lit(" "),
        ),
        (1 + h % 40).cast("int"),
    )
    return turns.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


_CORPUS_VOCAB = [
    "spark", "batch", "stream", "table", "column", "row", "scan", "filter",
    "group", "agg", "join", "sort", "hash", "range", "window", "part",
    "shuffle", "cache", "query", "plan", "value", "key", "index", "merge",
    "order", "limit", "union", "pivot", "sample", "token", "vector", "text",
    "fast", "slow", "big", "small", "hot", "cold", "wide", "narrow",
]


def documents_spark(
    spark,
    n_docs: int,
    seed: int = 42,
    n_partitions: int | None = None,
    vocab_size: int = 10_000,
) -> DataFrame:
    """Heavy-tailed synthetic corpus for dedup/similarity SCALE benchmarks
    (tools/bench_sf1.py) — same (doc_id, text, lang, source, n_chars) shape
    as the driver's documents table, generated entirely with Catalyst
    expressions so 10x-100x corpora materialize in parallel.

    Deliberately adversarial structure:
    * Zipf-ish lengths — most docs 10-100 words, a 5% tail up to ~2000
      words (the long-outlier regime that broke the naive fingerprint
      padding and stresses shingle explosion).
    * duplicate groups — every third group of 8 docs carries one EXACT
      duplicate (role 1 copies role 0's text) and one NEAR duplicate
      (role 2: same base text with ~5% of words mutated) → known dedup
      yield at any scale.
    * boilerplate hot bucket — 2% of docs share one 180-word template plus
      an 8-word doc-specific tail → one viral LSH bucket whose quadratic
      candidate blow-up the max_bucket guard must cap.

    Determinism: every word derives from xxhash64(content_id, pos, seed) —
    same (n_docs, seed) → identical corpus at any parallelism.

    ``vocab_size`` matters for similarity-join realism: a tiny vocabulary
    makes the k-gram shingle space dense, so EVERY doc pair shares hot
    shingles and any exact similarity join is intrinsically quadratic (the
    round-4 sf1 run proved it: a 40-word vocab at 50k docs pushed the
    prefix-filter join's intermediate past 29 GB of shuffle). Real corpora
    have ~1e5+ word vocabularies and astronomically sparse shingle spaces
    — the default models that; shrink it only to stress hot-shingle guards.
    """
    V = int(vocab_size)
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    docs = spark.range(0, n_docs, 1, n_partitions).select(F.col("id"))

    grp = F.col("id") - (F.col("id") % 8)
    role = F.col("id") % 8
    dup_grp = (F.col("id") % 24) < 8  # grp % 3 == 0 without a second column
    is_dup = dup_grp & (role == 1)
    is_near = dup_grp & (role == 2)
    is_boiler = F.col("id") % 50 == 3

    content_id = F.when(is_dup | is_near, grp).otherwise(F.col("id"))
    h1 = F.abs(F.xxhash64(content_id, F.lit(seed)))
    len_words = F.when(h1 % 20 == 0, 10 + h1 % 2000).otherwise(10 + h1 % 90).cast("int")

    def word_at(pos, cid):
        # small ids resolve to the readable 40-word core vocabulary, the
        # rest to synthetic "w<id>" tokens — same hash, any vocab_size
        wid = F.abs(F.xxhash64(cid, pos, F.lit(seed + 1))) % V
        core = F.array(*[F.lit(w) for w in _CORPUS_VOCAB])
        return F.when(
            wid < len(_CORPUS_VOCAB), F.element_at(core, (wid + 1).cast("int"))
        ).otherwise(F.concat(F.lit("w"), wid.cast("string")))

    # ~5% of a near-dup's positions re-roll against the doc's OWN id
    def body(cid, mutate):
        w = F.transform(
            F.sequence(F.lit(0), len_words - 1),
            lambda p: F.when(
                F.lit(mutate)
                & (F.abs(F.xxhash64(F.col("id"), p, F.lit(seed + 2))) % 20 == 0),
                word_at(p + 1_000_000, F.col("id")),
            ).otherwise(word_at(p, cid)),
        )
        return F.array_join(w, " ")

    boiler_body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(179)),
            lambda p: word_at(p, F.lit(987654321)),
        ),
        " ",
    )
    boiler_tail = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)), lambda p: word_at(p, F.col("id"))
        ),
        " ",
    )
    text = (
        F.when(is_boiler, F.concat(boiler_body, F.lit(" "), boiler_tail))
        .when(is_near, body(content_id, True))
        .otherwise(body(content_id, False))
    )
    h2 = F.abs(F.xxhash64("id", F.lit(seed + 3)))
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("es"), F.lit("fr")),
        (h2 % 4 + 1).cast("int"),
    )
    source = F.element_at(
        F.array(F.lit("web"), F.lit("books"), F.lit("code")),
        (h2 % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def embeddings_spark(
    spark,
    n_vecs: int,
    dim: int = 32,
    n_clusters: int = 32,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """Clustered synthetic embeddings (vec_id, embedding float[], label) for
    ANN scale benchmarks: each vector = its cluster centroid + small noise,
    both xxhash64-derived (deterministic at any parallelism)."""
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    vecs = spark.range(0, n_vecs, 1, n_partitions)
    label = (F.abs(F.xxhash64("id", F.lit(seed))) % n_clusters).cast("int")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            (F.abs(F.xxhash64(label, i, F.lit(seed + 1))) % 1000) / 500.0 - 1.0
            + ((F.abs(F.xxhash64(F.col("id"), i, F.lit(seed + 2))) % 1000) / 5000.0)
        ).cast("float"),
    )
    return vecs.select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        label.alias("label"),
    )
