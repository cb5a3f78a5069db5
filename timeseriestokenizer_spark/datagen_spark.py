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
) -> DataFrame:
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    convs = spark.range(0, C, 1, n_partitions).select(
        F.col("id").alias("conv_index")
    )
    len_span = max(2, avg_len)
    conv_h = F.abs(F.xxhash64("conv_index", F.lit(seed)))
    convs = convs.withColumn(
        "conv_len", (F.lit(avg_len // 2) + conv_h % len_span).cast("int")
    ).withColumn("conv_start_s", (conv_h % (86400 * 30)).cast("long"))

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
