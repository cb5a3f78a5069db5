"""Determinism across parallelism (SURVEY §5.2.7): the same job at different
shuffle widths / partition layouts produces identical rolled-up points and
token sequences. (The cross-JVM local[8]-vs-local[32] run is
tools/bench_scaling.py, which also checks identical tier counts.)"""

import pandas as pd

from timeseriestokenizer_spark.datagen import transcripts_df
from timeseriestokenizer_spark.functions.signals import derive_signals
from timeseriestokenizer_spark.operators.rollup import rollup_cascade
from timeseriestokenizer_spark.operators.tpe import models_to_registry, tpe_train


def _with_shuffle(spark, n, fn):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        return fn()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_rollup_identical_across_shuffle_widths(spark, transcripts):
    def run(parts, repart):
        def _job():
            t = transcripts.repartition(repart)
            tiers = rollup_cascade(derive_signals(t))
            return (
                tiers["1h"]
                .toPandas()
                .sort_values(["conv_id", "bucket_ts"])
                .reset_index(drop=True)
            )

        return _with_shuffle(spark, parts, _job)

    a = run(4, 3)
    b = run(32, 17)
    pd.testing.assert_frame_equal(a, b)


def test_tpe_models_identical_across_partitioning(spark, transcripts):
    """TPE training happens inside one group regardless of partitioning —
    merge tables must be bit-identical at any shuffle width."""
    from pyspark.sql import functions as F

    sig = derive_signals(transcripts).filter(F.col("latency_s").isNotNull())
    tok = sig.select(
        "conv_id",
        F.col("turn_idx").alias("pos"),
        (F.least(F.col("latency_s"), F.lit(120.0)) / 10).cast("int").alias("token"),
    )

    def run(parts, repart):
        def _job():
            return models_to_registry(
                tpe_train(tok.repartition(repart), "conv_id", "token", "pos", 30, 13)
            )

        return _with_shuffle(spark, parts, _job)

    a = run(4, 5)
    b = run(16, 11)
    assert set(a) == set(b)
    for k in a:
        assert a[k].merges == b[k].merges
        assert a[k].actual_vocab_size == b[k].actual_vocab_size
