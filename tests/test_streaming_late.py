"""Streaming semantics: watermark drops late rows; composite-key Gorilla
packing bounds groups; approx_count_distinct sanity (scale path of A13)."""

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.gorilla import gorilla_pack, gorilla_unpack


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Two micro-batches: the second contains a row far older than the
    watermark — in append mode its window is already finalized/expired and
    the late row must not create or update a bucket."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = pd.Timestamp("2026-01-01 00:00:00")

    def write_batch(rows, name):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        spark.createDataFrame(pdf, schema=schema).write.mode("append").parquet(src)

    # batch 1: on-time rows spanning 90 minutes (watermark = max_ts - 2m)
    write_batch(
        [("c", i, "user", "hello world", None, base + pd.Timedelta(minutes=i)) for i in range(90)],
        "b1",
    )

    from timeseriestokenizer_spark.streaming.rollup_stream import run_stream_append

    sink = str(tmp_path / "sink")

    def run_pass():
        return run_stream_append(
            spark, src, schema, ckpt, sink, watermark="2 minutes"
        )

    n1 = run_pass().count()

    # batch 2: one very-late row (t=+5m, an hour behind the watermark)
    write_batch([("c", 999, "user", "late row", None, base + pd.Timedelta(minutes=5))], "b2")
    run_pass()
    out = spark.read.parquet(sink).toPandas()
    bucket5 = out[out.bucket_ts == base + pd.Timedelta(minutes=5)]
    # the late row was dropped: its bucket still reports the on-time count
    assert (bucket5["n_turns"] == 1).all()
    assert len(out) >= n1


def test_gorilla_composite_key(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "conv_id": ["a"] * 100 + ["a"] * 100,
            "day": ["d1"] * 100 + ["d2"] * 100,
            "ts": pd.to_datetime(np.arange(200) * 10**6, unit="us"),
            "value": np.floor(rng.standard_normal(200) * 10),
        }
    )
    df = spark.createDataFrame(pdf)
    packed = gorilla_pack(df, ["conv_id", "day"], "ts", "value")
    rows = {r["series_id"]: r for r in packed.collect()}
    assert set(rows) == {"a|d1", "a|d2"}  # one bounded group per (conv, day)
    assert all(r["n_points"] == 100 for r in rows.values())
    back = gorilla_unpack(packed).toPandas()
    assert len(back) == 200
    assert np.array_equal(
        np.sort(back["value"].to_numpy()), np.sort(pdf["value"].to_numpy())
    )


def test_approx_count_distinct_sanity(spark):
    df = spark.range(100000).select((F.col("id") % 5000).alias("v"))
    exact = df.select(F.countDistinct("v")).first()[0]
    approx = df.select(F.approx_count_distinct("v", 0.02)).first()[0]
    assert exact == 5000
    assert abs(approx - exact) / exact < 0.05


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """At-least-once ingest: the same (conv_id, turn_idx) rows land twice
    (replayed file) plus once more inside a later micro-batch still within
    the watermark — the deduped sink holds each key exactly once, and keys
    never seen duplicated pass through untouched."""
    import pandas as pd
    import pyspark.sql.types as T

    from timeseriestokenizer_spark.streaming.dedup_stream import run_stream_dedup

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    base = pd.Timestamp("2026-01-01 00:00:00")
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    rows = [
        ("a", i, "user", f"turn {i}", None, base + pd.Timedelta(minutes=i))
        for i in range(10)
    ]
    dup_rows = rows[:5]  # replayed producer retry, same payload
    near_dup = [  # same key arriving 1 min later (retry with clock skew)
        ("a", 7, "user", "turn 7", None, base + pd.Timedelta(minutes=8)),
    ]
    pdf = pd.DataFrame(rows + dup_rows + near_dup, columns=cols)
    spark.createDataFrame(pdf, schema=schema).write.mode("append").parquet(src)

    got = run_stream_dedup(
        spark, src, schema, ckpt, out, keys=("conv_id", "turn_idx"), watermark="10 minutes"
    )
    pd_out = got.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(pd_out) == 10
    assert list(pd_out["turn_idx"]) == list(range(10))
    assert pd_out["conv_id"].eq("a").all()


def test_streaming_session_window(spark, tmp_path):
    """session_agg's streaming claim, driven for real: readStream →
    withWatermark → session_window aggregation → append parquet sink.
    Sessions finalize once the watermark passes their gap; the two bursts
    separated by > gap land as two session rows."""
    import pandas as pd
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    schema = T.StructType(
        [T.StructField("conv_id", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = (
        [("c", base + pd.Timedelta(minutes=i)) for i in range(3)]          # burst 1
        + [("c", base + pd.Timedelta(minutes=60 + i)) for i in range(2)]   # burst 2
        + [("c", base + pd.Timedelta(minutes=300))]                        # watermark pusher
    )
    spark.createDataFrame(pd.DataFrame(rows, columns=["conv_id", "ts"]), schema=schema) \
        .write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agged = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("conv_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("conv_id", F.col("sw.start").alias("session_start"), "n_events")
    )
    q = (
        agged.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        r["session_start"]: r["n_events"] for r in spark.read.parquet(out).collect()
    }
    assert got[base.to_pydatetime()] == 3                              # burst 1
    assert got[(base + pd.Timedelta(minutes=60)).to_pydatetime()] == 2  # burst 2
