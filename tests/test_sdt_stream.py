"""Streaming swinging-door archive: multi-pass stream == batch keep-set
minus the pending last point, state survives passes, late events drop."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.downsample import swinging_door
from timeseriestokenizer_spark.streaming.sdt_stream import run_stream_sdt

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, src, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf, schema=SCHEMA).write.mode("append").parquet(src)


def test_stream_matches_batch_minus_pending_tail(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            "ts",
            "value",
            "event_id",
        )
        .orderBy("ts")
    )
    pdf = ev.toPandas()
    out = None
    for i in range(3):
        chunk = pdf.iloc[i * len(pdf) // 3 : (i + 1) * len(pdf) // 3]
        _write(
            spark, src,
            list(chunk[["user_id", "ts", "value"]].itertuples(index=False, name=None)),
        )
        out = run_stream_sdt(
            spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value", 15.0
        )
    got = {
        (r["series_id"], r["ts"]) for r in out.collect()
    }

    batch = swinging_door(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        comp_dev=15.0,
    )
    ev_k = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .join(batch, "event_id")
        .select(
            F.col("user_id").cast("string").alias("u"), "ts", "kept"
        )
    ).toPandas()
    # batch keep-set minus each series' final point (pending in the stream)
    want = set()
    for u, grp in ev_k.groupby("u"):
        grp = grp.sort_values("ts")
        last_ts = grp["ts"].iloc[-1]
        for _, r in grp[grp["kept"] == 1].iterrows():
            if r["ts"] != last_ts:
                want.add((u, r["ts"].to_pydatetime()))
    assert got == want and len(got) > 0


def test_state_survives_and_late_drops(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    # pass 1: a perfect line — only the first point archives
    rows1 = [("u", f"2026-01-01 00:{i:02d}:00", 10.0 + 2.0 * i) for i in range(10)]
    _write(spark, src, rows1)
    out1 = run_stream_sdt(spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value", 5.0)
    assert out1.count() == 1  # the anchor; the line never closes doors

    # pass 2: a level jump ACROSS the batch boundary closes the doors ->
    # the held point from PASS 1 state archives
    _write(spark, src, [("u", "2026-01-01 00:10:00", 200.0)])
    out2 = run_stream_sdt(spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value", 5.0)
    rows = sorted(out2.collect(), key=lambda r: r["ts"])
    assert len(rows) == 2
    assert str(rows[1]["ts"]) == "2026-01-01 00:09:00" and rows[1]["value"] == 28.0

    # pass 3: a late event must not emit or corrupt state
    _write(spark, src, [("u", "2025-12-31 23:00:00", 0.0)])
    out3 = run_stream_sdt(spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value", 5.0)
    assert out3.count() == 2
