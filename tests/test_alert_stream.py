"""Streaming hysteresis alerting: multi-pass stream == batch alert_state,
state survives across passes, late events are dropped not regressed."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.alerting import alert_state
from timeseriestokenizer_spark.streaming.alert_stream import run_stream_alerts

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


def test_multi_pass_stream_matches_batch(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            F.col("user_id").cast("string").alias("user_id"), "ts", "value"
        )
        .orderBy("ts")
    )
    pdf = ev.toPandas()
    thirds = [
        pdf.iloc[: len(pdf) // 3],
        pdf.iloc[len(pdf) // 3 : 2 * len(pdf) // 3],
        pdf.iloc[2 * len(pdf) // 3 :],
    ]
    out = None
    for chunk in thirds:  # three availableNow passes over appended files
        _write(spark, src, list(chunk.itertuples(index=False, name=None)))
        out = run_stream_alerts(
            spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value"
        )
    got = {
        (r["series_id"], r["ts"]): (r["alert_on"], r["hi_run"])
        for r in out.collect()
    }
    want_df = alert_state(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    want = {
        (str(r["user_id"]), r["ts"]): (r["alert_on"], r["hi_run"])
        for r in want_df.collect()
    }
    assert got == want and len(got) == 1000


def test_state_survives_and_late_events_drop(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    # pass 1: one point of the 2-consecutive run above hi=120
    _write(spark, src, [("u", "2026-01-01 00:00:00", 150.0)])
    out1 = run_stream_alerts(spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value")
    assert [(r["alert_on"], r["hi_run"]) for r in out1.collect()] == [(0, 1)]

    # pass 2: the run completes ACROSS the batch boundary -> fires
    _write(spark, src, [("u", "2026-01-01 00:01:00", 130.0)])
    out2 = run_stream_alerts(spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value")
    rows = sorted(out2.collect(), key=lambda r: r["ts"])
    assert (rows[-1]["alert_on"], rows[-1]["hi_run"]) == (1, 2)

    # pass 3: a LATE event (older ts) must be dropped, not replayed
    _write(spark, src, [("u", "2025-12-31 23:59:00", 10.0)])
    out3 = run_stream_alerts(spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value")
    assert out3.count() == 2  # nothing new emitted

    # pass 4: clear below lo
    _write(spark, src, [("u", "2026-01-01 00:02:00", 50.0)])
    out4 = run_stream_alerts(spark, src, SCHEMA, ckpt, sink, "user_id", "ts", "value")
    rows = sorted(out4.collect(), key=lambda r: r["ts"])
    assert (rows[-1]["alert_on"], rows[-1]["hi_run"]) == (0, 0)
