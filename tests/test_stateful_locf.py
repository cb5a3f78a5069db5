"""Stateful streaming LOCF (applyInPandasWithState): pad slots carry the
last observed value across micro-batch AND query-restart boundaries."""

import pandas as pd
import pyspark.sql.types as T

from timeseriestokenizer_spark.streaming.stateful_locf import run_stateful_locf

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, src, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf, schema=SCHEMA).write.mode("append").parquet(src)


def test_locf_state_survives_across_passes(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    # pass 1: hours 00 and 01 observed
    _write(spark, src, [
        ("c", "2026-01-01 00:10:00", 1.0),
        ("c", "2026-01-01 01:20:00", 2.0),
    ])
    out1 = run_stateful_locf(
        spark, src, SCHEMA, ckpt, sink, "conv_id", "ts", "value", 3600
    ).toPandas().sort_values("slot_ts")
    assert len(out1) == 2 and not out1["is_pad"].any()

    # pass 2 (new query over the same checkpoint): next point at hour 04 —
    # hours 02 and 03 must be emitted as pads carrying 2.0 from PASS 1 state
    _write(spark, src, [("c", "2026-01-01 04:05:00", 5.0)])
    out2 = (
        run_stateful_locf(
            spark, src, SCHEMA, ckpt, sink, "conv_id", "ts", "value", 3600
        )
        .toPandas()
        .sort_values("slot_ts")
        .reset_index(drop=True)
    )
    assert len(out2) == 5
    pads = out2[out2["is_pad"]]
    assert list(pads["slot_ts"]) == [
        pd.Timestamp("2026-01-01 02:00:00"),
        pd.Timestamp("2026-01-01 03:00:00"),
    ]
    assert (pads["value"] == 2.0).all()
    assert out2.iloc[-1]["value"] == 5.0 and not out2.iloc[-1]["is_pad"]


def test_locf_matches_batch_gapfill_single_pass(spark, tmp_path):
    """One event per hour slot → stateful streaming output == batch gap_fill
    (same slots, same LOCF values, same pad flags)."""
    from pyspark.sql import functions as F

    from timeseriestokenizer_spark.operators.gapfill import gap_fill

    rows = [
        ("a", "2026-02-01 00:05:00", 10.0),
        ("a", "2026-02-01 03:05:00", 13.0),
        ("b", "2026-02-01 01:05:00", 7.0),
        ("b", "2026-02-01 02:35:00", 8.0),
    ]
    src = str(tmp_path / "src2")
    _write(spark, src, rows)
    got = (
        run_stateful_locf(
            spark, src, SCHEMA, str(tmp_path / "ck2"), str(tmp_path / "sk2"),
            "conv_id", "ts", "value", 3600,
        )
        .toPandas()
        .sort_values(["series_id", "slot_ts"])
        .reset_index(drop=True)
    )
    batch = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "ts", "value"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        ),
        schema=SCHEMA,
    ).select(
        F.col("conv_id").alias("uid"),
        F.date_trunc("hour", "ts").alias("hts"),
        F.col("value").alias("v"),
    )
    exp = (
        gap_fill(batch, "uid", "hts", ["v"], 3600)
        .toPandas()
        .sort_values(["uid", "slot_ts"])
        .reset_index(drop=True)
    )
    assert list(got["slot_ts"]) == list(exp["slot_ts"])
    assert list(got["value"]) == list(exp["v"])
    assert list(got["is_pad"]) == list(exp["is_pad"])


def test_locf_late_event_cannot_regress_carried_value(spark, tmp_path):
    """An out-of-order arrival OLDER than the stream head must be dropped
    entirely: it previously skipped emission but still overwrote last_value,
    so later pads silently carried the stale older observation (ADVICE r2)."""
    src = str(tmp_path / "src3")
    ckpt = str(tmp_path / "ck3")
    sink = str(tmp_path / "sk3")

    # pass 1: head advances to hour 03 (value 3.0)
    _write(spark, src, [
        ("c", "2026-03-01 00:10:00", 1.0),
        ("c", "2026-03-01 03:10:00", 3.0),
    ])
    run_stateful_locf(spark, src, SCHEMA, ckpt, sink, "conv_id", "ts", "value", 3600)

    # pass 2: a LATE event at hour 01 (9.9), then a live one at hour 05 —
    # the hour-04 pad must carry 3.0 (the stream head), never 9.9
    _write(spark, src, [
        ("c", "2026-03-01 01:30:00", 9.9),
        ("c", "2026-03-01 05:10:00", 5.0),
    ])
    out = (
        run_stateful_locf(spark, src, SCHEMA, ckpt, sink, "conv_id", "ts", "value", 3600)
        .toPandas()
        .sort_values("slot_ts")
        .reset_index(drop=True)
    )
    assert 9.9 not in set(out["value"])
    pad4 = out[out["slot_ts"] == pd.Timestamp("2026-03-01 04:00:00")]
    assert len(pad4) == 1 and bool(pad4.iloc[0]["is_pad"]) and pad4.iloc[0]["value"] == 3.0


def test_locf_same_slot_stale_event_cannot_regress(spark, tmp_path):
    """An out-of-order arrival landing in the CURRENT head slot with a ts
    OLDER than the already-processed observation must not overwrite
    last_value — subsequent pads would regress to the staler value
    (ADVICE r3: the same-slot twin of the older-slot guard)."""
    src = str(tmp_path / "src4")
    ckpt = str(tmp_path / "ck4")
    sink = str(tmp_path / "sk4")

    # pass 1: head slot = hour 02, carried value 2.5 (observed at 02:40)
    _write(spark, src, [
        ("c", "2026-04-01 00:10:00", 1.0),
        ("c", "2026-04-01 02:40:00", 2.5),
    ])
    run_stateful_locf(spark, src, SCHEMA, ckpt, sink, "conv_id", "ts", "value", 3600)

    # pass 2: a stale SAME-SLOT event (02:05, value 9.9 — older than the
    # 02:40 observation) then a live one at hour 05 — pads for hours 03/04
    # must carry 2.5, never 9.9
    _write(spark, src, [
        ("c", "2026-04-01 02:05:00", 9.9),
        ("c", "2026-04-01 05:10:00", 5.0),
    ])
    out = (
        run_stateful_locf(spark, src, SCHEMA, ckpt, sink, "conv_id", "ts", "value", 3600)
        .toPandas()
        .sort_values("slot_ts")
        .reset_index(drop=True)
    )
    assert 9.9 not in set(out["value"])
    pads = out[out["is_pad"]]
    assert list(pads["slot_ts"]) == [
        pd.Timestamp("2026-04-01 01:00:00"),
        pd.Timestamp("2026-04-01 03:00:00"),
        pd.Timestamp("2026-04-01 04:00:00"),
    ]
    assert list(pads["value"]) == [1.0, 2.5, 2.5]

    # a same-slot event NEWER than the carried observation still updates
    # the carry (a genuine later reading inside the head slot)
    _write(spark, src, [
        ("c", "2026-04-01 05:50:00", 6.0),
        ("c", "2026-04-01 07:10:00", 7.0),
    ])
    out2 = (
        run_stateful_locf(spark, src, SCHEMA, ckpt, sink, "conv_id", "ts", "value", 3600)
        .toPandas()
        .sort_values("slot_ts")
        .reset_index(drop=True)
    )
    pad6 = out2[out2["slot_ts"] == pd.Timestamp("2026-04-01 06:00:00")]
    assert len(pad6) == 1 and pad6.iloc[0]["value"] == 6.0
