"""Custom stateful streaming operator: per-series LOCF gap-fill with
arbitrary state (applyInPandasWithState) — the streaming twin of the batch
gap_fill (operators/gapfill.py, SURVEY §2.6 W2/F12).

Windowed aggregation cannot express LOCF (a pad slot's value depends on the
last OBSERVED value, arbitrarily far back), so this is the survey-sanctioned
escape hatch: GroupState carries (last_slot_us, last_value) per series
across micro-batches and query restarts (checkpointed by the state store).
Each incoming point emits the pad slots between the previously seen slot and
its own, carrying the last value forward, then itself.

State is two scalars per series — bounded regardless of gap length (the
pads are EMITTED, never stored). In-batch and cross-batch gaps produce
identical output; ordering within a batch is by event time (the caller is
responsible for per-series event-time order across batches, e.g. a log
stream — classic for transcript turn streams). In-slot semantics: the FIRST
value of a slot is emitted (append sinks cannot retract), while the LAST
value carries forward into pads — the batch gap_fill keeps the last per
slot; with ≤1 event per slot the two are identical (tested)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

LOCF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType()),
        T.StructField("slot_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("is_pad", T.BooleanType()),
    ]
)

# STATE SCHEMA v2 (round-4: grew from 2 to 3 fields). Spark's state-store
# schema validation REJECTS restarting a checkpoint written with the v1
# 2-field schema against this 3-field schema — upgrading a live stream
# therefore requires a FRESH checkpoint directory (drain the old stream,
# start the new one with a new checkpointLocation; the first micro-batch
# rebuilds carry-forward state from the stream head). The in-UDF
# `len(st) > 2` probe below is defensive only — it cannot paper over a
# checkpoint upgrade, because Spark refuses the restart before the UDF
# ever runs.
LOCF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_slot_us", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
        # event time of the observation behind last_value — guards against a
        # same-slot event from a LATER micro-batch with an OLDER timestamp
        # regressing last_value (the cross-batch twin of the older-slot drop)
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def stream_locf_fill(
    stream_df: DataFrame,
    key: str,
    ts_col: str,
    val_col: str,
    slot_seconds: int = 3600,
) -> DataFrame:
    """Streaming LOCF over ``slot_seconds`` slots. Input: a streaming frame
    with (key, ts, value); output: (series_id, slot_ts, value, is_pad) where
    pad slots carry the last observed value forward — including across
    micro-batch and restart boundaries (GroupState)."""
    slot_us = int(slot_seconds) * 1_000_000

    def _fill(key_tuple, pdfs, state):
        (sid,) = key_tuple
        if state.exists:
            st = state.get
            last_slot, last_val = st[0], st[1]
            last_ts = st[2] if len(st) > 2 else None
        else:
            last_slot, last_val, last_ts = None, None, None
        out_slots: list[int] = []
        out_vals: list[float] = []
        out_pads: list[bool] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_us", kind="stable")
            for ts_us, v in zip(pdf["ts_us"], pdf["val"]):
                ts_us = int(ts_us)
                slot = (ts_us // slot_us) * slot_us
                if last_slot is not None and slot < last_slot:
                    # LATE arrival (older than the stream head): an append
                    # sink cannot retract the already-emitted slot, and the
                    # carried value must NEVER regress to a stale older
                    # observation — drop the event entirely (it previously
                    # still overwrote last_value, silently corrupting every
                    # subsequent pad).
                    continue
                if (
                    last_slot is not None
                    and slot == last_slot
                    and last_ts is not None
                    and ts_us <= last_ts
                ):
                    # same-slot event that is not NEWER than the observation
                    # already carried (an out-of-order arrival from a prior
                    # micro-batch, or a redelivery): updating last_value here
                    # would regress every subsequent pad to the staler value.
                    continue
                if last_slot is not None:
                    for s in range(last_slot + slot_us, slot, slot_us):
                        out_slots.append(s)
                        out_vals.append(last_val)
                        out_pads.append(True)
                if last_slot is None or slot > last_slot:
                    out_slots.append(slot)
                    out_vals.append(float(v))
                    out_pads.append(False)
                    last_slot = slot
                last_val = float(v)
                last_ts = ts_us
        state.update((last_slot, last_val, last_ts))
        if out_slots:
            yield pd.DataFrame(
                {
                    "series_id": sid,
                    "slot_ts": pd.to_datetime(out_slots, unit="us"),
                    "value": out_vals,
                    "is_pad": out_pads,
                }
            )

    prepared = stream_df.select(
        F.col(key).cast("string").alias("series_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(val_col).cast("double").alias("val"),
    )
    return prepared.groupBy("series_id").applyInPandasWithState(
        _fill,
        LOCF_OUTPUT_SCHEMA,
        LOCF_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stateful_locf(
    spark,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    out_dir: str,
    key: str,
    ts_col: str,
    val_col: str,
    slot_seconds: int = 3600,
):
    """availableNow pass of the stateful LOCF over a parquet directory;
    state persists in the checkpoint, so successive passes over appended
    batches continue exactly where the previous one stopped."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    filled = stream_locf_fill(stream, key, ts_col, val_col, slot_seconds)
    q = (
        filled.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
