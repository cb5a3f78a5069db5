"""Streaming hysteresis alerting — the applyInPandasWithState twin of
operators/alerting.alert_state.

Alerting is intrinsically a streaming concern (you page ON the firing
point, not at end of day), and hysteresis state is exactly what
GroupState is for: (hi_run, alert_on, last_ts_us) per series — three
scalars, bounded forever, checkpointed across micro-batches and restarts.
The batch operator proves the semantics (its window formulation equals
the sequential machine, tests/test_alerting.py); this operator steps the
SAME machine per event, so a multi-batch stream over time-split files
reproduces the batch output row for row (reconcile-tested, the
stream/batch lambda doctrine of rollup_stream/stateful_locf).

Late/out-of-order handling (append sinks cannot retract an emitted state
row): an event at or before the state's last seen timestamp is DROPPED —
replaying it would regress hi_run/alert_on for every later point. This is
the stateful_locf doctrine applied to alert state; per-series in-order
delivery (a log stream) sees no drops.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

ALERT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("alert_on", T.IntegerType()),
        T.StructField("hi_run", T.IntegerType()),
    ]
)

ALERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hi_run", T.LongType()),
        T.StructField("alert_on", T.IntegerType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def stream_alert_state(
    stream_df: DataFrame,
    key: str,
    ts_col: str,
    val_col: str,
    hi: float = 120.0,
    lo: float = 60.0,
    n_consec: int = 2,
) -> DataFrame:
    """Per-event alert state over a stream: same fire-after-N /
    clear-below-lo machine as the batch operator, state carried across
    micro-batches."""
    if not hi > lo:
        raise ValueError(f"hysteresis needs hi > lo, got hi={hi} lo={lo}")
    hi_f, lo_f, n_c = float(hi), float(lo), int(n_consec)

    def _step(key_tuple, pdfs, state):
        (sid,) = key_tuple
        if state.exists:
            run, on, last_ts = state.get
            run = int(run)
        else:
            run, on, last_ts = 0, 0, None
        o_ts, o_v, o_on, o_run = [], [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_us", kind="stable")
            for ts_us, v in zip(pdf["ts_us"], pdf["val"]):
                ts_us = int(ts_us)
                if last_ts is not None and ts_us <= last_ts:
                    continue  # late or redelivered: state must not regress
                v = float(v)
                run = run + 1 if v >= hi_f else 0
                if on and v <= lo_f:
                    on = 0
                elif not on and run >= n_c:
                    on = 1
                last_ts = ts_us
                o_ts.append(ts_us)
                o_v.append(v)
                o_on.append(on)
                o_run.append(run)
        state.update((run, int(on), last_ts))
        if o_ts:
            yield pd.DataFrame(
                {
                    "series_id": sid,
                    "ts": pd.to_datetime(o_ts, unit="us"),
                    "value": o_v,
                    "alert_on": o_on,
                    "hi_run": o_run,
                }
            )

    prepared = stream_df.select(
        F.col(key).cast("string").alias("series_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(val_col).cast("double").alias("val"),
    )
    return prepared.groupBy("series_id").applyInPandasWithState(
        _step,
        ALERT_OUTPUT_SCHEMA,
        ALERT_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_alerts(
    spark,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    out_dir: str,
    key: str,
    ts_col: str,
    val_col: str,
    hi: float = 120.0,
    lo: float = 60.0,
    n_consec: int = 2,
):
    """availableNow pass over a parquet directory; hysteresis state
    persists in the checkpoint, so successive passes over appended files
    continue the machine exactly where the previous pass stopped."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    alerts = stream_alert_state(
        stream, key, ts_col, val_col, hi=hi, lo=lo, n_consec=n_consec
    )
    q = (
        alerts.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
