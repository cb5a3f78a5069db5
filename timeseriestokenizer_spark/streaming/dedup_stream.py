"""Streaming exact dedup for at-least-once ingest.

Replayed files and retried producers hand the hot tier the same turn twice;
batch exact_dedup (operators/dedup.py) cannot run on an unbounded stream,
and a bare ``dropDuplicates`` on a stream keeps every key it has ever seen
in the state store — unbounded state, the classic way a 100 TB ingest job
dies after a week. ``dropDuplicatesWithinWatermark`` bounds the state: a
key is remembered only until the event-time watermark passes it, which
matches the real failure mode (retries arrive seconds-to-minutes after the
original, not days).

Semantics: at-least-once in, exactly-once out for duplicates arriving
within the watermark; a duplicate arriving later than the watermark is
emitted again (the trade that keeps state finite — pick the watermark from
the producer's retry horizon). Downstream rollup tiers are keyed
aggregations, so a rare beyond-horizon duplicate perturbs one bucket, never
corrupts state.

The batch twin for reconciliation remains operators/dedup.exact_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    stream_df: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop duplicate ``keys`` rows arriving within ``watermark`` of the
    first occurrence; state per key ages out with the watermark."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_stream_dedup(
    spark,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    out_dir: str,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark: str = "10 minutes",
):
    """Bounded availableNow pass: parquet dir → watermarked dedup → parquet
    sink (append). Restarting from the same checkpoint resumes the key
    state, so a re-run after a crash stays exactly-once within the
    watermark."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = streaming_dedup(stream, keys=keys, watermark=watermark)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
