"""Deterministic synthetic transcript tables (FIXTURES.md F1).

Shape per BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string nullable, ts timestamp)

Everything is derived from integer mixing (no Python ``hash``, no RNG state
ordering hazards) so the same (seed, C) always yields byte-identical tables —
the oracle and the engine consume identical inputs. Conversation lengths are
Zipf-skewed so a handful of hot conv_ids dominate (skew/salting tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_BASE_TS = np.datetime64("2026-01-01T00:00:00", "s").astype(np.int64)
_GAP_CHOICES = np.array([1, 5, 30, 120], dtype=np.int64)
_TOOLS = np.array(["search", "exec", "read"])


def _mix(a: np.ndarray, b: np.ndarray | int = 0) -> np.ndarray:
    """Deterministic 32-bit integer mix (splitmix-style)."""
    x = (a.astype(np.uint64) * np.uint64(1000003) + np.uint64(b) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    x = (x ^ (x >> np.uint64(16))) * np.uint64(2246822519) & np.uint64(0xFFFFFFFF)
    x = (x ^ (x >> np.uint64(13))) * np.uint64(3266489917) & np.uint64(0xFFFFFFFF)
    return (x ^ (x >> np.uint64(16))).astype(np.int64)


def _zipf_lengths(C: int, seed: int, lo: int = 2, hi: int = 5000) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return np.clip(rng.zipf(1.2, size=C), lo, hi).astype(np.int64)


def make_transcripts_pdf(
    C: int = 200,
    seed: int = 42,
    avg_len: int | None = None,
    hot_conv_share: float | None = None,
) -> pd.DataFrame:
    """Build the transcripts table as a pandas frame.

    avg_len: if given, lengths are ~uniform[avg_len/2, avg_len*3/2] instead of
        Zipf (bench variant ``transcripts_bench``).
    hot_conv_share: if given (e.g. 0.3), conversation 0 is inflated to hold
        that share of all turns (``transcripts_skewed``).
    """
    if avg_len is not None:
        rng = np.random.RandomState(seed)
        lens = rng.randint(max(2, avg_len // 2), avg_len * 3 // 2 + 1, size=C).astype(np.int64)
    else:
        lens = _zipf_lengths(C, seed)
    if hot_conv_share is not None:
        rest = int(lens[1:].sum())
        lens[0] = max(2, int(rest * hot_conv_share / (1 - hot_conv_share)))

    conv_index = np.repeat(np.arange(C, dtype=np.int64), lens)
    total = int(lens.sum())
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    turn_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)

    h = _mix(conv_index * np.int64(1_000_003) + turn_idx, seed)

    # roles: cycle user/assistant, ~10% tool rows
    is_tool = (h % 10) == 0
    role = np.where(is_tool, "tool", np.where(turn_idx % 2 == 0, "user", "assistant"))
    tool = np.where(is_tool, _TOOLS[h % 3], None)

    # timestamps: per-conv start + deterministic inter-turn gaps, strictly increasing
    conv_h = _mix(np.arange(C, dtype=np.int64), seed + 1)
    conv_start = _BASE_TS + (conv_h % (86400 * 30))
    gaps = _GAP_CHOICES[h % 4]
    first_row = turn_idx == 0
    gaps = np.where(first_row, 0, gaps)
    # 5% of conversations get one injected gap > 1 day at their middle turn
    inject = (conv_index % 20 == 0) & (turn_idx == np.repeat(lens // 2, lens)) & (~first_row)
    gaps = np.where(inject, 100_000, gaps)
    cs = np.cumsum(gaps)
    seg_base = cs[starts] - gaps[starts]
    elapsed = cs - np.repeat(seg_base, lens)
    ts = (np.repeat(conv_start, lens) + elapsed).astype("datetime64[s]").astype("datetime64[us]")

    conv_id = np.char.add("conv_", np.char.zfill(conv_index.astype(str), 6))
    reps = 1 + (h % 40)
    text = [
        f"turn {t} of {c} " * int(r)
        for t, c, r in zip(turn_idx.tolist(), conv_id.tolist(), reps.tolist())
    ]

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def transcripts_df(spark, C: int = 200, seed: int = 42, **kw):
    """Transcripts as a Spark DataFrame (Arrow-converted from the pandas build)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    return spark.createDataFrame(make_transcripts_pdf(C=C, seed=seed, **kw), schema=schema)


def write_transcripts(spark, path: str, C: int = 200, seed: int = 42, n_buckets: int = 8, **kw):
    """Write transcripts with the Iceberg-style layout ``days(ts)`` +
    ``bucket(conv_id, n)`` as partitioned parquet (SURVEY.md §1.3 — parquet
    fallback keeps the same pruning behavior; with an Iceberg catalog the same
    frame writes to a table with a ``days(ts), bucket(conv_id, n)`` spec)."""
    from pyspark.sql import functions as F

    df = transcripts_df(spark, C=C, seed=seed, **kw)
    (
        df.withColumn("day", F.to_date("ts"))
        .withColumn("bucket", F.pmod(F.crc32(F.col("conv_id")), F.lit(n_buckets)).cast("int"))
        .repartition("day", "bucket")
        .write.mode("overwrite")
        .partitionBy("day", "bucket")
        .parquet(path)
    )
    return path


def read_transcripts(spark, path: str):
    from pyspark.sql import functions as F

    return spark.read.parquet(path).drop("day", "bucket").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
