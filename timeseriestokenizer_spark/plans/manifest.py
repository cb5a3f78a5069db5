"""Checkpoint manifest: per-partition lineage + metrics, resumable rollups.

The reference's resumability is filesystem memoization — skip BPE training if
the .model file exists (transform_files_into_tokens.py:294-300), skip stages
if their output CSV exists (process_chronos_dataset.py:473-488). The engine
generalizes this to a manifest table: one row per (run, tier, partition) with
status/metrics, written ATOMICALLY with the data (each partition's output
lands under its own directory; the manifest row commits after the write), so
a rerun anti-joins done partitions and only computes the remainder
(BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Storage is a parquet directory append (one tiny file per partition commit) —
the same protocol targets an Iceberg table at cluster scale (Iceberg commits
give snapshot isolation; the parquet fallback relies on per-partition
subdirectories being self-contained).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_COLS = ["run_id", "tier", "part_key", "status", "n_rows", "metrics", "wall_s"]


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame | None:
    if not os.path.exists(manifest_path):
        return None
    try:
        return spark.read.parquet(manifest_path)
    except Exception:
        return None


def done_partitions(spark: SparkSession, manifest_path: str, run_id: str, tier: str) -> set[str]:
    m = read_manifest(spark, manifest_path)
    if m is None:
        return set()
    rows = (
        m.filter((F.col("run_id") == run_id) & (F.col("tier") == tier) & (F.col("status") == "done"))
        .select("part_key")
        .collect()
    )
    return {r["part_key"] for r in rows}


def commit_partition(
    spark: SparkSession,
    manifest_path: str,
    run_id: str,
    tier: str,
    part_key: str,
    n_rows: int,
    metrics: dict | None = None,
    wall_s: float = 0.0,
) -> None:
    """Append one manifest row (called after the partition's data is on disk)."""
    pdf = pd.DataFrame(
        [
            {
                "run_id": run_id,
                "tier": tier,
                "part_key": part_key,
                "status": "done",
                "n_rows": n_rows,
                "metrics": json.dumps(metrics or {}),
                "wall_s": wall_s,
            }
        ]
    )
    spark.createDataFrame(pdf).write.mode("append").parquet(manifest_path)


def resumable_rollup(
    spark: SparkSession,
    signals: DataFrame,
    tier: str,
    out_path: str,
    manifest_path: str,
    run_id: str,
    part_col: str = "day",
    key: str = "conv_id",
) -> list[str]:
    """Run one tier's rollup partition-by-partition (partition = day), skipping
    partitions the manifest already marks done. Idempotent: killing mid-run
    and rerunning produces byte-identical output without double-counting
    (each day's output is a self-contained subdirectory, overwritten whole).

    Returns the list of part_keys computed this invocation.
    """
    from ..operators.rollup import rollup_tier

    # reuse a source partition column if present (days(ts) layout → the
    # filter below prunes at the scan); otherwise derive and cache so the
    # per-day loop doesn't rescan + re-derive signals 31 times
    cached = False
    if "day" in signals.columns:
        with_day = signals
    else:
        with_day = signals.withColumn("day", F.to_date("ts")).persist()
        cached = True
    days = [str(r["day"]) for r in with_day.select("day").distinct().orderBy("day").collect()]
    done = done_partitions(spark, manifest_path, run_id, tier)
    computed = []
    for day in days:
        if day in done:
            continue
        t0 = time.time()
        part = rollup_tier(with_day.filter(F.col("day") == day), tier, key=key)
        part_path = os.path.join(out_path, f"day={day}")
        part.write.mode("overwrite").parquet(part_path)
        n = spark.read.parquet(part_path).count()
        commit_partition(
            spark,
            manifest_path,
            run_id,
            tier,
            day,
            n,
            metrics={"n_buckets": n},
            wall_s=time.time() - t0,
        )
        computed.append(day)
    if cached:
        with_day.unpersist()
    return computed
