"""Global running totals and training-shard packing.

The naive global cumulative sum — ``SUM(w) OVER (ORDER BY k)`` with no
PARTITION BY — compiles to a SINGLE-partition window: every row funnels
through one task, the definitional anti-pattern at 100 TB. The scalable
form here is the classic two-pass:

1. range-partition by the order column (so partition order == key order)
   and cache;
2. one tiny job: per-partition weight sums, cumulated into EXCLUSIVE
   per-partition offsets on the driver (#partitions rows, not #rows);
3. per-partition window cumsum + the broadcast offset literal.

Shard packing (assembling fixed-token-budget training shards from a
document corpus) is then one expression: shard_id = floor(exclusive_cumsum
/ shard_budget) — deterministic, reproducible, and joinable across reruns
because it depends only on (order key, weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def with_running_total(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Exclusive-prefix + inclusive running total of ``weight_col`` in global
    ``order_col`` order, without a single-partition window. Emits
    ``out_col`` (inclusive cumsum). The range-partitioned frame is cached:
    pass 2 and pass 3 must see the SAME partition boundaries (range
    boundaries come from sampling; caching pins them).

    Determinism requires a TOTAL order: with duplicate ``order_col`` values
    the within-partition tie order is arbitrary, so tied rows' inclusive
    cumsum (and shard assignment downstream) could differ across runs. Pass
    ``tie_cols`` to break ties, or use a unique ``order_col``.

    The intermediate cache is released by ``release_running_total_cache`` —
    call it after the consuming action so long multi-stage jobs don't
    accumulate full-corpus copies in executor storage."""
    order_cols = [order_col, *(tie_cols or [])]
    ranged = (
        df.repartitionByRange(
            *( [num_partitions] if num_partitions else [] ),
            *[F.col(c) for c in order_cols],
        )
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    part_sums = (
        ranged.groupBy("_pid").agg(F.sum(weight_col).alias("_s")).orderBy("_pid").collect()
    )
    offsets: dict[int, float] = {}
    acc = 0
    for r in part_sums:
        offsets[r["_pid"]] = acc
        acc += r["_s"] or 0
    if not offsets:  # empty input: no partitions reported
        return ranged.withColumn(out_col, F.lit(None).cast("double")).drop("_pid")
    off_expr = F.element_at(
        F.create_map(
            *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
        ),
        F.col("_pid"),
    )
    w = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = ranged.withColumn(
        out_col, F.sum(weight_col).over(w) + off_expr
    ).drop("_pid")
    out._graft_packing_cache = ranged  # handle for release_running_total_cache
    return out


def release_running_total_cache(df: DataFrame) -> None:
    """Unpersist the intermediate range-partitioned cache behind a frame
    returned by with_running_total / pack_shards. Call AFTER the consuming
    action (write/collect) — the result plan reads from this cache."""
    cached = getattr(df, "_graft_packing_cache", None)
    if cached is not None:
        cached.unpersist()


def pack_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    shard_budget: int,
    out_col: str = "shard_id",
    num_partitions: int | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each row to a fixed-budget shard by exclusive cumulative
    weight: shard_id = floor((cumsum - w) / budget). Documents fill shard 0
    until the budget is crossed, then shard 1, ... — the standard
    deterministic shard assembly for training corpora. Deterministic iff
    (order_col, tie_cols) is a total order (see with_running_total)."""
    with_total = with_running_total(
        df, order_col, weight_col, out_col="_incl",
        num_partitions=num_partitions, tie_cols=tie_cols,
    )
    out = with_total.withColumn(
        out_col,
        F.floor((F.col("_incl") - F.col(weight_col)) / F.lit(shard_budget)).cast(
            "long"
        ),
    ).drop("_incl")
    out._graft_packing_cache = getattr(with_total, "_graft_packing_cache", None)
    return out
