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
    for extra in getattr(df, "_graft_packing_caches", []) or []:
        extra.unpersist()


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


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL-standard NTILE(k) over a GLOBAL order without the
    single-partition window ``ntile(k) OVER (ORDER BY ...)`` compiles
    to. Semantics are the standard: with n rows the first n mod k
    buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — bit-identical to any
    engine's ntile given the same total order, so ``order_cols`` MUST
    be a total order (append a unique id; ties would otherwise make
    bucket assignment run-dependent).

    Shape: the two-pass range-partition machinery of
    ``with_running_total`` with weight 1 yields the global 1-based rank
    in #partitions driver rows (never #rows); n is one scalar count on
    the same cached frame; the bucket index is then pure integer
    arithmetic. Release the cache with
    ``release_running_total_cache`` after the consuming action."""
    if k < 1:
        raise ValueError("k must be >= 1")
    staged = df.withColumn("_w1", F.lit(1).cast("long"))
    ranked = with_running_total(
        staged, order_cols[0], "_w1", out_col="_rk",
        num_partitions=num_partitions, tie_cols=list(order_cols[1:]),
    )
    cache = getattr(ranked, "_graft_packing_cache", None)
    n = cache.count() if cache is not None else 0
    q, r = divmod(n, k)
    head = r * (q + 1)  # rows living in the first r (larger) buckets
    i = F.col("_rk").cast("long")
    # `div` is exact BIGINT division — a double quotient's floor could
    # misround at extreme ranks (the x*x doctrine for integers)
    bucket = F.when(
        i <= F.lit(head),
        F.expr(f"(CAST(_rk AS BIGINT) - 1) div {q + 1}"),
    ).otherwise(
        F.expr(f"{r} + (CAST(_rk AS BIGINT) - 1 - {head}) div {max(q, 1)}")
    )
    out = ranked.withColumn(
        out_col, (bucket + F.lit(1)).cast("int")
    ).drop("_w1", "_rk")
    out._graft_packing_cache = cache
    return out


def with_grouped_running_total(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Per-GROUP inclusive running total of ``weight_col`` in ``order_col``
    order — the grouped twin of ``with_running_total``, for the case a
    plain ``SUM(w) OVER (PARTITION BY g ORDER BY o)`` window mishandles at
    scale: FEW, HEAVY groups. That window gives one task per group (20
    corpus sources over 100 TB = 20 tasks of 5 TB each); here the data
    range-partitions on (group, order) instead, so parallelism tracks the
    PARTITION count, not the group count. A group spans a contiguous run
    of partitions and each partition contributes one (pid, group) partial
    sum, cumulated into exclusive offsets on the driver (at most
    #partitions + #groups - 1 rows — small only while group cardinality
    is; for high-cardinality groups use the plain window, which is already
    parallel).

    Weights must be integral (LONG) so offsets stay exact; group values
    must be non-null. Same caching contract as with_running_total:
    release via ``release_running_total_cache`` after the consuming action.
    """
    order_cols = [group_col, order_col, *(tie_cols or [])]
    ranged = (
        df.repartitionByRange(
            *([num_partitions] if num_partitions else []),
            *[F.col(c) for c in order_cols],
        )
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    part_sums = (
        ranged.groupBy("_pid", group_col)
        .agg(F.sum(weight_col).alias("_s"))
        .orderBy(group_col, "_pid")
        .collect()
    )
    if not part_sums:  # empty input
        return ranged.withColumn(out_col, F.lit(None).cast("long")).drop("_pid")
    offsets: dict[tuple[int, object], int] = {}
    cur_group: object = object()
    acc = 0
    for r in part_sums:
        g = r[group_col]
        if g != cur_group:
            cur_group, acc = g, 0
        offsets[(r["_pid"], g)] = acc
        acc += r["_s"] or 0
    # (pid, group) -> exclusive offset, keyed portably as "pid group"
    off_expr = F.element_at(
        F.create_map(
            *[
                x
                for (pid, g), off in offsets.items()
                for x in (
                    F.concat_ws(" ", F.lit(str(pid)), F.lit(str(g))),
                    F.lit(off),
                )
            ]
        ),
        F.concat_ws(
            " ", F.col("_pid").cast("string"), F.col(group_col).cast("string")
        ),
    )
    w = (
        W.partitionBy("_pid", group_col)
        .orderBy(order_col, *(tie_cols or []))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = ranged.withColumn(out_col, F.sum(weight_col).over(w) + off_expr).drop("_pid")
    out._graft_packing_cache = ranged
    return out
