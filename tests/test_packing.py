"""Global running totals / shard packing (operators/packing.py): numpy
parity, partition-count invariance, and the no-single-partition-window plan
claim."""

import numpy as np
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.packing import (
    pack_shards,
    with_running_total,
)


def _docs(spark, n=5000, seed=3):
    rng = np.random.RandomState(seed)
    weights = rng.randint(50, 2000, n)
    return (
        spark.createDataFrame(
            [(int(i), int(w)) for i, w in enumerate(weights)],
            "doc_id long, n_chars long",
        ).repartition(16),  # scrambled input order
        weights,
    )


def test_running_total_matches_numpy(spark):
    df, weights = _docs(spark)
    out = (
        with_running_total(df, "doc_id", "n_chars")
        .orderBy("doc_id")
        .toPandas()
    )
    assert np.array_equal(out["running_total"].to_numpy(), np.cumsum(weights))


def test_running_total_partition_count_invariant(spark):
    df, weights = _docs(spark, n=2000)
    a = with_running_total(df, "doc_id", "n_chars", num_partitions=3).orderBy("doc_id").toPandas()
    b = with_running_total(df, "doc_id", "n_chars", num_partitions=17).orderBy("doc_id").toPandas()
    assert np.array_equal(a["running_total"].to_numpy(), b["running_total"].to_numpy())
    assert np.array_equal(a["running_total"].to_numpy(), np.cumsum(weights))


def test_pack_shards_budget_and_determinism(spark):
    df, weights = _docs(spark)
    out = pack_shards(df, "doc_id", "n_chars", 25_000).orderBy("doc_id").toPandas()
    excl = np.cumsum(weights) - weights
    assert np.array_equal(out["shard_id"].to_numpy(), excl // 25_000)
    # shard ids are contiguous from 0 and each shard's exclusive start is
    # within one document of the budget boundary
    sids = out["shard_id"].to_numpy()
    assert sids[0] == 0 and np.all(np.diff(sids) >= 0) and np.all(np.diff(sids) <= 1)


def test_packing_plan_has_no_single_partition_window(spark):
    df, _ = _docs(spark, n=500)
    plan = (
        pack_shards(df, "doc_id", "n_chars", 25_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_pack_shards_tie_break_columns(spark):
    """With duplicate order-key values, tie_cols restores a total order so
    shard assignment is deterministic and matches the numpy oracle computed
    in (order_col, tie) order (ADVICE r3)."""
    rows = [(i // 4, i, 100) for i in range(2000)]  # 4-way ties on the key
    df = spark.createDataFrame(
        rows, "grp long, doc_id long, n_chars long"
    ).repartition(16)
    out = (
        pack_shards(df, "grp", "n_chars", 350, tie_cols=["doc_id"])
        .orderBy("grp", "doc_id")
        .toPandas()
    )
    w = np.full(2000, 100, dtype=np.int64)
    expect = (np.cumsum(w) - w) // 350
    assert list(out["shard_id"]) == list(expect)


def test_release_running_total_cache(spark):
    from timeseriestokenizer_spark.operators.packing import (
        release_running_total_cache,
    )

    df, _ = _docs(spark, n=500)
    out = pack_shards(df, "doc_id", "n_chars", 1000)
    n_before = out.count()
    cached = out._graft_packing_cache
    assert cached.storageLevel.useMemory
    release_running_total_cache(out)
    assert not cached.storageLevel.useMemory
    assert out.count() == n_before  # plan still valid after release


def test_grouped_running_total_matches_window(spark):
    """Two-pass grouped cumsum == the plain per-group window, and no
    single-partition exchange in the plan."""
    import random

    from pyspark.sql import Window as W

    from timeseriestokenizer_spark.operators.packing import (
        release_running_total_cache,
        with_grouped_running_total,
    )

    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(4)}", i, rng.randrange(1, 100)) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, o long, w long")
    got = with_grouped_running_total(df, "g", "o", "w", out_col="ct",
                                     num_partitions=13)
    want = df.withColumn(
        "ct_ref",
        F.sum("w").over(
            W.partitionBy("g").orderBy("o")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    mism = (
        got.join(want.select("g", "o", "ct_ref"), ["g", "o"])
        .filter(F.col("ct") != F.col("ct_ref"))
        .count()
    )
    assert mism == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    release_running_total_cache(got)


def test_grouped_running_total_empty(spark):
    from timeseriestokenizer_spark.operators.packing import (
        with_grouped_running_total,
    )

    df = spark.createDataFrame([], "g string, o long, w long")
    assert with_grouped_running_total(df, "g", "o", "w").count() == 0


def test_running_total_survives_cache_eviction(spark):
    """Recompute-stability (round-5 VERDICT "What's wrong" #2): evicting the
    pass-1 cache AFTER the offsets were collected must not change the
    result — bucket boundaries are driver literals, not a fresh reservoir
    sample, so pass-3 recomputation reproduces the exact pids the offsets
    were computed for."""
    df, weights = _docs(spark, n=4000, seed=9)
    out = with_running_total(df, "doc_id", "n_chars", num_partitions=7)
    # evict the intermediate BEFORE the consuming action: pass 3 must
    # recompute pass 1 from scratch with the already-collected offsets
    out._graft_packing_cache.unpersist(blocking=True)
    got = out.orderBy("doc_id").toPandas()["running_total"].to_numpy()
    np.testing.assert_array_equal(got, np.cumsum(np.asarray(weights, dtype=np.int64)))


def test_global_ntile_survives_cache_eviction(spark):
    from timeseriestokenizer_spark.operators.packing import global_ntile

    df, _ = _docs(spark, n=1003, seed=5)
    out = global_ntile(df, ["n_chars", "doc_id"], 5, num_partitions=6)
    out._graft_packing_cache.unpersist(blocking=True)
    got = out.orderBy("n_chars", "doc_id").toPandas()["ntile"].to_numpy()
    # SQL NTILE semantics: first n mod k buckets get ceil(n/k) rows
    n, k = 1003, 5
    q, r = divmod(n, k)
    expect = np.repeat(np.arange(1, k + 1), [q + 1] * r + [q] * (k - r))
    np.testing.assert_array_equal(got, expect)
