"""Plan-shape regression tests — the scale claims in BENCH/PLANS.md must not
silently regress."""

from pyspark.sql import functions as F

from timeseriestokenizer_spark.datagen import transcripts_df
from timeseriestokenizer_spark.functions.signals import signals_narrow
from timeseriestokenizer_spark.operators.rollup import rollup_cascade


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cascade_single_exchange(spark):
    """The whole 1m→5m→1h→1d cascade must reuse the window's conv_id
    partitioning: exactly ONE Exchange in the 1d plan."""
    t = transcripts_df(spark, C=5, seed=2)
    plan = _plan(rollup_cascade(signals_narrow(t))["1d"])
    assert plan.count("Exchange") == 1, plan


def test_scan_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1996-01-01")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_extendedprice" not in plan  # column pruning reached the scan


def test_broadcast_join_for_dims(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .count()
    )
    plan = _plan(j)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
