"""Deterministic hash sampling / splitting (functions/sampling.py):
stability under repartitioning, per-stratum rates, consistent-sampling
alignment, and the no-shuffle plan claim."""

import numpy as np
from pyspark.sql import functions as F

from timeseriestokenizer_spark.functions.sampling import (
    deterministic_sample,
    stratified_sample,
    with_hash_split,
)


def _events(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.concat(F.lit("lang"), (F.col("id") % 3).cast("string")).alias("lang"),
    )


def test_split_stable_under_repartition_and_rerun(spark):
    df = _events(spark)
    a = {r["event_id"]: r["split"] for r in with_hash_split(df, ["event_id"]).collect()}
    b = {
        r["event_id"]: r["split"]
        for r in with_hash_split(df.repartition(17), ["event_id"]).collect()
    }
    c = {r["event_id"]: r["split"] for r in with_hash_split(df, ["event_id"]).collect()}
    assert a == b == c
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.15 < frac < 0.25


def test_split_membership_never_changes_when_data_grows(spark):
    """Adding rows must not move any existing example across the split —
    THE leakage property (df.sample would reshuffle everything)."""
    small = {r["event_id"]: r["split"]
             for r in with_hash_split(_events(spark, 1000), ["event_id"]).collect()}
    big = {r["event_id"]: r["split"]
           for r in with_hash_split(_events(spark, 4000), ["event_id"]).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_deterministic_sample_rate_and_consistency(spark):
    df = _events(spark)
    got = deterministic_sample(df, ["event_id"], 0.3, seed=5)
    n = got.count()
    assert 0.25 * 4000 < n < 0.35 * 4000
    # consistent sampling: a second table sampled with the same keys+seed
    # selects the ALIGNED rows (joinability of independently sampled tables)
    other = df.withColumn("extra", F.col("event_id") * 2)
    got2 = deterministic_sample(other, ["event_id"], 0.3, seed=5)
    assert got.select("event_id").exceptAll(got2.select("event_id")).count() == 0
    assert got2.count() == n


def test_stratified_rates(spark):
    df = _events(spark, 9000)
    out = (
        stratified_sample(df, "lang", {"lang0": 1.0, "lang1": 0.2}, ["event_id"], seed=3)
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    assert out.get("lang2", 0) == 0  # default fraction 0 drops the stratum
    assert out["lang0"] == 3000  # fraction 1.0 keeps everything
    assert 0.15 * 3000 < out["lang1"] < 0.25 * 3000


def test_sampling_plan_is_scan_local(spark):
    """No shuffle: membership is a row-local expression."""
    plan = (
        deterministic_sample(_events(spark), ["event_id"], 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_oracle_parity_hash_bucket(spark):
    """The md5 bucket matches DuckDB's arithmetic exactly (the contract rows
    hash_split/stratified_sample rely on the same construct)."""
    import duckdb

    df = _events(spark, 500)
    got = {r["event_id"]: r["split"] for r in with_hash_split(df, ["event_id"]).collect()}
    con = duckdb.connect()
    thresh = int(0.2 * 16 ** 15)
    exp = dict(
        con.execute(
            f"""
            SELECT i, CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(i AS VARCHAR), ':', '42')), 1, 15)) AS BIGINT)
                           < {thresh} THEN 'test' ELSE 'train' END
            FROM range(500) t(i)
            """
        ).fetchall()
    )
    assert got == exp


def test_weighted_sample_topk_properties(spark):
    """Weighted sampling: deterministic across repartition, excludes
    non-positive weights, exact k, and heavier rows are sampled more often
    across seeds (statistical sanity on a 10x weight skew)."""
    from pyspark.sql import functions as F

    from timeseriestokenizer_spark.functions.sampling import weighted_sample_topk

    rows = [(i, 100 if i < 50 else 10) for i in range(500)] + [(999, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    a = sorted(
        r["doc_id"]
        for r in weighted_sample_topk(df, ["doc_id"], "w", 40).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_topk(df.repartition(13), ["doc_id"], "w", 40).collect()
    )
    assert a == b and len(a) == 40 and 999 not in a

    heavy_hits = 0
    for seed in range(5):
        got = {
            r["doc_id"]
            for r in weighted_sample_topk(df, ["doc_id"], "w", 40, seed=seed).collect()
        }
        heavy_hits += sum(1 for d in got if d < 50)
    # heavy rows are 10% of the population but 53% of total weight; across
    # 5 seeds they must dominate well beyond their population share
    assert heavy_hits / (5 * 40) > 0.3
