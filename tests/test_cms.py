"""Count-min sketch tier: the one-sided guarantee, the exact small regime,
merge-vs-direct equality, and the JVM-only plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.cms import (
    cms_build,
    cms_merge,
    cms_point_estimate,
)


def _evk(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.withColumn("k", ((cents % 1000) + 1000) % 1000)


def test_never_underestimates_and_eps_bound(spark):
    evk = _evk(spark)
    n = evk.count()
    cells = cms_build(evk, "k")
    est = cms_point_estimate(cells, evk.select("k").distinct())
    true = evk.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    rows = est.join(true, "k").collect()
    assert all(r["est"] >= r["true_cnt"] for r in rows)
    # CMS bound: overestimate <= e/width * n with prob 1 - e^-depth per key;
    # assert the loose deterministic-ish envelope holds for the vast majority
    bad = sum(1 for r in rows if r["est"] - r["true_cnt"] > 2.718 / 256 * n)
    assert bad <= max(1, len(rows) // 50)


def test_exact_when_keys_fit_width(spark):
    # 5 event types, width 256: collisions are possible but md5 spreads 5
    # keys into distinct cells here — the small regime is exact
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cells = cms_build(ev, "event_type")
    est = cms_point_estimate(cells, ev.select("event_type").distinct(),
                             key_col="event_type")
    true = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("t"))
    rows = est.join(true, est.k == true.event_type).collect()
    assert len(rows) == 5
    assert all(r["est"] == r["t"] for r in rows)


def test_cascade_equals_direct(spark):
    evk = _evk(spark).withColumn(
        "day", F.date_trunc("day", F.col("ts").cast("timestamp"))
    )
    direct = cms_build(evk, "k")
    merged = cms_merge(cms_build(evk, "k", ["day"]), [])
    keys = evk.select("k").distinct()
    a = {r["k"]: r["est"] for r in cms_point_estimate(direct, keys).collect()}
    b = {r["k"]: r["est"] for r in cms_point_estimate(merged, keys).collect()}
    assert a == b


def test_sketch_is_bounded_and_jvm_only(spark):
    evk = _evk(spark)
    cells = cms_build(evk, "k")
    assert cells.count() <= 4 * 256
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "mapInPandas" not in plan, plan


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Bloom: every inserted key hits (no false negatives — structural);
    FP rate on non-members near the (1-e^{-kn/m})^k prediction; filter
    size bounded by m; JVM-only plan."""
    import math

    from timeseriestokenizer_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    evk = _evk(spark)
    members = evk.filter("k < 500").select("k").distinct()
    non_members = evk.filter("k >= 500").select("k").distinct()
    bloom = bloom_build(members, "k")
    n_bits = bloom.count()
    assert n_bits <= 8192

    m_hits = bloom_probe(members, bloom, "k").collect()
    assert all(r["bloom_hit"] == 1 for r in m_hits)

    nm = bloom_probe(non_members, bloom, "k").collect()
    fp = sum(r["bloom_hit"] for r in nm) / len(nm)
    n_mem = members.count()
    pred = (1 - math.exp(-3 * n_mem / 8192)) ** 3
    assert fp <= 3 * pred + 0.02, (fp, pred)

    plan = bloom_probe(non_members, bloom, "k")._jdf.queryExecution()
    ps = plan.executedPlan().toString()
    assert "Python" not in ps and "BroadcastHashJoin" in ps, ps


def test_count_bracket_contains_truth(spark):
    """count_bracket over real heavy_/cms_ tier state: mg_count <= true <=
    cms_est for every surfaced key, and gap == 0 certifies exactness."""
    from timeseriestokenizer_spark.operators.cms import (
        cms_rollup_tier,
        count_bracket,
    )
    from timeseriestokenizer_spark.operators.heavy import heavy_rollup_tier

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            F.col("ts"),
            F.col("user_id").cast("string").alias("conv_id"),
        )
    )
    mg = heavy_rollup_tier(ev, "1h", key_col="conv_id", k=8)
    cells = cms_rollup_tier(ev, "1h", key="conv_id")
    br = count_bracket(mg, cells).collect()
    truth = {
        (r["b"], r["conv_id"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("b"), "conv_id"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert br
    certified = 0
    for r in br:
        t = truth[(r["bucket_ts"], r["key"])]
        assert r["mg_count"] <= t <= r["cms_est"], (r, t)
        if r["gap"] == 0:
            certified += 1
            assert r["mg_count"] == t
    assert certified > 0
