"""Scale-path twins must equal the broadcast-dict registry paths, and must
not collect registries to the driver (VERDICT round 1, "What's wrong" #3):

* fit_edges_df + quantize_with_edges/dequantize_with_edges (Catalyst join)
  == fit_edges dict + make_quantize_udf/make_dequantize_udf (Arrow UDF)
* tpe_encode_with_models/tpe_decode_with_models (cogroup vs the models TABLE)
  == tpe_encode/tpe_decode (collected {series: model} registry broadcast)
* tpe_roundtrip_tokens (fused one-exchange train→encode→decode) reproduces
  the input stream exactly (decode∘encode = id)
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.functions.quantize import (
    dequantize_with_edges,
    fit_edges,
    fit_edges_df,
    make_dequantize_udf,
    make_quantize_udf,
    quantize_with_edges,
)


def _events(spark, n_users=7, n=400, seed=11):
    rng = np.random.RandomState(seed)
    rows = [
        (int(i), str(i % n_users), float(rng.standard_normal() * (1 + i % n_users)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "event_id long, uid string, value double")


@pytest.mark.parametrize("kind", ["equal_width", "adaptive"])
def test_fit_edges_df_matches_dict(spark, kind):
    ev = _events(spark)
    dict_edges = fit_edges(ev, "uid", "value", 16, kind=kind)
    df_edges = {
        r["series_id"]: np.asarray(r["edges"])
        for r in fit_edges_df(ev, "uid", "value", 16, kind=kind).collect()
    }
    assert set(dict_edges) == set(df_edges)
    for k in dict_edges:
        # equal_width must be bit-identical (same linspace arithmetic);
        # adaptive runs the same numpy loop on both paths
        np.testing.assert_array_equal(dict_edges[k], df_edges[k])


def test_quantize_join_path_equals_udf_path(spark):
    ev = _events(spark)
    n_bins = 16
    dict_edges = fit_edges(ev, "uid", "value", n_bins)
    q = make_quantize_udf(spark, dict_edges)
    dq = make_dequantize_udf(spark, dict_edges)
    udf_out = {
        r["event_id"]: (r["token"], r["recon"])
        for r in ev.withColumn("token", q("uid", "value"))
        .withColumn("recon", dq("uid", "token"))
        .collect()
    }

    edges_df = fit_edges_df(ev, "uid", "value", n_bins)
    joined = dequantize_with_edges(
        quantize_with_edges(ev, edges_df, "uid", "value"), edges_df, "uid", "token"
    )
    join_out = {
        r["event_id"]: (r["token"], r["recon"]) for r in joined.collect()
    }
    assert udf_out == join_out


def test_quantize_join_path_has_no_python_in_plan(spark):
    """The Catalyst path must stay JVM-side: no Arrow/Python eval nodes and
    no per-series driver collect feeding a broadcast variable."""
    ev = _events(spark)
    edges_df = fit_edges_df(ev, "uid", "value", 16)
    plan = (
        quantize_with_edges(ev, edges_df, "uid", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dequantize_join_extrapolation_branches(spark):
    """Out-of-range tokens follow the reference extrapolation rules
    (utils/discretisize.py:246-279): s==0 → below-lo half-bin, s>=len(edges)
    → above-hi half-bin."""
    ev = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 10.0)], "event_id long, uid string, value double"
    )
    edges_df = fit_edges_df(ev, "uid", "value", 5)  # edges 0,2.5,5,7.5,10
    toks = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 5), (3, "a", 2)], "event_id long, uid string, token int"
    )
    out = {
        r["event_id"]: r["recon"]
        for r in dequantize_with_edges(toks, edges_df, "uid", "token").collect()
    }
    assert out[1] == pytest.approx(-1.25)  # 0 - 2.5/2
    assert out[2] == pytest.approx(11.25)  # 10 + 2.5/2
    assert out[3] == pytest.approx(3.75)  # center of [2.5, 5]


def test_tpe_models_table_paths_equal_registry_paths(spark):
    from timeseriestokenizer_spark.operators.tpe import (
        models_to_registry,
        tpe_decode,
        tpe_decode_with_models,
        tpe_encode,
        tpe_encode_with_models,
        tpe_train,
    )

    rng = np.random.RandomState(3)
    rows = [
        (str(u), int(p), int(rng.randint(1, 9)))
        for u in range(5)
        for p in range(120)
    ]
    tok = spark.createDataFrame(rows, "uid string, pos long, token int")
    models = tpe_train(tok, "uid", "token", "pos", 20, 8).cache()
    reg = models_to_registry(models)

    enc_dict = {
        r["series_id"]: list(r["tokens"])
        for r in tpe_encode(spark, tok, "uid", "token", "pos", registry=reg).collect()
    }
    enc_tbl_df = tpe_encode_with_models(tok, models, "uid", "token", "pos")
    enc_tbl = {r["series_id"]: list(r["tokens"]) for r in enc_tbl_df.collect()}
    assert enc_dict == enc_tbl

    dec_dict = {
        r["series_id"]: list(r["tokens"])
        for r in tpe_decode(spark, enc_tbl_df, registry=reg).collect()
    }
    dec_tbl = {
        r["series_id"]: list(r["tokens"])
        for r in tpe_decode_with_models(enc_tbl_df, models).collect()
    }
    assert dec_dict == dec_tbl
    # and decode∘encode = identity against the original streams
    orig = {
        r["uid"]: [x["token"] for x in sorted(r["seq"], key=lambda s: s["pos"])]
        for r in tok.groupBy("uid")
        .agg(F.collect_list(F.struct("pos", "token")).alias("seq"))
        .collect()
    }
    assert dec_tbl == {k: v for k, v in orig.items()}


def test_tpe_models_table_missing_series_raises(spark):
    from timeseriestokenizer_spark.operators.tpe import (
        tpe_encode_with_models,
        tpe_train,
    )

    tok = spark.createDataFrame(
        [("a", i, 1 + i % 3) for i in range(30)], "uid string, pos long, token int"
    )
    models = tpe_train(
        tok.filter(F.col("uid") != "a"), "uid", "token", "pos", 10, 4
    )
    with pytest.raises(Exception, match="no trained TPE model"):
        tpe_encode_with_models(tok, models, "uid", "token", "pos").collect()


def test_tpe_roundtrip_tokens_identity(spark):
    from timeseriestokenizer_spark.operators.tpe import tpe_roundtrip_tokens

    rng = np.random.RandomState(7)
    rows = [
        (str(u), int(100 + p * 3), int(rng.randint(1, 6)))
        for u in range(4)
        for p in range(200)
    ]
    tok = spark.createDataFrame(rows, "uid string, pos long, token int")
    rt = tpe_roundtrip_tokens(tok, "uid", "token", "pos", 15, 5)
    got = {(r["series_id"], r["pos"]): r["token"] for r in rt.collect()}
    want = {(u, p): t for u, p, t in rows}
    assert got == want


def test_exact_dedup_verified_matches_md5_path(spark):
    from timeseriestokenizer_spark.operators.dedup import (
        exact_dedup,
        exact_dedup_verified,
    )

    docs = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "cc"), (5, "bb"), (6, "aa")],
        "doc_id long, text string",
    )
    a = {(r["keeper_doc_id"], r["n_copies"]) for r in exact_dedup(docs, "doc_id").collect()}
    b = {(r["keeper_doc_id"], r["n_copies"]) for r in exact_dedup_verified(docs, "doc_id").collect()}
    assert a == b == {(1, 3), (2, 2), (4, 1)}


def test_quantile_edges_approx_vs_exact(spark):
    """fit_edges(kind='quantile') uses percentile_approx (the only form that
    distributes at scale); document its delta against exact interpolated
    percentiles: approx returns actual data values, so each edge is within
    one inter-point gap of the exact quantile."""
    import numpy as np
    from pyspark.sql import functions as F

    from timeseriestokenizer_spark.functions.quantize import fit_edges

    rng = np.random.RandomState(2)
    vals = rng.standard_normal(4000)
    df = spark.createDataFrame(
        [("a", float(v)) for v in vals], "uid string, value double"
    )
    approx = fit_edges(df, "uid", "value", 8, kind="quantile")["a"]
    exact = np.quantile(vals, np.linspace(0, 1, 9))
    # max adjacent gap bounds the approx-vs-exact error for order-statistic
    # approximations at this accuracy
    gap = np.diff(np.sort(vals)).max()
    assert np.all(np.abs(approx - exact) <= gap + 1e-12)


def test_scale_join_path_equals_udf_path_and_plan(spark):
    """The collect-free scale/inverse join path (scale_expr +
    inverse_scale_expr) must equal the broadcast-dict UDF path bit-for-bit
    on every row, compile to BroadcastHashJoin with ZERO Python stages at
    the default, and degrade to a shuffle join (still no driver collect)
    with broadcast=False for registry-as-data cardinalities."""
    import numpy as np
    from pyspark.sql import functions as F

    from timeseriestokenizer_spark.functions.scaling import (
        fit_scalers,
        inverse_scale_expr,
        make_scale_udf,
        scale_expr,
        scalers_to_registry,
    )

    rng = np.random.RandomState(23)
    rows = [
        (f"u{i % 7}", float(v), i)
        for i, v in enumerate(rng.uniform(-50, 50, 500))
    ]
    rows.append(("const", 4.0, 500))  # std=0 -> 1.0 branch
    rows.append(("const", 4.0, 501))
    df = spark.createDataFrame(rows, "uid string, value double, rid long")
    scalers = fit_scalers(df, "uid", "value")

    reg = scalers_to_registry(scalers)
    sc, inv = make_scale_udf(spark, reg), make_scale_udf(spark, reg, inverse=True)
    udf_out = {
        r["rid"]: (r["z"], r["recon"])
        for r in df.withColumn("z", sc("uid", "value"))
        .withColumn("recon", inv("uid", "z"))
        .collect()
    }
    join_df = inverse_scale_expr(
        scale_expr(df, scalers, "uid", "value", out_col="z"),
        scalers, "uid", "z", out_col="recon",
    )
    join_out = {r["rid"]: (r["z"], r["recon"]) for r in join_df.collect()}
    assert join_out == udf_out  # same IEEE ops -> bit-identical

    plan = join_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for py_stage in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas"):
        assert py_stage not in plan, py_stage

    shuffled = inverse_scale_expr(
        scale_expr(df, scalers, "uid", "value", out_col="z", broadcast=False),
        scalers, "uid", "z", out_col="recon", broadcast=False,
    )
    assert {r["rid"]: (r["z"], r["recon"]) for r in shuffled.collect()} == udf_out
