"""Comparison-table report (operators/report.py) against a small fixture
replicating the reference's shape: 22-config grid × 2 datasets × 3 models ×
5 metrics × 2 eval types → 60 tables (generate_comparison_tables.py:1-17),
first-matching-run lookup, NaN for missing cells."""

import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.operators.report import (
    EXPERIMENT_CONFIGS,
    METRICS,
    MODELS,
    comparison_long,
    comparison_tables,
    experiment_grid,
)

COLUMNS = ["HUFL", "HULL", "MUFL"]


@pytest.fixture(scope="module")
def runs(spark):
    rows = []
    for ci, cfg in enumerate(EXPERIMENT_CONFIGS):
        for di, ds in enumerate(["ETTh1", "weather"]):
            for mi, model in enumerate(MODELS):
                for ki, metric in enumerate(METRICS):
                    for ei, ev in enumerate(["metrics", "detokenized"]):
                        for xi, col in enumerate(COLUMNS):
                            # config 5 has NO runs anywhere (all-NaN rows);
                            # config 3 misses one column per table (NaN cell)
                            if ci == 5 or (ci == 3 and xi == 2):
                                continue
                            base = ci * 1000 + di * 100 + mi * 10 + ki + ei + xi
                            # two matching runs: folder 'a...' must win
                            rows.append(
                                (cfg["name"], ds, model, metric, ev, col,
                                 f"a_run{base}", float(base))
                            )
                            rows.append(
                                (cfg["name"], ds, model, metric, ev, col,
                                 f"b_run{base}", float(base) + 0.5)
                            )
    return spark.createDataFrame(
        rows,
        "experiment string, dataset string, model string, metric string, "
        "eval_type string, target_column string, folder_name string, "
        "metric_value double",
    )


def test_grid_has_reference_shape(spark):
    g = experiment_grid(spark)
    assert g.count() == 22
    names = {r["experiment"] for r in g.collect()}
    assert "BPE_12h_N100" in names and "Baseline_NoToken" in names
    assert "Chronos_N50" in names


def test_sixty_tables_with_first_match_and_nan(spark, runs):
    grid = experiment_grid(spark)
    long_df = comparison_long(runs, grid)
    tables = comparison_tables(long_df, grid, COLUMNS).cache()
    # 60 tables × 22 experiment rows each
    assert tables.select("dataset", "model", "metric", "eval_type").distinct().count() == 60
    assert tables.count() == 60 * 22
    one = tables.filter(
        (F.col("dataset") == "ETTh1") & (F.col("model") == "Transformer")
        & (F.col("metric") == "MAE") & (F.col("eval_type") == "metrics")
        & (F.col("experiment") == EXPERIMENT_CONFIGS[0]["name"])
    ).collect()[0]
    # first match by folder_name: the 'a_run…' value (integral), not +0.5
    assert one["HUFL"] == float(int(one["HUFL"]))
    # the skipped cell surfaces as NULL (reference NaN fill)
    missing = tables.filter(
        F.col("experiment") == EXPERIMENT_CONFIGS[3]["name"]
    ).select("MUFL").collect()
    assert all(r["MUFL"] is None for r in missing)
    # a config with NO runs anywhere still appears in every table, all-NaN
    ghost = tables.filter(F.col("experiment") == EXPERIMENT_CONFIGS[5]["name"])
    assert ghost.count() == 60
    assert ghost.filter(
        F.col("HUFL").isNotNull() | F.col("HULL").isNotNull() | F.col("MUFL").isNotNull()
    ).count() == 0
    tables.unpersist()


def test_lookup_is_broadcast_join(spark, runs):
    long_df = comparison_long(runs, experiment_grid(spark))
    plan = long_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
