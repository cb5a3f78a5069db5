"""Comparison-table report: the Spark twin of the reference's 4th entry point
(generate_comparison_tables.py:198-366).

Reference semantics: a fixed experiment grid (22 configs,
generate_comparison_tables.py:31-66) is crossed with (dataset, model, metric,
eval_type); for every cell the FIRST run folder matching the config is looked
up and one metric value extracted; rows = configs, columns = the dataset's
target columns; 60 CSV tables out.

Spark shape: the runs live in a TABLE (one row per run × target_column ×
metric × eval_type — the manifest/metrics rows a pipeline writes as it goes)
instead of thousands of tiny folder CSVs. The grid is a dimension-sized
DataFrame, so the lookup is a broadcast left join; "first matching folder"
becomes a deterministic row_number()=1 over folder_name (the reference's
iteration order is directory order — we pin it instead of inheriting it);
the 60-table fan-out is ONE distributed groupBy().pivot() job whose output,
written partitioned by (dataset, model, metric, eval_type), is exactly the
60-file grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

# the reference's 22-row experiment grid (generate_comparison_tables.py:31-66)
EXPERIMENT_CONFIGS = [
    {"bpe": bpe, "temporal": temporal, "n_samples": n, "vocab": vocab,
     "name": f"{label}_N{n}"}
    for label, bpe, temporal, vocab in [
        ("BPE_12h", "bpe", "12h", 600),
        ("BPE_24h", "bpe", "24h", 600),
        ("BPE_NoTemp", "bpe", "sem_ebos", 600),
        ("NoBPE_12h", "none", "12h", None),
        ("NoBPE_24h", "none", "24h", None),
        ("NoBPE_NoTemp", "none", "sem_ebos", None),
        ("Chronos", "chronos", None, 600),
    ]
    for n in [100, 200, 50]
] + [{"bpe": None, "temporal": None, "n_samples": None, "vocab": None,
      "name": "Baseline_NoToken"}]

MODELS = ["Transformer", "Informer", "Autoformer"]
METRICS = ["MAE", "MSE", "RMSE", "MAPE", "MSPE"]
EVAL_TYPES = ["metrics", "detokenized"]


def experiment_grid(spark: SparkSession) -> DataFrame:
    """The 22-config grid as a (tiny, broadcastable) DataFrame."""
    return spark.createDataFrame(
        [
            (c["name"], c["bpe"], c["temporal"], c["n_samples"], c["vocab"])
            for c in EXPERIMENT_CONFIGS
        ],
        "experiment string, bpe string, temporal string, n_samples int, vocab int",
    )


def first_match_lookup(
    runs: DataFrame,
    grid: DataFrame,
    match_cols: list[str],
    cell_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Grid × runs lookup with outer-grid semantics, broadcast-shaped.

    A LEFT join preserving the grid cannot broadcast the grid (Spark cannot
    broadcast the preserved side), so it is decomposed into two joins that
    both broadcast a dimension-sized table:
    * INNER join runs ⋈ broadcast(grid), first match per (grid row ×
      cell_cols) by ``order_col`` (generate_comparison_tables.py:236 "Use
      first matching folder", made deterministic);
    * grid rows with NO run at all re-enter via a left-anti join against the
      (distinct, tiny, broadcast) covered key set, with NULL cells — the
      reference's NaN fill."""
    j = runs.join(F.broadcast(grid), on=match_cols, how="inner")
    w = W.partitionBy(*match_cols, *cell_cols).orderBy(F.col(order_col).asc_nulls_last())
    first = (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed(value_col, "value")
    )
    covered = runs.select(*match_cols).distinct()
    missing = grid.join(F.broadcast(covered), on=match_cols, how="left_anti")
    for c in first.columns:
        if c not in missing.columns:
            missing = missing.withColumn(
                c, F.lit(None).cast(first.schema[c].dataType)
            )
    return first.unionByName(missing.select(*first.columns))


def comparison_long(
    runs: DataFrame,
    grid: DataFrame,
    config_col: str = "experiment",
    dataset_col: str = "dataset",
    model_col: str = "model",
    metric_col: str = "metric",
    eval_col: str = "eval_type",
    column_col: str = "target_column",
    order_col: str = "folder_name",
    value_col: str = "metric_value",
) -> DataFrame:
    """All 60 tables' cells as ONE long DataFrame:
    (dataset, model, metric, eval_type, experiment, target_column, value)."""
    return first_match_lookup(
        runs,
        grid,
        match_cols=[config_col],
        cell_cols=[dataset_col, model_col, metric_col, eval_col, column_col],
        order_col=order_col,
        value_col=value_col,
    ).select(
        dataset_col, model_col, metric_col, eval_col, config_col, column_col, "value"
    )


def comparison_tables(long_df: DataFrame, grid: DataFrame, columns: list[str]) -> DataFrame:
    """Pivot the long cell frame to the reference's table shape: one row per
    (dataset, model, metric, eval_type, experiment), one column per target
    column. ``columns`` pins the pivot values (no extra distinct pass, stable
    column order).

    Every table carries ALL grid experiments — a config with no run at all
    appears as an all-NaN row in each table (generate_comparison_tables.py
    initializes the row then fills what it finds), via a skeleton
    (table coords × grid experiments, both dimension-sized) left-joined to
    the pivoted cells (broadcast — the pivot output is grid-sized)."""
    cells = long_df.filter(F.col("dataset").isNotNull())
    pivoted = (
        cells.groupBy("dataset", "model", "metric", "eval_type", "experiment")
        .pivot("target_column", columns)
        .agg(F.first("value"))
    )
    coords = cells.select("dataset", "model", "metric", "eval_type").distinct()
    skeleton = coords.crossJoin(F.broadcast(grid.select("experiment")))
    return skeleton.join(
        F.broadcast(pivoted),
        ["dataset", "model", "metric", "eval_type", "experiment"],
        "left",
    )


def write_comparison_tables(tables: DataFrame, out_dir: str) -> None:
    """Write the 60-table grid: partitioned by (dataset, model, metric,
    eval_type) — each partition directory is one reference CSV table."""
    (
        tables.repartition("dataset", "model", "metric", "eval_type")
        .write.mode("overwrite")
        .partitionBy("dataset", "model", "metric", "eval_type")
        .parquet(out_dir)
    )
