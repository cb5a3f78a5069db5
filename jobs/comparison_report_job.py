"""Comparison-table report job — the reference's 4th entry point
(generate_comparison_tables.py) as one distributed Spark job:

    spark-submit --driver-memory 6g --py-files dist/timeseriestokenizer_spark.zip \
        jobs/comparison_report_job.py --runs <runs_parquet> --output <dir> \
        [--columns c0,c1,c2]

Input: a runs table with columns (experiment, dataset, model, metric,
eval_type, target_column, folder_name, metric_value) — the metrics rows a
pipeline appends as it finishes runs (plans/manifest.py), replacing the
reference's per-run folder CSVs. Output: parquet partitioned by
(dataset, model, metric, eval_type) — each partition is one of the
reference's 60 comparison tables (rows = 22 experiments, columns = the
dataset's target columns).
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow plain `python jobs/<job>.py` without --py-files (spark-submit with
# --py-files and in-process test callers are unaffected)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--runs", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--columns", default=None,
                   help="comma-separated pivot columns; default: distinct target_column")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from timeseriestokenizer_spark.operators.report import (
        comparison_long,
        comparison_tables,
        experiment_grid,
        write_comparison_tables,
    )

    spark = SparkSession.builder.appName("tts-comparison-report").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    runs = spark.read.parquet(args.runs)
    if args.columns:
        columns = args.columns.split(",")
    else:
        columns = [
            r["target_column"]
            for r in runs.select("target_column").distinct().orderBy("target_column").collect()
        ]
    grid = experiment_grid(spark)
    long_df = comparison_long(runs, grid)
    tables = comparison_tables(long_df, grid, columns)
    write_comparison_tables(tables, args.output)
    n_tables = tables.select("dataset", "model", "metric", "eval_type").distinct().count()
    print(json.dumps({"tables": n_tables, "columns": columns,
                      "wall_s": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
