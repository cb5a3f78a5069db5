"""Per-series StandardScaler registry: fit as a distributed agg, apply inside
vectorized Arrow UDFs with a broadcast (series -> (mean, std)) dict.

Reference: one pickled sklearn StandardScaler per (dataset, column)
(transform_files_into_tokens.py:173-183). sklearn uses population std
(ddof=0) and maps zero scale to 1.0 — so the fit is
``groupBy(series).agg(avg, stddev_pop)`` (SURVEY.md §2.4 A1, §4.3.7).

Two apply paths:
* expression path (`scale_expr`) — pure Catalyst, joins the scalers table;
  whole-stage-codegen'd, preferred when the scaler table is a DataFrame.
* broadcast-UDF path (`make_scale_udf`) — the north-star form: the registry
  dict rides a Spark broadcast into a pandas_udf, no join in the plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def fit_scalers(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """scalers(series_id, mean, std) with ddof=0 std; zero/null std -> 1.0."""
    return df.groupBy(F.col(key).alias("series_id")).agg(
        F.avg(value_col).alias("mean"),
        F.coalesce(
            F.when(F.stddev_pop(value_col) == 0.0, 1.0).otherwise(
                F.stddev_pop(value_col)
            ),
            F.lit(1.0),
        ).alias("std"),
    )


def scalers_to_registry(scalers: DataFrame) -> dict[str, tuple[float, float]]:
    """Collect the (small) scalers table to a broadcastable dict."""
    return {r["series_id"]: (r["mean"], r["std"]) for r in scalers.collect()}


def scale_expr(df: DataFrame, scalers: DataFrame, key: str, value_col: str,
               out_col: str = "scaled") -> DataFrame:
    """Catalyst path: broadcast-join the scalers table and scale in-line."""
    return (
        df.join(F.broadcast(scalers), df[key] == scalers["series_id"], "left")
        .withColumn(out_col, (F.col(value_col) - F.col("mean")) / F.col("std"))
        .drop("series_id")
    )


def make_scale_udf(spark, registry: dict[str, tuple[float, float]], inverse: bool = False):
    """Arrow-vectorized scale / inverse-scale with a broadcast registry.

    Returns a pandas_udf (series_key: str, value: double) -> double.
    z = (x - mean) / std; x = z * std + mean (docs/WORKFLOW.md:336-342).
    """
    bc = spark.sparkContext.broadcast(registry)

    @pandas_udf("double")
    def _udf(keys: pd.Series, values: pd.Series) -> pd.Series:
        reg = bc.value

        def _lookup(k):
            if k not in reg:
                raise KeyError(
                    f"series {k!r} has no fitted scaler — fit_scalers must "
                    "cover every series before scaling"
                )
            return reg[k]

        means = keys.map(lambda k: _lookup(k)[0]).to_numpy(dtype=np.float64)
        stds = keys.map(lambda k: _lookup(k)[1]).to_numpy(dtype=np.float64)
        x = values.to_numpy(dtype=np.float64)
        out = x * stds + means if inverse else (x - means) / stds
        return pd.Series(out)

    return _udf
