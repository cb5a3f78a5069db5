"""Chronological train/val/test splits (reference W6: 70/10/20 by time order,
no shuffle — docs/EXPERIMENT_DESIGN.md:111-120)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def chronological_split(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    fractions: tuple[float, float] = (0.7, 0.8),
    split_col: str = "split",
) -> DataFrame:
    """Label each row train/val/test by percent_rank within its series.
    Deterministic given a total order (pass tie-breaker columns)."""
    w = W.partitionBy(key).orderBy(*order_cols)
    pr = F.percent_rank().over(w)
    return df.withColumn(
        split_col,
        F.when(pr < fractions[0], "train")
        .when(pr < fractions[1], "val")
        .otherwise("test"),
    )
