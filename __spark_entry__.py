"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query: tiered rollup cascade over the sf0.001 events
                series with derived metrics (the engine's core operation).
queries()     — one entry per implemented operator family (SURVEY.md §2),
                each runnable at any sf_dir.
oracle_sql()  — DuckDB-equivalent SQL per query (same column names/rounding).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseriestokenizer_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 1m→1h rollup cascade with derived metrics on sf0.001."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    hourly = contract.q_rollup_1h_cascade(spark, sf_dir)
    return hourly.withColumn(
        "avg_per_event", F.col("sum_value") / F.col("n_events")
    ).orderBy("user_id", "bucket_ts")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLE_SQL)
