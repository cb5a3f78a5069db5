"""Per-series trend estimation: OLS linear fit and Spearman rank
(monotonic) trend.

Graft-new analytics over the rollup store (the reference tokenizes
trending datasets — ETT oil temperature, exchange rates, see
/root/reference/docs/EXPERIMENT_DESIGN.md:106-120 — but has no trend
operator; SURVEY.md §2 marks monitoring analytics as the engine's own
surface). Both are pure Catalyst and reuse ONE hash exchange on the
series key: every window and the final groupBy cluster on ``key`` or a
superset, which ``HashPartitioning(key)`` satisfies (the rollup-cascade
precedent, pinned in tests/test_plan_shapes.py).

Float contract — the integer-exact family (operators/anomaly.py):
regressor x is the ROW POSITION rn (the holt_winters positional
convention; the tier cascade already regularizes time, so position ==
bucket index on rollup output), and all centering is division-free
(n-scaled: n*Sxy − Sx*Sy etc.), so an integer-valued input column keeps
every accumulated sum/product an exact BIGINT on any engine. The only
float ops are FINAL divisions / one sqrt (IEEE-correctly-rounded,
engine-identical) of identical exact integers — emitted UNROUNDED.

Spearman ties use AVERAGE ranks (the scipy.stats.spearmanr convention)
kept integral by carrying 2×avg_rank = 2*rank + tie_count − 1.

Int64 regime (documented, not runtime-checked): cents ≤ 1e5 and series
length n ≤ 1e4 keep the largest intermediate (n*Syy, Sy²) under ~1e18.
Feed doubles beyond that — the same plan degrades gracefully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _null_safe_pos(col):
    """A denominator column, NULLed when ≤ 0: ANSI mode plus codegen
    subexpression elimination evaluate shared divisions eagerly, so a
    ``when(ok, ...)`` wrapper alone does NOT protect a zero-variance
    series (the ar2_forecast lesson)."""
    return F.when(col > 0, col.cast("double"))


def trend_fit(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """OLS regression of value on row position (1-based): per series the
    slope (value units per step), intercept, and R². Degenerate series
    (n < 2, or constant value for R²) yield NULL.

    slope = sxy/sxx with sxx = n·Σx² − (Σx)², sxy = n·Σxy − ΣxΣy (exact
    BIGINTs); intercept = (Σy − slope·Σx)/n; R² = sxy²/(sxx·syy) — the
    identical float sequence on both engines, emitted unrounded."""
    order = [F.col(ts_col), F.col(id_col)]
    wrun = W.partitionBy(key).orderBy(*order)
    s1 = df.select(
        F.col(key),
        F.col(val_col).alias("v"),
        F.row_number().over(wrun).alias("x"),
    )
    aggd = s1.groupBy(key).agg(
        F.count("v").alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum(F.col("x") * F.col("v")).alias("sxy_raw"),
        F.sum(F.col("v") * F.col("v")).alias("syy_raw"),
    )
    n = F.col("n_points")
    sxx = n * F.col("sxx_raw") - F.col("sx") * F.col("sx")
    sxy = n * F.col("sxy_raw") - F.col("sx") * F.col("sy")
    syy = n * F.col("syy_raw") - F.col("sy") * F.col("sy")
    slope = sxy.cast("double") / _null_safe_pos(sxx)
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / n.cast("double")
    r2 = (sxy.cast("double") * sxy.cast("double")) / (
        _null_safe_pos(sxx) * _null_safe_pos(syy)
    )
    return aggd.select(
        F.col(key),
        n,
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def spearman_trend(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Spearman rank correlation of value against row position — the
    distribution-free monotonic-trend strength in [−1, 1] (the
    Mann-Kendall-style question "is this series drifting?" without
    assuming linearity; robust to the outliers that bend an OLS slope).

    Position has no ties; value ties get average ranks, carried exactly
    as w = 2·avg_rank = 2·rank + tie_count − 1 (BIGINT). rho is Pearson
    on (2·rn, w) from n-scaled exact product-sums, one final
    division-by-sqrt. Constant series yield NULL."""
    order = [F.col(ts_col), F.col(id_col)]
    wrun = W.partitionBy(key).orderBy(*order)
    wval = W.partitionBy(key).orderBy(F.col("v"))
    wtie = W.partitionBy(key, "v")
    s1 = df.select(
        F.col(key),
        F.col(val_col).alias("v"),
        (F.row_number().over(wrun) * F.lit(2)).alias("u"),
    )
    s2 = s1.select(
        F.col(key),
        F.col("u"),
        (
            F.rank().over(wval) * F.lit(2) + F.count("*").over(wtie) - F.lit(1)
        ).alias("w"),
    )
    aggd = s2.groupBy(key).agg(
        F.count("u").alias("n_points"),
        F.sum("u").alias("su"),
        F.sum("w").alias("sw"),
        F.sum(F.col("u") * F.col("u")).alias("suu_raw"),
        F.sum(F.col("w") * F.col("w")).alias("sww_raw"),
        F.sum(F.col("u") * F.col("w")).alias("suw_raw"),
    )
    n = F.col("n_points")
    suu = n * F.col("suu_raw") - F.col("su") * F.col("su")
    sww = n * F.col("sww_raw") - F.col("sw") * F.col("sw")
    suw = n * F.col("suw_raw") - F.col("su") * F.col("sw")
    rho = suw.cast("double") / F.sqrt(_null_safe_pos(suu) * _null_safe_pos(sww))
    return aggd.select(F.col(key), n, rho.alias("spearman_rho"))
