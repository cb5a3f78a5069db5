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


def _series_values(df, key, ts_col, val_col, id_col):
    """(key, vs): the BIGINT value array in time order — ONE hash
    exchange on the series key (groupBy + row-local array_sort on
    (ts, id, v) structs; collect_list alone has no order guarantee).
    Bounded-series doctrine (the dtw_to precedent): series length
    ≤ ~5·10⁴ per key; longer series should be pre-downsampled with the
    rollup tiers / PAA first."""
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                F.col(val_col).alias("v"),
            )
        )
    )
    return (
        df.groupBy(key)
        .agg(ordered.alias("arr"))
        .select(F.col(key), F.expr("transform(arr, x -> x.v)").alias("vs"))
        .where(F.size("vs") >= 2)
    )


_MK_S_EXPR = """
  aggregate(
    sequence(0, CAST(size(vs) AS INT) - 2),
    CAST(0 AS BIGINT),
    (acc, i) -> acc + aggregate(
        sequence(i + 1, CAST(size(vs) AS INT) - 1),
        CAST(0 AS BIGINT),
        (a2, j) -> a2 + CASE WHEN vs[j] > vs[i] THEN 1
                             WHEN vs[j] < vs[i] THEN -1 ELSE 0 END))
"""

_MK_TIES_EXPR = """
  aggregate(
    array_sort(vs),
    named_struct('prev', CAST(NULL AS BIGINT), 'run', CAST(0 AS BIGINT),
                 'n1x2', CAST(0 AS BIGINT), 'tvar', CAST(0 AS BIGINT)),
    (st, x) -> CASE WHEN st.prev IS NULL OR x != st.prev
        THEN named_struct('prev', x, 'run', CAST(1 AS BIGINT),
                          'n1x2', st.n1x2 + st.run * (st.run - 1),
                          'tvar', st.tvar + st.run * (st.run - 1)
                                                   * (2 * st.run + 5))
        ELSE named_struct('prev', x, 'run', st.run + 1,
                          'n1x2', st.n1x2, 'tvar', st.tvar) END,
    st -> named_struct(
        'n1', (st.n1x2 + st.run * (st.run - 1)) DIV 2,
        'tvar', st.tvar + st.run * (st.run - 1) * (2 * st.run + 5)))
"""


def mann_kendall(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Mann-Kendall trend test per series: S = Σ_{i<j} sign(v_j − v_i)
    (exact BIGINT), tie-corrected Kendall tau-b, and the
    continuity-corrected normal statistic Z with the tie-corrected
    variance (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18 — the nonparametric "is
    there a trend at all" answer that pairs with spearman_trend's
    strength estimate.

    Shape: NO joins and ONE exchange — each series becomes one
    time-ordered array, S folds row-locally with a nested ``aggregate``
    higher-order function (O(n²) runtime inside codegen, constant plan
    size — the array_max-over-structs lesson about WHEN-chain folds
    does not apply to runtime HOF loops), and the tie terms come from
    ONE run-length ``aggregate`` pass over the sorted copy. The naive
    alternative (pairwise self-join + tie groupBy) shuffles the raw
    table three times; this shuffles it once.

    Float contract: S, n0, n1, tie terms all exact BIGINT (lengths cast
    to BIGINT before the cubic products — int32 would overflow at
    n≈10³); tau_b and Z are single divisions by single sqrts of
    identical exact integers. Series with n < 2 are absent (no pairs);
    constant series get tau_b/Z NULL — except S=0 defines Z=0 (the
    scipy kendalltau / MK-test convention)."""
    arr = _series_values(df, key, ts_col, val_col, id_col)
    s_expr = _MK_S_EXPR
    ties_expr = _MK_TIES_EXPR
    base = arr.select(
        F.col(key),
        F.size("vs").cast("long").alias("n_points"),
        F.expr(s_expr).alias("s_stat"),
        F.expr(ties_expr).alias("tie"),
    )
    n, s = F.col("n_points"), F.col("s_stat")
    n0 = F.expr("n_points * (n_points - 1) DIV 2")
    tau_b = s.cast("double") / F.sqrt(
        _null_safe_pos(n0 - F.col("tie.n1")) * n0.cast("double")
    )
    var_num = n * (n - 1) * (2 * n + 5) - F.col("tie.tvar")
    sd = F.sqrt(_null_safe_pos(var_num) / F.lit(18.0))
    z = (
        F.when(s == 0, F.lit(0.0))
        .when(s > 0, (s - 1).cast("double") / sd)
        .otherwise((s + 1).cast("double") / sd)
    )
    return base.select(
        F.col(key), n, s, tau_b.alias("tau_b"), z.alias("z_stat")
    )


def theil_sen(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Theil-Sen robust slope per series: the LOWER MEDIAN of all
    pairwise slopes (v_j − v_i)/(j − i) over row positions — resistant
    to ~29% outliers where one wild point bends the OLS slope.

    Lower median (the k = ⌈m/2⌉-th smallest) instead of the
    interpolated median deliberately: a k-th order STATISTIC is a value
    the data contains, well-defined under slope ties and reproducible
    bit-exactly on any engine, while midpoint interpolation of two
    arbitrary doubles is summation-order folklore (the ewma lesson).

    Shape: ONE exchange. Series → time-ordered array, then a PIPELINED
    double explode (outer index, then the transform over later indices)
    streams the O(n²) slopes through codegen without ever materializing
    a per-series slope array — explode preserves HashPartitioning(key),
    so the rank window that selects the median needs only a sort (which
    can spill), not a shuffle. Each slope is ONE division of exact
    BIGINTs, ordered and selected, never averaged."""
    arr = _series_values(df, key, ts_col, val_col, id_col)
    e1 = arr.select(
        F.col(key),
        F.col("vs"),
        F.expr("explode(sequence(0, CAST(size(vs) AS INT) - 2))").alias("i"),
    )
    e2 = e1.select(
        F.col(key),
        F.expr(
            """explode(transform(
                 sequence(i + 1, CAST(size(vs) AS INT) - 1),
                 j -> CAST(vs[j] - vs[i] AS DOUBLE) / CAST(j - i AS DOUBLE)))"""
        ).alias("slope"),
    )
    word = W.partitionBy(key).orderBy("slope")
    wall = W.partitionBy(key)
    r = e2.select(
        F.col(key),
        F.col("slope"),
        F.row_number().over(word).alias("k"),
        F.count(F.lit(1)).over(wall).alias("n_pairs"),
    )
    return r.where(F.col("k") == F.expr("(n_pairs + 1) DIV 2")).select(
        F.col(key), F.col("n_pairs"), F.col("slope").alias("theil_slope")
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


def predict_linear(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    horizon_s: int = 3600,
) -> DataFrame:
    """TIME-based OLS extrapolation per series — the PromQL
    ``predict_linear`` shape ("where will this counter be in an hour?"),
    the wall-clock companion to the position-based ``trend_fit``: x is
    the whole-second offset from the series' own first event
    (floor(Δµs / 10⁶) — integer division, identical on every engine), so
    irregular spacing weights the fit the way real time does.

        slope = sxy/sxx   [value units per second]
        intercept = (Σy - slope·Σx)/n          [value at the first event]
        predicted = intercept + slope·(max(x) + horizon_s)

    sxx/sxy are the exact-BIGINT normal-equation sums of ``trend_fit``;
    the float tail (two divisions, one multiply-add chain) is the
    identical sequence on identical inputs on any engine — emitted
    unrounded. Degenerate series (n < 2 or zero time-variance, e.g. all
    events inside one second) yield NULLs.

    Overflow bound: sxx ≈ n²·span_s² must stay under 2⁶³, i.e.
    n·span_s < ~3·10⁹ — a 10³-row series may span ~1 month, a 10⁴-row
    series only ~3.5 days. Beyond that rebase x to coarser units
    (minutes/hours) first; Spark would otherwise wrap silently where
    the ANSI oracle errors.

    One hash exchange on ``key``: the min-ts window and the final
    groupBy cluster together.
    """
    s1 = df.select(
        F.col(key),
        F.col(val_col).alias("v"),
        F.expr(
            f"(unix_micros(cast({ts_col} as timestamp))"
            f" - min(unix_micros(cast({ts_col} as timestamp)))"
            f" over (partition by {key})) div 1000000"
        ).alias("x"),
    )
    aggd = s1.groupBy(key).agg(
        F.count("v").alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("v").alias("sy"),
        F.max("x").alias("x_last"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum(F.col("x") * F.col("v")).alias("sxy_raw"),
    )
    n = F.col("n_points")
    sxx = n * F.col("sxx_raw") - F.col("sx") * F.col("sx")
    sxy = n * F.col("sxy_raw") - F.col("sx") * F.col("sy")
    slope = sxy.cast("double") / _null_safe_pos(sxx)
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / n.cast("double")
    predicted = intercept + slope * (
        F.col("x_last") + F.lit(int(horizon_s))
    ).cast("double")
    return aggd.select(
        F.col(key),
        n,
        slope.alias("slope_per_s"),
        predicted.alias("predicted"),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    period: int = 12,
) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch & Slack 1984): the MK trend test a
    seasonal series actually needs — plain MK reads the seasonal swing
    itself as "trend"; the seasonal variant compares only like-with-like
    (phase p vs phase p across cycles) and sums the per-phase statistics:

        S = Σ_p S_p      Var = Σ_p (n_p(n_p−1)(2n_p+5) − Σt(t−1)(2t+5))/18

    with the same continuity-corrected Z as ``mann_kendall``. Phases are
    positional ((rn−1) mod period — the holt_winters convention; the
    tier cascade already regularizes time).

    Float contract identical to mann_kendall: S and the variance
    numerator exact BIGINT, one division + one sqrt at the end,
    unrounded; S=0 defines Z=0; zero variance (every phase constant)
    yields NULL Z.

    Shape: NO joins, ONE exchange — the phase window partitions by
    ``key``, and both groupBys ((key, phase), then (key)) are satisfied
    by HashPartitioning(key) (the rollup-cascade subset rule pinned in
    tests/test_plan_shapes.py). The per-phase S folds row-locally with
    the same nested ``aggregate`` HOF as mann_kendall.
    """
    order = [F.col(ts_col), F.col(id_col)]
    wrun = W.partitionBy(key).orderBy(*order)
    s1 = df.select(
        F.col(key),
        *order,
        F.col(val_col).alias("v"),
        ((F.row_number().over(wrun) - 1) % int(period)).alias("phase"),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                F.col("v").alias("v"),
            )
        )
    )
    arr = (
        s1.groupBy(key, "phase")
        .agg(ordered.alias("arr"))
        .select(
            F.col(key),
            F.expr("transform(arr, x -> x.v)").alias("vs"),
        )
    )
    # a 1-point phase has no pairs: S_p = 0 and a zero variance term —
    # and the unguarded S fold would index out of range (sequence(0, -1)
    # runs DESCENDING in Spark), so the guard is correctness, not style
    s_guarded = (
        "CASE WHEN size(vs) >= 2 THEN (" + _MK_S_EXPR + ") "
        "ELSE CAST(0 AS BIGINT) END"
    )
    per_phase = arr.select(
        F.col(key),
        F.size("vs").cast("long").alias("n_p"),
        F.expr(s_guarded).alias("s_p"),
        F.expr(_MK_TIES_EXPR).alias("tie"),
    )
    np_ = F.col("n_p")
    aggd = per_phase.groupBy(key).agg(
        F.sum("n_p").alias("n_points"),
        F.sum("s_p").alias("s_stat"),
        F.sum(np_ * (np_ - 1) * (2 * np_ + 5) - F.col("tie.tvar")).alias(
            "var_num"
        ),
    )
    s = F.col("s_stat")
    sd = F.sqrt(_null_safe_pos(F.col("var_num")) / F.lit(18.0))
    z = (
        F.when(s == 0, F.lit(0.0))
        .when(s > 0, (s - 1).cast("double") / sd)
        .otherwise((s + 1).cast("double") / sd)
    )
    return aggd.select(
        F.col(key),
        F.col("n_points"),
        s,
        z.alias("z_stat"),
    )


def hurst_xvals(windows=(8, 16, 32)):
    """6-dp-quantized ln(w) abscissas for ``hurst_var``'s log-log
    regression, shared by the Spark plan and the generated oracle SQL so
    the regression x-values are bit-identical across engines (libm ln of
    even an exact small integer can differ in the last ulp — the
    dft_tables doctrine: quantizing the basis is part of the spec)."""
    import math

    return [float(f"{math.log(w):.6f}") for w in windows]


def hurst_var(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    windows=(8, 16, 32),
) -> DataFrame:
    """Hurst exponent per series by the AGGREGATED-VARIANCE method
    (Beran 1994; Taqqu, Teverovsky & Willinger 1995 — public
    literature): for block sizes m the variance of the block means of a
    long-memory series scales as Var(X^(m)) ~ m^(2H-2), so H = 1 + β/2
    with β the slope of ln Var vs ln m. H ≈ 0.5 = no memory, > 0.5 =
    persistent (trends continue), < 0.5 = anti-persistent (mean
    reverting) — the load-burst detector for conversation traffic.

    Exactness: each Var_m is an exact rational of BIGINT block sums —

        Var_m = (k·Σ S_b² - (Σ S_b)²) / (k²·m²),   S_b = block sum

    (one IEEE division; order-insensitive because the sums are
    integers). The regression abscissas come 6-dp-quantized from
    ``hurst_xvals`` (bit-identical literals in both plans); the
    ordinates ln(Var_m) are the one libm step, so the final ``hurst``
    rounds to 6 dp on both sides (the lm_doc_score precedent). Var
    columns publish UNROUNDED. Trailing partial blocks are dropped;
    series need k ≥ 2 full blocks at the largest window (else NULL
    hurst); a zero Var_m (constant blocks) also yields NULL.

    Shape: NO joins, ONE hash exchange — the position window partitions
    by ``key`` and every later groupBy ((key,w,block), (key,w), (key))
    is satisfied by HashPartitioning(key) (the rollup-cascade subset
    rule)."""
    ws = [int(w) for w in windows]
    xs = hurst_xvals(ws)
    order = [F.col(ts_col), F.col(id_col)]
    wrun = W.partitionBy(key).orderBy(*order)
    s1 = df.select(
        F.col(key),
        F.col(val_col).alias("v"),
        (F.row_number().over(wrun) - 1).alias("m"),
    )
    exploded = s1.select(
        F.col(key),
        F.col("v"),
        F.col("m"),
        F.explode(F.array(*[F.lit(w) for w in ws])).alias("w"),
    ).select(
        F.col(key),
        F.col("w"),
        F.expr("m div w").alias("blk"),
        F.col("v"),
        F.col("m"),
    )
    per_blk = (
        exploded.groupBy(key, "w", "blk")
        .agg(F.sum("v").alias("s_b"), F.count("v").alias("c_b"))
        .where(F.col("c_b") == F.col("w"))  # full blocks only
    )
    per_w = per_blk.groupBy(key, "w").agg(
        F.count("s_b").alias("_kb"),
        F.sum("s_b").alias("s1"),
        F.sum(F.col("s_b") * F.col("s_b")).alias("s2"),
    )
    var_num = F.col("_kb") * F.col("s2") - F.col("s1") * F.col("s1")
    var_m = var_num.cast("double") / (
        F.col("_kb") * F.col("_kb") * F.col("w") * F.col("w")
    ).cast("double")
    staged = per_w.where(F.col("_kb") >= 2).select(
        F.col(key), F.col("w"), var_m.alias("var_m")
    )
    aggs = []
    for w in ws:
        aggs.append(
            F.max(F.when(F.col("w") == w, F.col("var_m"))).alias(f"var_{w}")
        )
    wide = staged.groupBy(key).agg(*aggs)
    # OLS slope over the (quantized ln w, ln Var_w) points, closed form
    n_pts = float(len(ws))
    xbar = sum(xs) / n_pts
    ys = [F.log(F.col(f"var_{w}")) for w in ws]
    ybar = sum(ys[1:], ys[0]) / F.lit(n_pts)
    sxy = None
    for x, y in zip(xs, ys):
        term = (y - ybar) * F.lit(x - xbar)
        sxy = term if sxy is None else sxy + term
    sxx = sum((x - xbar) * (x - xbar) for x in xs)
    ok = None
    for w in ws:
        cond = F.col(f"var_{w}").isNotNull() & (F.col(f"var_{w}") > 0.0)
        ok = cond if ok is None else (ok & cond)
    hurst = F.round(
        F.when(ok, F.lit(1.0) + (sxy / F.lit(sxx)) / F.lit(2.0)), 6
    )
    return wide.select(
        F.col(key),
        *[F.col(f"var_{w}") for w in ws],
        hurst.alias("hurst"),
    )


def variance_ratio(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    qs=(2, 4, 8),
) -> DataFrame:
    """Variance-ratio test per series (Lo & MacKinlay 1988, "Stock market
    prices do not follow random walks" — public literature): for a
    random walk the variance of q-step increments is q times the 1-step
    variance, so

        VR(q) = Var_q / (q · Var_1),
        Var_1 = Σ_t (d_t − μ)² / m,          d = first differences
        Var_q = Σ_t (y_t − qμ)² / (m − q + 1),  y_t = x_{t+q} − x_t

    VR ≈ 1 ⇒ random walk, < 1 ⇒ mean reversion, > 1 ⇒ trending/momentum
    — the finite-q companion to ``hurst_var``'s asymptotic slope.

    Exactness: scale the centering by m (the d-count): m·d_t − D and
    m·y_t − q·D are exact BIGINTs (D = Σd telescopes to x_n − x_1), so
    both sums of squares are exact integers and each VR is the fixed
    chain (two single-division variances, one divide) on identical
    inputs — emitted UNROUNDED. Zero 1-step variance or m < q yields
    NULL. Overflow bound: m³·max|y|² < 2⁶³ — 10³-point series at 10⁵
    magnitudes hold; longer series pre-downsample via the tiers.

    Shape: NO joins, ONE exchange (difference window, lead windows, and
    the groupBy all partition by ``key``)."""
    qs = [int(q) for q in qs]
    order = [F.col(ts_col), F.col(id_col)]
    wall = W.partitionBy(key)
    wrun = W.partitionBy(key).orderBy(*order)
    x = F.col(val_col)
    s1 = df.select(
        F.col(key),
        *order,
        (x - F.lag(val_col).over(wrun)).alias("d"),
        *[(F.lead(val_col, q).over(wrun) - x).alias(f"y{q}") for q in qs],
    )
    m = F.count("d").over(wall)
    dsum = F.sum("d").over(wall)
    s2 = s1.select(
        F.col(key),
        m.alias("m"),
        (F.col("d") * m - dsum).alias("cd"),
        *[(F.col(f"y{q}") * m - F.lit(q) * dsum).alias(f"cy{q}") for q in qs],
    )
    aggd = s2.groupBy(key).agg(
        F.first("m").alias("m"),
        F.sum(F.col("cd") * F.col("cd")).alias("ssd"),
        *[
            F.sum(F.col(f"cy{q}") * F.col(f"cy{q}")).alias(f"ssy{q}")
            for q in qs
        ],
    )
    mm = F.col("m")
    m2 = (mm * mm).cast("double")
    var1 = F.col("ssd").cast("double") / (m2 * mm.cast("double"))
    outs = [F.col(key), mm.alias("m_diffs")]
    for q in qs:
        n_y = mm - F.lit(q) + 1  # count of q-step increments
        varq = F.col(f"ssy{q}").cast("double") / (m2 * n_y.cast("double"))
        vr = F.when(
            (mm >= F.lit(q)) & (F.col("ssd") > 0),
            varq / (F.lit(float(q)) * var1),
        )
        outs.append(vr.alias(f"vr_{q}"))
    return aggd.select(*outs)
