"""Distribution-drift monitoring between two time periods.

The training-data-pipeline question: "did this feed's value distribution
shift between last week and this week?" The usual answers (KL divergence,
population stability index) are sums of logarithms — order-dependent
double accumulation AND transcendental, so no two engines agree bit-wise
(the doc_diversity doctrine). Total variation distance over a fixed
binning has neither problem:

    TVD = 1/2 * sum_i | p_i - q_i |
        = sum_i | N2*o1_i - N1*o2_i |  /  (2*N1*N2)

The numerator is a sum of absolute BIGINT differences — exact, order-
insensitive, mergeable — and the single final division is one IEEE op.
TVD is also the natural threshold scale: it IS the maximum probability
mass any event class could have gained or lost (0 = identical, 1 =
disjoint).

Scale shape: one map-side-combined groupBy (key, bin) with conditional
period sums, then a key window + key aggregate that share one exchange
over the ALREADY-AGGREGATED (#keys x #bins)-row table. The raw stream is
touched once.

Overflow note: the cross products N*o stay in BIGINT; at per-key period
counts beyond ~3e9 rows move the products to DECIMAL(38,0) — at that
cardinality the per-key histogram itself is the thing to shard first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def equal_width_bin(
    value_col: str, lo: float, hi: float, n_bins: int
):
    """Clamped equal-width bin index in [0, n_bins): floor((v-lo)/width)
    with out-of-range values folded into the edge bins (drift in the
    tails still registers there). The width is a Python-side literal, so
    the binning is part of the plan's identity and any engine replays it
    bit-identically (double subtract, divide, floor)."""
    width = (float(hi) - float(lo)) / int(n_bins)
    raw = F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)).cast(
        "long"
    )
    return F.least(F.lit(int(n_bins) - 1), F.greatest(F.lit(0), raw))


def histogram_drift_series(
    hist: DataFrame,
    step: str = "1 day",
    ts_col: str = "bucket_ts",
    bin_col: str = "bin",
    n_col: str = "n",
) -> DataFrame:
    """Bucket-over-bucket TVD series READ FROM ROLLUP STATE — drift
    monitoring without re-scanning raw data. Input is a long-format
    histogram tier (operators/rollup.histogram_rollup_tier: bucket_ts,
    bin, n); output is one row per bucket with the TVD against the bucket
    exactly ``step`` earlier (NULL when either side is empty — a first
    bucket, a dark gap, or the phantom bucket after the last one; a NULL
    here means "nothing to compare", never "no drift").

    Alignment is by bucket ARITHMETIC (ts == prev_ts + step), not by
    lag() — lag over (bin) would pair a bin with its last PRESENT bucket,
    silently comparing across gaps bin-by-bin at different distances.

    Scale shape: every operator here touches only the pre-aggregated
    (#buckets x #bins)-row tier table: one self-alignment join on
    (bucket, bin), one bucket window, one bucket aggregate."""
    interval = F.expr(f"INTERVAL {step}")
    cur = hist.select(
        F.col(ts_col).alias("_ts"),
        F.col(bin_col).alias("_bin"),
        F.col(n_col).alias("_oc"),
    )
    prv = hist.select(
        (F.col(ts_col) + interval).alias("_ts"),
        F.col(bin_col).alias("_bin"),
        F.col(n_col).alias("_op"),
    )
    j = cur.join(prv, ["_ts", "_bin"], "full_outer").select(
        F.col("_ts"),
        F.coalesce(F.col("_oc"), F.lit(0)).alias("_oc"),
        F.coalesce(F.col("_op"), F.lit(0)).alias("_op"),
    )
    w = W.partitionBy("_ts")
    per_bin = j.select(
        F.col("_ts"),
        F.col("_oc"),
        F.col("_op"),
        F.sum("_oc").over(w).alias("_nc"),
        F.sum("_op").over(w).alias("_np"),
    )
    return (
        per_bin.groupBy(F.col("_ts").alias(ts_col))
        .agg(
            F.first("_np").alias("n_prev"),
            F.first("_nc").alias("n_cur"),
            F.sum(
                F.abs(F.col("_np") * F.col("_oc") - F.col("_nc") * F.col("_op"))
            ).alias("tvd_num"),
        )
        .select(
            F.col(ts_col),
            F.col("n_prev"),
            F.col("n_cur"),
            F.col("tvd_num"),
            F.when(
                (F.col("n_prev") > 0) & (F.col("n_cur") > 0),
                F.col("tvd_num") / (F.lit(2) * F.col("n_prev") * F.col("n_cur")),
            ).alias("tvd"),
        )
    )


def histogram_drift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    split_ts: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Per-key total-variation distance between the value distribution
    BEFORE ``split_ts`` and AT-OR-AFTER it, over a fixed equal-width
    binning of [lo, hi]. Emits (key, n_before, n_after, tvd_num, tvd):
    tvd_num is the exact BIGINT numerator sum |N2*o1 - N1*o2|; tvd is the
    one-division double tvd_num / (2*N1*N2), NULL when either period is
    empty (no distribution to compare — never a fake 0 or 1).

    Bins empty in both periods contribute 0 and need no gap-fill; a bin
    present in only one period contributes its full cross product, which
    is exactly the mass that moved."""
    before = (
        F.col(ts_col).cast("timestamp") < F.to_timestamp(F.lit(split_ts))
    ).cast("long")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col),
            equal_width_bin(value_col, lo, hi, n_bins).alias("_bin"),
        )
        .agg(
            F.sum(before).alias("_o1"),
            F.sum(F.lit(1) - before).alias("_o2"),
        )
    )
    w = W.partitionBy(key_col)
    per_bin = counts.select(
        F.col(key_col),
        F.col("_o1"),
        F.col("_o2"),
        F.sum("_o1").over(w).alias("_n1"),
        F.sum("_o2").over(w).alias("_n2"),
    )
    return (
        per_bin.groupBy(key_col)
        .agg(
            F.first("_n1").alias("n_before"),
            F.first("_n2").alias("n_after"),
            F.sum(
                F.abs(F.col("_n2") * F.col("_o1") - F.col("_n1") * F.col("_o2"))
            ).alias("tvd_num"),
        )
        .select(
            F.col(key_col),
            F.col("n_before"),
            F.col("n_after"),
            F.col("tvd_num"),
            F.when(
                (F.col("n_before") > 0) & (F.col("n_after") > 0),
                F.col("tvd_num")
                / (F.lit(2) * F.col("n_before") * F.col("n_after")),
            ).alias("tvd"),
        )
    )


def ks_drift(
    df: DataFrame,
    split_expr,
    key: str = "conv_id",
    val_col: str = "value",
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per series between
    the rows where ``split_expr`` is true (period A) and the rest
    (period B) — the binning-free companion to ``histogram_drift``: TVD
    over fixed bins can miss a shift that stays inside one bin; the KS
    statistic D = max_v |F_A(v) - F_B(v)| is binning-free and
    distribution-free.

    Exactness: with an integer ``val_col`` the empirical CDFs are
    rational with denominators n_a, n_b, so

        D = max_v | cum_a(v)·n_b - cum_b(v)·n_a |  /  (n_a·n_b)

    has an exact BIGINT numerator (ties handled exactly: the CDF is
    evaluated after ALL rows of a tied value on both engines, because
    the cumulative window orders by the value itself over the
    pre-grouped (key, value) table). One IEEE division at the end.

    Scale shape: one map-side-combined groupBy (key, value) collapses
    the raw stream to its per-key value histogram; the cumulative window
    and the final max share the key exchange over that already-collapsed
    table. Keys with an empty side are dropped (D is undefined there).

    Overflow: cum·n stays under 2⁶³ for per-key period counts up to
    ~3e9 — same DECIMAL(38,0) escape hatch as the TVD note above.
    """
    g = (
        df.groupBy(F.col(key), F.col(val_col).alias("v"))
        .agg(
            F.sum(F.when(split_expr, 1).otherwise(0)).alias("a_cnt"),
            F.sum(F.when(split_expr, 0).otherwise(1)).alias("b_cnt"),
        )
    )
    wcum = W.partitionBy(key).orderBy("v")
    wall = W.partitionBy(key)
    staged = g.select(
        F.col(key),
        F.sum("a_cnt").over(wcum).alias("cum_a"),
        F.sum("b_cnt").over(wcum).alias("cum_b"),
        F.sum("a_cnt").over(wall).alias("n_a"),
        F.sum("b_cnt").over(wall).alias("n_b"),
    )
    return (
        staged.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy(key)
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
            ).alias("d_num"),
        )
        .select(
            F.col(key),
            F.col("n_a"),
            F.col("n_b"),
            (
                F.col("d_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("ks_d"),
        )
    )


def rank_sum_shift(
    df: DataFrame,
    split_expr,
    key: str = "conv_id",
    val_col: str = "value",
) -> DataFrame:
    """Mann–Whitney U rank-sum test per series between the rows where
    ``split_expr`` is true (sample A) and the rest — the
    location-sensitive member of the drift family (TVD and KS measure
    ANY distribution change; U asks the monitoring question "did the
    level move, and which way?") with the tie-corrected normal
    approximation z.

    Exactness: doubled midranks over the per-key value histogram keep
    everything BIGINT until the very end —

        midrank2(v) = 2·(#rows < v) + (#rows = v) + 1
        U2  = Σ_A a_cnt·midrank2  -  n_a·(n_a+1)        (= 2·U, exact)
        var_num = n_a·n_b·((n³ - n) - Σ_ties (t³ - t))   (exact)
        σ = sqrt( var_num / (12·n·(n-1)) )    z = (U2 - n_a·n_b)/(2σ)

    — one IEEE divide, one sqrt, one subtract-divide tail, the identical
    sequence on identical integers on any engine, emitted unrounded.
    Keys with an empty side are DROPPED (the ks_drift convention); σ = 0
    (all pooled values tied) yields NULL z. Overflow bound: n_a·n_b·n³ < 2⁶³ — per-key period counts to
    ~10⁴ rows; beyond that the DECIMAL(38,0) escape hatch above.

    Scale shape identical to ``ks_drift``: map-side-combined
    groupBy (key, value), then one key exchange shared by the cumulative
    window and the final aggregate.
    """
    g = df.groupBy(F.col(key), F.col(val_col).alias("v")).agg(
        F.sum(F.when(split_expr, 1).otherwise(0)).alias("a_cnt"),
        F.sum(F.when(split_expr, 0).otherwise(1)).alias("b_cnt"),
    )
    wcum = W.partitionBy(key).orderBy("v")
    t = F.col("a_cnt") + F.col("b_cnt")
    staged = g.select(
        F.col(key),
        F.col("a_cnt"),
        t.alias("t"),
        (F.lit(2) * (F.sum(t).over(wcum) - t) + t + F.lit(1)).alias("midrank2"),
    )
    aggd = staged.groupBy(key).agg(
        F.sum("a_cnt").alias("n_a"),
        F.sum(F.col("t") - F.col("a_cnt")).alias("n_b"),
        F.sum(F.col("a_cnt") * F.col("midrank2")).alias("r2_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_term"),
    )
    n = F.col("n_a") + F.col("n_b")
    u2 = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)
    var_num = F.col("n_a") * F.col("n_b") * (
        (n * n * n - n) - F.col("tie_term")
    )
    sigma = F.sqrt(
        var_num.cast("double") / (F.lit(12) * n * (n - 1)).cast("double")
    )
    z = F.when(
        sigma > 0.0,
        (u2 - F.col("n_a") * F.col("n_b")).cast("double") / (F.lit(2.0) * sigma),
    )
    return aggd.where((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        F.col(key),
        F.col("n_a"),
        F.col("n_b"),
        (u2.cast("double") / F.lit(2.0)).alias("u_stat"),
        z.alias("z"),
    )


def benford_expected(scale: int = 1_000_000):
    """Integer-quantized Benford first-digit law: e_d = round(log10(1+1/d)
    · scale) for d = 1..9 — the dft_tables doctrine again (quantizing the
    reference distribution is part of the spec, so the TVD numerator is
    an exact BIGINT and both engines' plans are generated from THIS
    list)."""
    import math

    return [round(math.log10(1.0 + 1.0 / d) * scale) for d in range(1, 10)]


def benford_deviation(
    df: DataFrame,
    key: str = "conv_id",
    val_col: str = "value",
    scale: int = 1_000_000,
) -> DataFrame:
    """First-digit (Benford) deviation per series — the classic
    fabricated/degenerate-feed screen: natural multi-scale positive
    measurements lead with 1 ~30% of the time; constant-ish or
    synthetic feeds don't. Reports the total-variation distance between
    the series' first-digit histogram and the quantized Benford law:

        TVD = Σ_d |scale·c_d − e_d·n|  /  (2·scale·n)

    (0 = Benford-perfect, → 1 = totally concentrated). The numerator is
    an exact BIGINT — digits come from the decimal STRING of the
    positive integer value (no logarithms at evaluation time; the law
    itself is pre-quantized by ``benford_expected``) and missing digits
    contribute their full e_d·n term — with ONE final division,
    unrounded. Rows with value ≤ 0 are excluded (no leading digit);
    series with none left are absent.

    Shape: NO joins, ONE map-side-combined groupBy on ``key`` (nine
    conditional sums), then a scalar projection.
    """
    e = benford_expected(scale)
    v = F.col(val_col)
    s1 = df.where(v > 0).select(
        F.col(key),
        F.substring(v.cast("string"), 1, 1).cast("int").alias("d"),
    )
    aggd = s1.groupBy(key).agg(
        F.count("d").alias("n_points"),
        *[
            F.sum(F.when(F.col("d") == d, 1).otherwise(0)).alias(f"c{d}")
            for d in range(1, 10)
        ],
    )
    n = F.col("n_points")
    num = None
    for d in range(1, 10):
        term = F.abs(F.lit(int(scale)) * F.col(f"c{d}") - F.lit(e[d - 1]) * n)
        num = term if num is None else num + term
    tvd = num.cast("double") / (F.lit(2 * int(scale)) * n).cast("double")
    return aggd.select(F.col(key), n, tvd.alias("benford_tvd"))
