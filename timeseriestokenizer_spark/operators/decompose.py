"""Series structure analysis: classical seasonal decomposition, the
autocorrelation function, and balanced-phase period detection.

Graft-new analytics over the rollup store (the reference tokenizes
explicitly-seasonal datasets — hourly ETTh1, 10-minute weather, see
/root/reference/docs/EXPERIMENT_DESIGN.md:106-120 — but never measures
the seasonality itself; these operators are the engine's own surface for
that). All three are pure Catalyst and reuse ONE hash exchange on the
series key: every window / groupBy in the plan clusters on a superset of
``key``, which ``HashPartitioning(key)`` satisfies (the rollup-cascade
precedent — pinned in tests/test_plan_shapes.py).

Float contract — the integer-exact family (see operators/anomaly.py):
divisions are cleared out of every accumulation by scaling with exact
integers (series length n, period P, 2m for the centered MA), so an
integer-valued input column (cents) keeps every sum/product an exact
BIGINT on any engine. The only float ops are FINAL divisions /
subtractions of identical exact integers — bit-identical across engines,
emitted UNROUNDED (the ewma precedent).

Positional convention: like holt_winters, seasonality is over the ROW
POSITION within a series (rn = row_number by (ts, id)), not wall-clock
phase — the tier cascade already regularizes time, so position == bucket
index on rollup output.

Int64 ranges (documented, not checked at runtime): with cents <= 1e5 and
series length n <= 1e4, the largest intermediate is the seasonal-strength
term (P*S_p - S)^2 summed over P phases, bounded by S^2 * P * (P-1)
< 1e19 only in the pathological all-mass-one-phase corner; typical
deviations keep it orders of magnitude lower. Feed doubles if your series
exceed that regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _rn(key: str, ts_col: str, id_col: str):
    return F.row_number().over(
        W.partitionBy(key).orderBy(F.col(ts_col), F.col(id_col))
    )


def seasonal_decompose(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    period: int = 4,
) -> DataFrame:
    """Classical additive decomposition x = trend + seasonal + remainder.

    Trend is the textbook centered moving average: for EVEN period m the
    2xm MA (half-weight endpoints over m+1 rows), for odd m the plain
    m-row centered MA — NULL where the window is incomplete (series
    edges), exactly like statsmodels. Seasonal is the per-(series, phase)
    mean of the detrended values; the phase means of a centered-MA
    detrend already sum to ~0, so no extra de-meaning pass is applied
    (convention documented here; statsmodels subtracts the period-mean —
    a constant ~0 offset under this trend definition).

    Integer-exact shape: the scaled detrended value
    ``d = 2m*x_t - trend2m`` (where ``trend2m`` is the MA numerator
    scaled by 2m) stays BIGINT for integer input; trend = trend2m/(2m)
    and 2m is a power of two for the default m=4, so even the emitted
    trend double is exact.
    """
    m = int(period)
    half = m // 2
    order = [F.col(ts_col), F.col(id_col)]
    wsum = W.partitionBy(key).orderBy(*order)
    if m % 2 == 0:
        # 2xm MA: 2*sum(window of m+1) - endpoints, all integer
        wspan = wsum.rowsBetween(-half, half)
        cnt = F.count(val_col).over(wspan)
        tot = F.sum(val_col).over(wspan)
        lo = F.lag(val_col, half).over(wsum)
        hi = F.lead(val_col, half).over(wsum)
        scale = 2 * m
        trend_num = F.when(cnt == m + 1, F.lit(2) * tot - lo - hi)
    else:
        wspan = wsum.rowsBetween(-half, half)
        cnt = F.count(val_col).over(wspan)
        scale = m
        trend_num = F.when(cnt == m, F.sum(val_col).over(wspan))
    rn = _rn(key, ts_col, id_col)
    stage = df.select(
        F.col(key),
        F.col(id_col),
        F.col(val_col).alias("value_in"),
        ((rn - 1) % m).alias("phase"),
        trend_num.alias("trend_num"),
        (F.lit(scale) * F.col(val_col) - trend_num).alias("detr_num"),
    )
    # per-(series, phase) mean of the scaled detrended values; the window
    # clusters on (key, phase) ⊇ key → same exchange
    wphase = W.partitionBy(key, "phase")
    s_sum = F.sum("detr_num").over(wphase)
    s_cnt = F.count("detr_num").over(wphase)
    seasonal = F.when(
        s_cnt > 0, s_sum.cast("double") / (s_cnt * F.lit(scale)).cast("double")
    )
    return stage.select(
        F.col(key),
        F.col(id_col),
        F.col("value_in"),
        F.col("phase"),
        (F.col("trend_num").cast("double") / F.lit(float(scale))).alias("trend"),
        seasonal.alias("seasonal"),
        (
            F.col("detr_num").cast("double") / F.lit(float(scale)) - seasonal
        ).alias("remainder"),
    )


def _acf_sums(df, key, ts_col, val_col, id_col, max_lag):
    """(key, n_points, denom, num1..num_k): the exact-BIGINT autocovariance
    product-sums shared by ``acf`` (which stacks them into per-lag rows)
    and ``pacf`` (which feeds them wide into the Durbin-Levinson
    recursion). One exchange on ``key``."""
    order = [F.col(ts_col), F.col(id_col)]
    wall = W.partitionBy(key)
    wrun = W.partitionBy(key).orderBy(*order)
    n = F.count(val_col).over(wall)
    s = F.sum(val_col).over(wall)
    lags = list(range(1, int(max_lag) + 1))
    s1 = df.select(
        F.col(key), *order, n.alias("n"), (F.col(val_col) * n - s).alias("c0")
    )
    stage = s1.select(
        F.col(key),
        F.col("n"),
        F.col("c0"),
        *[F.lead("c0", k).over(wrun).alias(f"c{k}") for k in lags],
    )
    return stage.groupBy(key).agg(
        F.first("n").alias("n_points"),
        F.sum(F.col("c0") * F.col("c0")).alias("denom"),
        *[
            F.sum(F.col("c0") * F.col(f"c{k}")).alias(f"num{k}")
            for k in lags
        ],
    )


def acf(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Autocorrelation function per series at lags 1..max_lag, the
    statsmodels convention (global mean and global variance as the
    denominator, so r_k = sum((x_t-mean)(x_{t+k}-mean)) / sum((x_t-mean)^2)
    and r_k is comparable across lags).

    Division-free accumulation: c_t = n*x_t - S is an exact integer
    centering (n*(x_t - mean) scaled by nothing further); numerators and
    the denominator are sums of products of the c_t — exact BIGINT for
    integer input — and the single final division is identical on every
    engine. One exchange: window(key) then groupBy(key).
    """
    lags = list(range(1, int(max_lag) + 1))
    aggd = _acf_sums(df, key, ts_col, val_col, id_col, max_lag)
    pairs = ", ".join(f"{k}, num{k}" for k in lags)
    return (
        aggd.select(
            F.col(key),
            F.col("n_points"),
            F.col("denom"),
            F.expr(f"stack({len(lags)}, {pairs}) AS (lag, numer)"),
        )
        .select(
            F.col(key),
            F.col("lag"),
            F.col("n_points"),
            F.when(
                F.col("denom") > 0,
                F.col("numer").cast("double") / F.col("denom").cast("double"),
            ).alias("acf"),
        )
    )


def ar2_forecast(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """AR(2) fit per series via Yule-Walker on the exact ACF sums, plus
    the one-step-ahead forecast — the classical closed form:

        phi1 = r1*(1 - r2) / (1 - r1^2),  phi2 = (r2 - r1^2) / (1 - r1^2)
        x_hat = mean + phi1*(x_n - mean) + phi2*(x_{n-1} - mean)

    r1/r2 are single divisions of the same BIGINT-exact product-sums the
    ``acf`` operator builds, so the float pipeline after them is the
    identical operation sequence on identical doubles on any engine
    (emitted unrounded, the ewma precedent). Degenerate series (constant
    variance, |1 - r1^2| ~ 0, or n < 3) yield NULL coefficients.

    One exchange: window(key) + groupBy(key), the acf shape plus
    conditional aggregates picking the last two observations."""
    order = [F.col(ts_col), F.col(id_col)]
    wall = W.partitionBy(key)
    wrun = W.partitionBy(key).orderBy(*order)
    n = F.count(val_col).over(wall)
    s = F.sum(val_col).over(wall)
    s1 = df.select(
        F.col(key), *order,
        F.col(val_col).alias("v"),
        n.alias("n"),
        F.row_number().over(wrun).alias("rn"),
        (F.col(val_col) * n - s).alias("c0"),
    )
    s2 = s1.select(
        F.col(key), F.col("v"), F.col("n"), F.col("rn"), F.col("c0"),
        F.lead("c0", 1).over(wrun).alias("c1"),
        F.lead("c0", 2).over(wrun).alias("c2"),
    )
    aggd = s2.groupBy(key).agg(
        F.first("n").alias("n_points"),
        F.sum("v").alias("s_tot"),
        F.sum(F.col("c0") * F.col("c0")).alias("denom"),
        F.sum(F.col("c0") * F.col("c1")).alias("num1"),
        F.sum(F.col("c0") * F.col("c2")).alias("num2"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("v"))).alias("x_n"),
        F.max(F.when(F.col("rn") == F.col("n") - 1, F.col("v"))).alias("x_n1"),
    )
    # NULL-safe denominators: ANSI mode + codegen subexpression
    # elimination evaluate shared divisions eagerly, so a `when(ok, ...)`
    # wrapper alone does NOT protect a denom=0 (constant) series.
    den = F.when(F.col("denom") > 0, F.col("denom").cast("double"))
    r1 = F.col("num1").cast("double") / den
    r2 = F.col("num2").cast("double") / den
    det = F.lit(1.0) - r1 * r1
    det_safe = F.when(F.abs(det) > F.lit(1e-12), det)
    phi1 = r1 * (F.lit(1.0) - r2) / det_safe
    phi2 = (r2 - r1 * r1) / det_safe
    mean = F.col("s_tot").cast("double") / F.col("n_points").cast("double")
    ok = (
        (F.col("denom") > 0)
        & (F.col("n_points") >= 3)
        & (F.abs(det) > F.lit(1e-12))
    )
    out_phi1 = F.when(ok, phi1)
    out_phi2 = F.when(ok, phi2)
    return aggd.select(
        F.col(key),
        F.col("n_points"),
        out_phi1.alias("phi1"),
        out_phi2.alias("phi2"),
        F.when(
            ok,
            mean
            + out_phi1 * (F.col("x_n") - mean)
            + out_phi2 * (F.col("x_n1") - mean),
        ).alias("forecast_next"),
    )


def seasonal_strength(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    periods: tuple[int, ...] = (4, 6, 8, 12),
) -> DataFrame:
    """Dominant-period detection via BALANCED-phase between-group sum of
    squares — the trig-free periodogram. For each candidate period P the
    series is truncated to its largest multiple of P (m = floor(n/P)
    complete cycles) so every phase holds exactly m points; then

        strength(P) = m * sum_p (mean_p - mean)^2  =  score / (m * P^2)
        score       = sum_p (P*S_p - S)^2          (exact BIGINT)

    — the between-phase SS, large when the series repeats with period P.
    Balancing is what makes the statistic integer-exact (equal phase
    counts clear the per-phase divisions) AND unbiased across phases.
    Trig (Goertzel/FFT) is deliberately avoided: libm cos/sin differ in
    the last ulp across engines, this does not.

    ``is_best`` marks each series' winning period under harmonic
    suppression: the smallest candidate within 95% of the max strength
    (multiples of the true period tie it in expectation — see the
    inline comment). One exchange: every window/groupBy clusters on a
    superset of ``key``.
    """
    plist = sorted(int(p) for p in periods)
    wall = W.partitionBy(key)
    rn = _rn(key, ts_col, id_col)
    base = df.select(
        F.col(key), F.col(val_col).alias("v"), rn.alias("rn"),
        F.count(val_col).over(wall).alias("n"),
    ).withColumn("period", F.explode(F.array(*[F.lit(p) for p in plist])))
    trunc = base.withColumn(
        "m_cycles", F.floor(F.col("n") / F.col("period"))
    ).filter(F.col("rn") <= F.col("m_cycles") * F.col("period"))
    per_phase = trunc.groupBy(
        key, "period", "m_cycles", ((F.col("rn") - 1) % F.col("period")).alias("phase")
    ).agg(F.sum("v").alias("s_p"))
    s_all = F.sum("s_p").over(W.partitionBy(key, "period"))
    dev = F.col("period") * F.col("s_p") - s_all
    scored = (
        per_phase.withColumn("dev", dev)
        .groupBy(key, "period", "m_cycles")
        .agg(F.sum(F.col("dev") * F.col("dev")).alias("score"))
    )
    strength = F.col("score").cast("double") / (
        F.col("m_cycles") * F.col("period") * F.col("period")
    ).cast("double")
    # harmonic suppression: any multiple of the true period scores the
    # same strength in expectation (its phase means repeat the
    # fundamental's), so argmax alone drifts to the largest harmonic on
    # noise. Prefer the SMALLEST period within 95% of the max — the
    # fundamental wins unless a larger period genuinely adds structure.
    with_max = scored.withColumn("strength", strength).withColumn(
        "_mx", F.max("strength").over(W.partitionBy(key))
    )
    qualified = F.when(
        F.col("strength") >= F.lit(0.95) * F.col("_mx"), F.lit(0)
    ).otherwise(F.lit(1))
    ranked = with_max.withColumn(
        "is_best",
        F.row_number().over(
            W.partitionBy(key).orderBy(qualified, F.col("period"))
        )
        == 1,
    )
    return ranked.select(
        key, "period", "m_cycles", "strength", "is_best"
    )


def dft_tables(periods=(4, 6, 8, 12), scale: int = 1000):
    """Integer-quantized cos/sin tables for ``dft_power``: for each
    candidate period p, ic[j] = round(cos(2πj/p)·scale) (likewise sin)
    as plain Python ints. Quantizing the basis is PART OF THE OPERATOR'S
    SPEC, not an approximation knob: it makes every correlation sum an
    exact BIGINT, so Spark and any oracle engine agree bit-wise — the
    contract SQL is generated from THIS function, so the two plans can't
    drift. At scale=1000 the basis error is < 5·10⁻⁴ per term, far below
    what a dominant-period argmax can feel."""
    import math

    out = {}
    for p in periods:
        out[int(p)] = (
            [round(math.cos(2.0 * math.pi * j / p) * scale) for j in range(p)],
            [round(math.sin(2.0 * math.pi * j / p) * scale) for j in range(p)],
        )
    return out


def dft_power(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    periods=(4, 6, 8, 12),
    scale: int = 1000,
) -> DataFrame:
    """Spectral power of each series at candidate periods — the
    frequency-domain sibling of ``seasonal_strength`` (that one measures
    phase-bucket variance; this one is the Goertzel/DFT correlation
    against a quantized sinusoid basis, so it also catches seasonality
    whose shape is sinusoidal rather than phase-locked).

    Per period p over the position-indexed, exactly-centered series
    (c_t = n·x_t - Σx, the acf centering — kills DC leakage):

        a_p = Σ_t c_t · ic_p[(t-1) mod p]     (exact BIGINT)
        b_p = Σ_t c_t · is_p[(t-1) mod p]     (exact BIGINT)
        power_p = (double)a_p² + (double)b_p²

    The squares and the add are three IEEE ops on identical inputs —
    identical on every engine, emitted unrounded. ``best_period`` is the
    argmax over p (ties → smallest p), constant per series.

    Overflow bound: n²·max|x|·scale·n < 2⁶³ — at 10³-row series with
    10⁶ magnitudes and scale 10³ that holds with two decades of slack.

    One hash exchange on ``key`` (centering window + position window +
    groupBy + argmax window all cluster on the series key).
    """
    tables = dft_tables(periods, scale)
    order = [F.col(ts_col), F.col(id_col)]
    wall = W.partitionBy(key)
    wrun = W.partitionBy(key).orderBy(*order)
    n = F.count(val_col).over(wall)
    s1 = df.select(
        F.col(key),
        (F.row_number().over(wrun) - 1).alias("m"),
        n.alias("n"),
        (F.col(val_col) * n - F.sum(val_col).over(wall)).alias("c0"),
    )
    aggs = [F.first("n").alias("n_points")]
    for p, (ic, isn) in tables.items():
        cosv = F.element_at(
            F.array(*[F.lit(v) for v in ic]), (F.col("m") % p + 1).cast("int")
        )
        sinv = F.element_at(
            F.array(*[F.lit(v) for v in isn]), (F.col("m") % p + 1).cast("int")
        )
        aggs.append(F.sum(F.col("c0") * cosv).alias(f"a_{p}"))
        aggs.append(F.sum(F.col("c0") * sinv).alias(f"b_{p}"))
    aggd = s1.groupBy(key).agg(*aggs)
    triples = ", ".join(f"{p}, a_{p}, b_{p}" for p in tables)
    stacked = aggd.select(
        F.col(key),
        F.col("n_points"),
        F.expr(f"stack({len(tables)}, {triples}) AS (period, a, b)"),
    ).select(
        F.col(key),
        F.col("period"),
        F.col("n_points"),
        (
            F.col("a").cast("double") * F.col("a").cast("double")
            + F.col("b").cast("double") * F.col("b").cast("double")
        ).alias("spec_power"),
    )
    wbest = W.partitionBy(key).orderBy(
        F.col("spec_power").desc(), F.col("period").asc()
    )
    return stacked.select(
        F.col(key),
        F.col("period"),
        F.col("n_points"),
        F.col("spec_power"),
        F.first("period").over(wbest).alias("best_period"),
    )


def pacf(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Partial autocorrelation per series at lags 1..max_lag via the
    Durbin–Levinson recursion on the exact ACF — the Box–Jenkins model-
    identification companion to ``acf`` (PACF cutting off after lag p
    identifies an AR(p); statsmodels ``pacf(method='ld')`` semantics):

        φ_{k,k} = (r_k - Σ_j φ_{k-1,j}·r_{k-j}) / (1 - Σ_j φ_{k-1,j}·r_j)
        φ_{k,j} = φ_{k-1,j} - φ_{k,k}·φ_{k-1,k-j}

    Exactness: the r_k are single divisions of the exact-BIGINT
    product-sums from ``_acf_sums``, so both engines start from
    identical doubles; the recursion is then a FIXED arithmetic sequence
    (sums accumulated j = 1..k-1 left-to-right) — identical IEEE ops on
    identical inputs, emitted UNROUNDED. Constant series (zero denom)
    yield NULL at every lag; a unit-root denominator → ±Inf/NaN
    propagates identically (IEEE on both engines).

    Plan-size note: each recursion level materializes as NAMED COLUMNS
    in a chained projection (one select per level), so the expression
    tree stays LINEAR in max_lag — inlining the recursion would
    duplicate every φ subtree at each reference and explode exponentially
    (the ivf_assign WHEN-chain lesson).

    Shape: NO joins, ONE exchange (all from ``_acf_sums``); the
    recursion levels are scalar projections.
    """
    kmax = int(max_lag)
    aggd = _acf_sums(df, key, ts_col, val_col, id_col, kmax)
    dn = F.when(F.col("denom") > 0, F.col("denom").cast("double"))
    cur = aggd.select(
        F.col(key),
        F.col("n_points"),
        *[
            (F.col(f"num{k}").cast("double") / dn).alias(f"r{k}")
            for k in range(1, kmax + 1)
        ],
    )
    # level 1
    cur = cur.select("*", F.col("r1").alias("p_1_1"))
    for k in range(2, kmax + 1):
        num = F.col(f"r{k}")
        den = F.lit(1.0)
        for j in range(1, k):
            num = num - F.col(f"p_{k-1}_{j}") * F.col(f"r{k-j}")
            den = den - F.col(f"p_{k-1}_{j}") * F.col(f"r{j}")
        cur = cur.select("*", (num / den).alias(f"p_{k}_{k}"))
        cur = cur.select(
            "*",
            *[
                (
                    F.col(f"p_{k-1}_{j}")
                    - F.col(f"p_{k}_{k}") * F.col(f"p_{k-1}_{k-j}")
                ).alias(f"p_{k}_{j}")
                for j in range(1, k)
            ],
        )
    pairs = ", ".join(f"{k}, p_{k}_{k}" for k in range(1, kmax + 1))
    return cur.select(
        F.col(key),
        F.col("n_points"),
        F.expr(f"stack({kmax}, {pairs}) AS (lag, pacf)"),
    ).select(F.col(key), F.col("lag"), F.col("n_points"), F.col("pacf"))


def ljung_box(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Ljung–Box portmanteau statistic per series — the third Box–Jenkins
    tool next to ``acf``/``pacf`` ("is anything left in this series but
    white noise?"; large Q ⇒ autocorrelated, compare to χ²(h)):

        Q = n·(n+2) · Σ_{k=1..h} r_k² / (n−k)

    Float contract: the r_k are the identical-on-both-engines single
    divisions of ``_acf_sums``' exact BIGINTs; the sum accumulates
    k = 1..h left-to-right, each term one square and one divide by the
    exact (n−k); n(n+2) multiplies in as one exact-BIGINT cast — the
    identical IEEE sequence, emitted UNROUNDED. Series with n ≤ h or
    zero variance yield NULL.

    Shape: NO joins, ONE exchange (all from ``_acf_sums``), then one
    scalar projection.
    """
    h = int(max_lag)
    aggd = _acf_sums(df, key, ts_col, val_col, id_col, h)
    dn = F.when(F.col("denom") > 0, F.col("denom").cast("double"))
    n = F.col("n_points")
    acc = None
    for k in range(1, h + 1):
        r_k = F.col(f"num{k}").cast("double") / dn
        term = (r_k * r_k) / (n - F.lit(k)).cast("double")
        acc = term if acc is None else acc + term
    q = F.when(n > h, (n * (n + 2)).cast("double") * acc)
    return aggd.select(F.col(key), n, q.alias("q_stat"))


def ou_halflife(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Mean-reversion half-life per series from the AR(1) fit — the ops
    question behind alert tuning ("how long until a spike decays halfway
    back?"): with φ = r₁ (Yule–Walker at order 1, the exact-ACF lag-1
    ratio), a shock decays as φ^h, so

        halflife = -ln(2) / ln(φ)        [steps],  defined for 0 < φ < 1

    φ ≥ 1 (non-reverting / unit root) and φ ≤ 0 (oscillating) yield NULL
    halflife; φ itself always publishes (unrounded — a single division
    of exact BIGINTs). The halflife passes through libm ln twice, so it
    rounds to 6 dp on both sides (the lm_doc_score precedent; ln(2.0) is
    evaluated by each engine on the identical literal).

    Shape: NO joins, ONE exchange (``_acf_sums`` at lag 1) + one scalar
    projection.
    """
    aggd = _acf_sums(df, key, ts_col, val_col, id_col, 1)
    dn = F.when(F.col("denom") > 0, F.col("denom").cast("double"))
    phi = F.col("num1").cast("double") / dn
    hl = F.round(
        F.when(
            (phi > 0.0) & (phi < 1.0),
            -F.log(F.lit(2.0)) / F.log(phi),
        ),
        6,
    )
    return aggd.select(
        F.col(key),
        F.col("n_points"),
        phi.alias("phi"),
        hl.alias("halflife_steps"),
    )


def runs_test(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Wald–Wolfowitz runs test per series — the order-only randomness
    diagnostic next to Ljung–Box's magnitude-weighted one: dichotomize
    by the LOWER MEDIAN (an exact order statistic, the theil_sen
    doctrine — never an interpolated midpoint), drop ties with it, count
    runs R of consecutive same-side values, and standardize

        μ = 1 + a/n,  σ² = a(a−n)/(n²(n−1)),  a = 2·n₁·n₀,
        z = (R − μ)/σ

    Too FEW runs ⇒ clumping/trend; too MANY ⇒ oscillation. R, n₁, n₀
    are exact integers on any engine (strict comparisons against an
    integer order statistic); μ/σ²/z is one fixed float sequence of
    exact-BIGINT casts — emitted UNROUNDED. n₁ = 0, n₀ = 0, or σ² ≤ 0
    yield NULL z; a series where EVERY value ties the median (e.g.
    constant) publishes no row at all — nothing survives the tie drop.

    Shape: NO joins, ONE exchange — value-rank window, median
    broadcast-within-partition window, time-order lag window, and the
    final groupBy all partition by ``key``."""
    order = [F.col(ts_col), F.col(id_col)]
    wall = W.partitionBy(key)
    wv = W.partitionBy(key).orderBy(F.col(val_col).asc(), *order)
    wrun = W.partitionBy(key).orderBy(*order)
    n = F.count(val_col).over(wall)
    pos = F.row_number().over(wv)
    med_here = F.when(pos == ((n + 1) / 2).cast("long"), F.col(val_col))
    s1 = df.select(
        F.col(key), *order, F.col(val_col).alias("v"),
        F.max(med_here).over(wall).alias("med"),
    )
    s2 = s1.where(F.col("v") != F.col("med")).select(
        F.col(key),
        *order,
        (F.col("v") > F.col("med")).cast("int").alias("side"),
    )
    s3 = s2.select(
        F.col(key),
        F.col("side"),
        F.when(
            F.lag("side").over(wrun).isNull()
            | (F.lag("side").over(wrun) != F.col("side")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    aggd = s3.groupBy(key).agg(
        F.sum("side").alias("n1"),
        F.sum(F.lit(1) - F.col("side")).alias("n0"),
        F.sum("new_run").alias("r_runs"),
    )
    n1, n0, r = F.col("n1"), F.col("n0"), F.col("r_runs")
    nn = n1 + n0
    a = F.lit(2) * n1 * n0
    mu = F.lit(1.0) + a.cast("double") / nn.cast("double")
    var = (a * (a - nn)).cast("double") / (nn * nn * (nn - 1)).cast("double")
    z = F.when(
        (n1 > 0) & (n0 > 0) & (var > 0.0),
        (r.cast("double") - mu) / F.sqrt(var),
    )
    return aggd.select(F.col(key), n1, n0, r, z.alias("z_runs"))


def turning_points(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Turning-points randomness test per series (Kendall's classic): T
    counts STRICT local extrema (plateaus break the pattern, so ties
    make a series read as less oscillatory — documented convention,
    identical on both engines); under randomness E[T] = 2(n−2)/3 and
    Var[T] = (16n − 29)/90, so

        z = (T − 2(n−2)/3) / sqrt((16n − 29)/90)

    z ≪ 0 ⇒ smooth/trending, z ≫ 0 ⇒ saw-toothing. T is an exact
    integer; the z chain is two divisions and one sqrt of exact-BIGINT
    casts, UNROUNDED. Series with n < 4 yield NULL z.

    Shape: NO joins, ONE exchange (lag/lead + groupBy on ``key``)."""
    order = [F.col(ts_col), F.col(id_col)]
    wrun = W.partitionBy(key).orderBy(*order)
    v = F.col(val_col)
    prev, nxt = F.lag(val_col).over(wrun), F.lead(val_col).over(wrun)
    is_tp = (
        ((prev < v) & (v > nxt)) | ((prev > v) & (v < nxt))
    ).cast("int")
    s1 = df.select(F.col(key), F.col(val_col), is_tp.alias("tp"))
    aggd = s1.groupBy(key).agg(
        F.count(val_col).alias("n_points"),
        F.sum("tp").alias("t_points"),
    )
    n, t = F.col("n_points"), F.col("t_points")
    mu = (F.lit(2) * (n - 2)).cast("double") / F.lit(3.0)
    var = (F.lit(16) * n - 29).cast("double") / F.lit(90.0)
    z = F.when(n >= 4, (t.cast("double") - mu) / F.sqrt(var))
    return aggd.select(F.col(key), n, t, z.alias("z_turning"))
