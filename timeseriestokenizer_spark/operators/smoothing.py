"""Exponential smoothing (EWMA) per series.

y_0 = x_0, y_i = alpha * x_i + (1 - alpha) * y_{i-1} — inherently
sequential per series, so it cannot be a Catalyst window expression.
Shape follows the gorilla/tpe batched pattern: series collapse to sorted
arrays JVM-side (ONE exchange on key), then Python smooths BATCHES of
series via mapInPandas using pandas' C-implemented
``Series.ewm(alpha, adjust=False).mean()`` — no per-row Python dispatch,
no grouped-map 25 ms/group tax — and posexplode-free reassembly via the
carried id column.

Float contract: with adjust=False pandas computes
``((1-a)*y + a*x) / ((1-a) + a)``. At DYADIC alpha (0.5, 0.25, ...) the
multiplies are exact exponent shifts and the denominator is exactly 1.0,
so the result is BIT-IDENTICAL to any engine's naive recurrence — the
contract row runs alpha=0.5 against a DuckDB recursive-CTE oracle and
hash-matches. At non-dyadic alpha the two formulations drift in the last
ulps per step (documented; engine-tested against an explicit Python
recurrence at 1e-9 tolerance instead).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as T


def ewma(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-series EWMA; returns (id_col, ewma) rows, 6-dp rounded.
    Ordering inside a series is (ts, id) — deterministic under ties."""
    seqs = (
        df.select(
            F.col(key).alias("k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(id_col).alias("i"),
            F.col(val_col).cast("double").alias("v"),
        )
        .groupBy("k")
        .agg(F.expr("array_sort(collect_list(struct(t, i, v)))").alias("seq"))
        .select(
            F.expr("transform(seq, x -> x.i)").alias("ids"),
            F.expr("transform(seq, x -> x.v)").alias("vals"),
        )
    )
    a = float(alpha)
    out_schema = T.StructType(
        [
            T.StructField("out_id", df.schema[id_col].dataType),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def _smooth(batches):
        for pdf in batches:
            ids_all, y_all = [], []
            for ids, vals in zip(pdf["ids"], pdf["vals"]):
                y = pd.Series(vals, dtype="float64").ewm(alpha=a, adjust=False).mean()
                ids_all.extend(ids)
                y_all.extend(y.tolist())
            yield pd.DataFrame({"out_id": ids_all, "ewma": y_all})

    # deliberately UNROUNDED: at dyadic alpha the smoothed doubles are
    # bit-identical across engines (pandas ewm == naive recurrence ==
    # recursive SQL, verified), while ROUNDING breaks parity — dyadic
    # smoothing of 2-dp inputs lands exactly on 5e-7 boundaries, where
    # Spark (BigDecimal HALF_UP on the shortest decimal string) and
    # DuckDB (nearest on the binary value) disagree. The usual
    # round-both-sides rule is for order-dependent aggregates; here the
    # raw value IS deterministic.
    return seqs.mapInPandas(_smooth, out_schema).withColumnRenamed("out_id", id_col)


def holt(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per series:

        l_0 = x_0,  b_0 = x_1 - x_0  (0 for singleton series)
        l_i = a*x_i + (1-a)*(l_{i-1} + b_{i-1})
        b_i = b_coef*(l_i - l_{i-1}) + (1-b_coef)*b_{i-1}

    Returns (id_col, holt_level, holt_trend) — UNROUNDED, same float
    contract as ewma: at DYADIC alpha/beta every multiply is an exact
    exponent shift, so the recurrence is bit-identical across engines and
    the contract oracle (a DuckDB recursive CTE stepping the same
    formulas) hash-matches without rounding; at non-dyadic coefficients
    formulations drift in last ulps (engine-tested with tolerance).
    Same one-exchange batched-arrays shape as ewma."""
    seqs = (
        df.select(
            F.col(key).alias("k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(id_col).alias("i"),
            F.col(val_col).cast("double").alias("v"),
        )
        .groupBy("k")
        .agg(F.expr("array_sort(collect_list(struct(t, i, v)))").alias("seq"))
        .select(
            F.expr("transform(seq, x -> x.i)").alias("ids"),
            F.expr("transform(seq, x -> x.v)").alias("vals"),
        )
    )
    a, bcf = float(alpha), float(beta)
    out_schema = T.StructType(
        [
            T.StructField("out_id", df.schema[id_col].dataType),
            T.StructField("holt_level", T.DoubleType()),
            T.StructField("holt_trend", T.DoubleType()),
        ]
    )

    def _smooth(batches):
        for pdf in batches:
            ids_all, l_all, b_all = [], [], []
            for ids, vals in zip(pdf["ids"], pdf["vals"]):
                l = float(vals[0])
                b = float(vals[1]) - float(vals[0]) if len(vals) >= 2 else 0.0
                ids_all.append(ids[0]); l_all.append(l); b_all.append(b)
                for x in vals[1:]:
                    l_new = a * float(x) + (1.0 - a) * (l + b)
                    b = bcf * (l_new - l) + (1.0 - bcf) * b
                    l = l_new
                    l_all.append(l); b_all.append(b)
                ids_all.extend(ids[1:])
            yield pd.DataFrame(
                {"out_id": ids_all, "holt_level": l_all, "holt_trend": b_all}
            )

    return seqs.mapInPandas(_smooth, out_schema).withColumnRenamed("out_id", id_col)


def holt_winters(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    period: int = 4,
) -> DataFrame:
    """Holt-Winters TRIPLE exponential smoothing (additive seasonality,
    period ``m``) per series — the seasonal extension the reference's
    hourly/10-min datasets call for (reference
    docs/EXPERIMENT_DESIGN.md:106-120: ETTh1, weather are explicitly
    seasonal; reference has no smoothing operator at all — graft-new).

        l_0 = x_0,  b_0 = x_1 - x_0 (0 for singletons),  s_{<0} = 0
        s_old_t = s_{t-m}            (0.0 while t < m — cold-start init)
        l_t = a*(x_t - s_old_t) + (1-a)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = g*(x_t - l_t) + (1-g)*s_old_t

    Seasonal init convention: the pre-history season slots are ZERO (the
    first period's seasonal indices are learned through gamma, not
    pre-fit) — chosen because it is exactly replicable in a recursive-CTE
    oracle carrying the season ring as a LIST column; a mean-of-first-
    period init would add an engine-ordered summation to the contract.
    Note s_0 is emitted as exactly 0.0 (g*(x_0 - l_0) == 0).

    Float contract (same as ewma/holt): the recurrence is written with
    IDENTICAL operation order on both engines, so every step is the same
    IEEE-754 double sequence and the outputs are bit-identical —
    UNROUNDED on purpose (rounding is what breaks parity, not the
    arithmetic). Same one-exchange batched-arrays shape as ewma: series
    collapse to sorted arrays JVM-side, Python steps batches via
    mapInPandas, no grouped-map dispatch tax, no per-row Python."""
    seqs = (
        df.select(
            F.col(key).alias("k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(id_col).alias("i"),
            F.col(val_col).cast("double").alias("v"),
        )
        .groupBy("k")
        .agg(F.expr("array_sort(collect_list(struct(t, i, v)))").alias("seq"))
        .select(
            F.expr("transform(seq, x -> x.i)").alias("ids"),
            F.expr("transform(seq, x -> x.v)").alias("vals"),
        )
    )
    a, bcf, g, m = float(alpha), float(beta), float(gamma), int(period)
    if m < 1:
        raise ValueError("period must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField("out_id", df.schema[id_col].dataType),
            T.StructField("hw_level", T.DoubleType()),
            T.StructField("hw_trend", T.DoubleType()),
            T.StructField("hw_season", T.DoubleType()),
        ]
    )

    def _smooth(batches):
        for pdf in batches:
            ids_all, l_all, b_all, s_all = [], [], [], []
            for ids, vals in zip(pdf["ids"], pdf["vals"]):
                l = float(vals[0])
                b = float(vals[1]) - float(vals[0]) if len(vals) >= 2 else 0.0
                seas = [0.0] * m
                ids_all.append(ids[0])
                l_all.append(l); b_all.append(b); s_all.append(0.0)
                for t, x in enumerate(vals[1:], start=1):
                    x = float(x)
                    s_old = seas[t % m]
                    l_new = a * (x - s_old) + (1.0 - a) * (l + b)
                    b = bcf * (l_new - l) + (1.0 - bcf) * b
                    s_new = g * (x - l_new) + (1.0 - g) * s_old
                    seas[t % m] = s_new
                    l = l_new
                    l_all.append(l); b_all.append(b); s_all.append(s_new)
                ids_all.extend(ids[1:])
            yield pd.DataFrame(
                {
                    "out_id": ids_all,
                    "hw_level": l_all,
                    "hw_trend": b_all,
                    "hw_season": s_all,
                }
            )

    return seqs.mapInPandas(_smooth, out_schema).withColumnRenamed("out_id", id_col)


def ewm_band(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.25,
    z: float = 3.0,
) -> DataFrame:
    """EW control band (EWMA control chart): per point, the running
    exponentially-weighted mean AND variance, plus a breach flag testing
    the point against the band its PRIOR state predicted (a spike must
    not widen the band that judges it):

        d_i    = x_i - m_{i-1}
        breach = v_{i-1} > 0  AND  |d_i| > z * sqrt(v_{i-1})
        step   = alpha * d_i
        m_i    = m_{i-1} + step
        v_i    = (1-alpha) * (v_{i-1} + step * d_i)

    (West 1979 incremental EW variance; m_0 = x_0, v_0 = 0, first point
    never breaches.) The self-tuning alerting primitive: the band adapts
    to each series' own level and noise, no global threshold to pick.

    Float contract: every step is a FIXED IEEE op sequence (one subtract,
    one scale, one add, one multiply-accumulate-scale; the lone sqrt is
    correctly rounded by IEEE 754, and z stays a literal) — so a DuckDB
    recursive CTE stepping the identical order reproduces all columns
    bit-exactly, the holt_smoothing proof shape. At dyadic alpha the
    *step* scaling is additionally exact, but bit-parity only needs the
    identical order. Returns (id_col, ewm_mean, ewm_var, breach)
    UNROUNDED. Same one-exchange batched-arrays shape as ewma."""
    import math

    seqs = (
        df.select(
            F.col(key).alias("k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(id_col).alias("i"),
            F.col(val_col).cast("double").alias("v"),
        )
        .groupBy("k")
        .agg(F.expr("array_sort(collect_list(struct(t, i, v)))").alias("seq"))
        .select(
            F.expr("transform(seq, x -> x.i)").alias("ids"),
            F.expr("transform(seq, x -> x.v)").alias("vals"),
        )
    )
    a, zz = float(alpha), float(z)
    out_schema = T.StructType(
        [
            T.StructField("out_id", df.schema[id_col].dataType),
            T.StructField("ewm_mean", T.DoubleType()),
            T.StructField("ewm_var", T.DoubleType()),
            T.StructField("breach", T.BooleanType()),
        ]
    )

    def _band(batches):
        for pdf in batches:
            ids_all, m_all, v_all, br_all = [], [], [], []
            for ids, vals in zip(pdf["ids"], pdf["vals"]):
                m, v = float(vals[0]), 0.0
                ids_all.append(ids[0])
                m_all.append(m); v_all.append(v); br_all.append(False)
                for x in vals[1:]:
                    d = float(x) - m
                    br_all.append(v > 0.0 and abs(d) > zz * math.sqrt(v))
                    step = a * d
                    m = m + step
                    v = (1.0 - a) * (v + step * d)
                    m_all.append(m); v_all.append(v)
                ids_all.extend(ids[1:])
            yield pd.DataFrame(
                {
                    "out_id": ids_all,
                    "ewm_mean": m_all,
                    "ewm_var": v_all,
                    "breach": br_all,
                }
            )

    return seqs.mapInPandas(_band, out_schema).withColumnRenamed("out_id", id_col)


def kalman_level(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    q: float = 0.25,
    r: float = 1.0,
) -> DataFrame:
    """Kalman filter for the local-level (random-walk + noise) model per
    series — the optimal-gain generalization of EWMA: where EWMA's alpha
    is fixed, the Kalman gain STARTS high (trust early observations) and
    converges to the steady-state alpha the q/r ratio implies, so the
    filter self-tunes its warm-up. Recurrence per series, in this exact
    IEEE op order (one add, one divide, one multiply-add, one multiply
    per step — an engine replaying the same order is bit-identical; the
    divide makes the values non-dyadic, so tests pin bit-equality against
    an explicit same-order oracle rather than a closed form):

        x_0 = z_0, P_0 = r
        P~  = P + q
        K   = P~ / (P~ + r)
        x   = x + K * (z - x)
        P   = (1 - K) * P~

    Emits (id_col, kf_mean, kf_var, kf_gain) — kf_var is the POSTERIOR
    state variance (shrinks toward the Riccati fixed point), kf_gain the
    gain used at that step (gain 0 for the first point: the prior IS the
    observation). Same one-exchange batched-arrays shape as ewma/holt."""
    seqs = (
        df.select(
            F.col(key).alias("k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(id_col).alias("i"),
            F.col(val_col).cast("double").alias("v"),
        )
        .groupBy("k")
        .agg(F.expr("array_sort(collect_list(struct(t, i, v)))").alias("seq"))
        .select(
            F.expr("transform(seq, x -> x.i)").alias("ids"),
            F.expr("transform(seq, x -> x.v)").alias("vals"),
        )
    )
    qf, rf = float(q), float(r)
    out_schema = T.StructType(
        [
            T.StructField("out_id", df.schema[id_col].dataType),
            T.StructField("kf_mean", T.DoubleType()),
            T.StructField("kf_var", T.DoubleType()),
            T.StructField("kf_gain", T.DoubleType()),
        ]
    )

    def _filt(batches):
        for pdf in batches:
            ids_all, x_all, p_all, k_all = [], [], [], []
            for ids, vals in zip(pdf["ids"], pdf["vals"]):
                x, p = float(vals[0]), rf
                ids_all.append(ids[0])
                x_all.append(x); p_all.append(p); k_all.append(0.0)
                for z in vals[1:]:
                    p_pred = p + qf
                    gain = p_pred / (p_pred + rf)
                    x = x + gain * (float(z) - x)
                    p = (1.0 - gain) * p_pred
                    x_all.append(x); p_all.append(p); k_all.append(gain)
                ids_all.extend(ids[1:])
            yield pd.DataFrame(
                {
                    "out_id": ids_all,
                    "kf_mean": x_all,
                    "kf_var": p_all,
                    "kf_gain": k_all,
                }
            )

    return seqs.mapInPandas(_filt, out_schema).withColumnRenamed("out_id", id_col)


def holt_winters_forecast(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    period: int = 4,
    horizon: int = 4,
) -> DataFrame:
    """h-step-ahead Holt-Winters forecasts from each series' FINAL state:

        yhat(t+h) = l_t + h*b_t + s[(t+h) mod m]

    with (l, b, season ring) stepped by the exact holt_winters recurrence
    (same zero-seasonal cold start, same IEEE op order; see holt_winters's
    float contract). The forecast itself is one multiply and two adds of
    bit-identical state, so yhat is emitted UNROUNDED and hash-matches a
    recursive-CTE oracle that carries the ring to the last row. Singleton
    series forecast flat at x_0 (b = 0, ring all zero).

    Output (key, h, yhat) for h = 1..horizon — the rollup-tier companion
    ("what do the next h buckets look like") to the smoothing filters.
    Same one-exchange batched-arrays shape."""
    seqs = (
        df.select(
            F.col(key).alias("k"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(id_col).alias("i"),
            F.col(val_col).cast("double").alias("v"),
        )
        .groupBy("k")
        .agg(F.expr("array_sort(collect_list(struct(t, i, v)))").alias("seq"))
        .select("k", F.expr("transform(seq, x -> x.v)").alias("vals"))
    )
    a, bcf, g = float(alpha), float(beta), float(gamma)
    m, H = int(period), int(horizon)
    if m < 1 or H < 1:
        raise ValueError("period and horizon must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField("out_key", df.schema[key].dataType),
            T.StructField("h", T.IntegerType()),
            T.StructField("yhat", T.DoubleType()),
        ]
    )

    def _forecast(batches):
        for pdf in batches:
            keys_all, h_all, y_all = [], [], []
            for k, vals in zip(pdf["k"], pdf["vals"]):
                l = float(vals[0])
                b = float(vals[1]) - float(vals[0]) if len(vals) >= 2 else 0.0
                seas = [0.0] * m
                for t, x in enumerate(vals[1:], start=1):
                    x = float(x)
                    s_old = seas[t % m]
                    l_new = a * (x - s_old) + (1.0 - a) * (l + b)
                    b = bcf * (l_new - l) + (1.0 - bcf) * b
                    seas[t % m] = g * (x - l_new) + (1.0 - g) * s_old
                    l = l_new
                t_last = len(vals) - 1
                for h in range(1, H + 1):
                    keys_all.append(k)
                    h_all.append(h)
                    y_all.append(l + float(h) * b + seas[(t_last + h) % m])
            yield pd.DataFrame(
                {"out_key": keys_all, "h": h_all, "yhat": y_all}
            )

    return seqs.mapInPandas(_forecast, out_schema).withColumnRenamed(
        "out_key", key
    )
