"""Threshold alerting with hysteresis and debounce — the monitoring-engine
companion to the anomaly operators (Prometheus-style `for:` duration +
clear-below-low semantics, re-expressed exactly).

Semantics per series (ordered by ts, id):
* a point is a FIRE candidate when it ends a run of >= ``n_consec``
  consecutive points with value >= ``hi`` (debounce: one spike never fires);
* a point is a CLEAR candidate when value <= ``lo`` (hysteresis: values
  between lo and hi retain the previous state);
* the alert is ON at a point iff the most recent candidate at or before it
  is a fire candidate.

That last formulation is the whole trick: the state machine looks
inherently sequential (clears depend on state), but fire/clear CANDIDACY is
state-independent — run length is `rn - last rn with value < hi`, both
candidate marks are running `max(CASE rn)` windows, and the state is a
last-observation-carried-forward comparison of the two marks. So the
operator is PURE Catalyst: three stacked Window operators over the same
(key) partitioning — ONE exchange, whole-stage codegen, zero Python — and
at 100 TB it scales exactly like any other per-series window (hash
partition by series key, no driver state, no recursion). Comparisons only,
no float arithmetic: both engines agree bit-for-bit, nothing is rounded.

No reference counterpart (the reference has no alerting); this is part of
the engine's monitoring tier alongside drift.py and heavy.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def alert_state(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    hi: float = 120.0,
    lo: float = 60.0,
    n_consec: int = 2,
) -> DataFrame:
    """Per-point alert state: (key, ts, id, value, alert_on, hi_run).

    ``hi_run`` is the current consecutive-points->=hi counter (0 when the
    point itself is below hi) — the debounce observable. ``alert_on`` is
    the hysteresis state AFTER processing the point: 1 from the point that
    completes the n_consec run, 0 again from the first point <= lo."""
    if not hi > lo:
        raise ValueError(f"hysteresis needs hi > lo, got hi={hi} lo={lo}")
    ordw = W.partitionBy(key).orderBy(ts_col, id_col)
    runf = ordw.rowsBetween(W.unboundedPreceding, W.currentRow)

    base = df.select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(val_col).cast("double").alias("v"),
    )
    # three Window ops, one partitioning: rn -> hi_run -> fire/clear marks
    rn = base.withColumn(
        "rn", F.row_number().over(W.partitionBy("k").orderBy("t", "i"))
    )
    runw = W.partitionBy("k").orderBy("rn").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    run = rn.withColumn(
        "hi_run",
        (
            F.col("rn")
            - F.coalesce(
                F.max(F.when(F.col("v") < F.lit(float(hi)), F.col("rn"))).over(runw),
                F.lit(0),
            )
        ).cast("int"),
    )
    marks = run.select(
        "k", "t", "i", "v", "rn", "hi_run",
        F.max(
            F.when(F.col("hi_run") >= int(n_consec), F.col("rn"))
        ).over(runw).alias("fire_rn"),
        F.max(
            F.when(F.col("v") <= F.lit(float(lo)), F.col("rn"))
        ).over(runw).alias("clear_rn"),
    )
    on = (
        F.col("fire_rn").isNotNull()
        & (F.col("clear_rn").isNull() | (F.col("fire_rn") > F.col("clear_rn")))
    ).cast("int")
    return marks.select(
        F.col("k").alias(key),
        F.col("t").alias(ts_col),
        F.col("i").alias(id_col),
        F.col("v").alias(val_col),
        F.col("rn"),
        on.alias("alert_on"),
        "hi_run",
    )


def alert_episodes(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    hi: float = 120.0,
    lo: float = 60.0,
    n_consec: int = 2,
) -> DataFrame:
    """Contiguous ON runs as episodes: (key, start_ts, end_ts, n_points,
    peak_value). start_ts is the FIRING point (the one completing the
    debounce run), end_ts the last point still on (the clear point itself
    is off, so it is excluded — an episode open at series end simply ends
    at the last point). Gaps-and-islands over alert_state, same single
    exchange; peak is an exact max, nothing rounded."""
    st = alert_state(
        df, key=key, ts_col=ts_col, val_col=val_col, id_col=id_col,
        hi=hi, lo=lo, n_consec=n_consec,
    ).filter(F.col("alert_on") == 1)
    isl = W.partitionBy(key).orderBy("rn")
    grp = st.withColumn(
        "island", F.col("rn") - F.row_number().over(isl)
    )
    return grp.groupBy(key, "island").agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.count(F.lit(1)).alias("n_points"),
        F.max(val_col).alias("peak_value"),
    ).drop("island")
