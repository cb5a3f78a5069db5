"""Behavioral analytics over event streams: hour-of-week seasonal
profile, cohort retention, and ordered funnel completion.

Graft-new warehouse operators (the reference has no user-behavior
surface; SURVEY.md §2 marks monitoring/report analytics as the engine's
own). They read the same events shape every other operator does.

Float contract: counts/sums/extrema are exact BIGINTs; the only float
is the profile mean — ONE division of two exact integers, emitted
unrounded (engine-identical). Funnel state folds over exact epoch-µs
with (ts, id) lexicographic order so duplicate timestamps resolve
identically everywhere."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def weekly_profile(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Per (key, weekday, hour): event count, exact sum, mean, min/max —
    the calendar-phase seasonal fingerprint (which hours of which days
    is this series hot?) that complements the time-bucket rollup tiers.
    weekday is ISO Monday=0 (F.weekday == DuckDB isodow−1 — engines
    disagree on bare dayofweek's week start, so never use it).

    One aggregation, map-side partial combine; group arity is fixed
    (≤ 7·24 rows per key) so the shuffle is tiny regardless of input."""
    ts = F.col(ts_col).cast("timestamp")
    v = F.col(val_col)
    return (
        df.select(
            F.col(key),
            F.weekday(ts).alias("weekday"),
            F.hour(ts).alias("hour"),
            v.alias("v"),
        )
        .groupBy(key, "weekday", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            (F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean"
            ),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
    )


def cohort_retention(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by first-active
    date, counted on each later active date as (cohort_date,
    offset_days, n_active, n_events). offset 0 row carries the cohort
    size; n_active/cohort-size over offsets is the retention curve.

    Shape: first-active via a window on ``key`` (one exchange), then
    the distinct-user count per (cohort, offset) — the second exchange
    is on the (cohort, offset, key) triple, which AQE can coalesce; no
    self-join back to activity (the window carries the cohort date)."""
    ts = F.col(ts_col).cast("timestamp")
    d = F.to_date(ts)
    w = W.partitionBy(key)
    acts = df.select(
        F.col(key), d.alias("day")
    ).withColumn("cohort_date", F.min("day").over(w))
    per_user_day = (
        acts.groupBy(key, "cohort_date", "day")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .select(
            F.col("cohort_date"),
            F.datediff(F.col("day"), F.col("cohort_date"))
            .cast("long")
            .alias("offset_days"),
            F.col(key),
            F.col("n_ev"),
        )
    )
    return per_user_day.groupBy("cohort_date", "offset_days").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("n_ev").alias("n_events"),
    )


def funnel_steps(
    df: DataFrame,
    stages: Sequence[int],
    key: str = "conv_id",
    ts_col: str = "ts",
    stage_col: str = "stage",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel per key: walk events in (ts, id) order and
    greedily match the stage sequence (earliest occurrence of stage 1,
    then the earliest stage 2 AFTER it, ...). Greedy-earliest is the
    standard funnel semantics and yields the earliest possible
    completion. Returns (key, stages_reached, completed,
    completed_ts_us) for EVERY key (zero-progress keys included).

    Shape: ONE exchange — series → time-ordered (us, id, stage)
    structs, then a row-local ``aggregate`` fold; state freezes once
    the last stage completes. Stage count bounds the fold state, series
    length bounds the array (the bounded-series doctrine)."""
    if not stages:
        raise ValueError("stages must be non-empty")
    n_stages = len(stages)
    stage_arr = "array(" + ", ".join(str(int(s)) for s in stages) + ")"
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
                F.col(id_col).alias("id"),
                F.col(stage_col).alias("stage"),
            )
        )
    )
    fold = f"""
      aggregate(
        evs,
        named_struct('r', 0, 't', CAST(NULL AS BIGINT)),
        (st, x) -> CASE
            WHEN st.r < {n_stages}
                 AND x.stage = element_at({stage_arr}, st.r + 1)
            THEN named_struct('r', st.r + 1,
                              't', CASE WHEN st.r + 1 = {n_stages}
                                        THEN x.us ELSE st.t END)
            ELSE st END)
    """
    base = df.groupBy(key).agg(ordered.alias("evs"))
    return base.select(F.col(key), F.expr(fold).alias("_f")).select(
        F.col(key),
        F.col("_f.r").alias("stages_reached"),
        (F.col("_f.r") == F.lit(n_stages)).alias("completed"),
        F.col("_f.t").alias("completed_ts_us"),
    )
