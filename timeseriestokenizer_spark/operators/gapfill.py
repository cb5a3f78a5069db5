"""Calendar gap-fill, <PAD> marking, LOCF, and periodic <EBOS> boundary flags.

Spark-first re-expression of mark_special_tokens
(/root/reference/utils/discretisize.py:282-319):

* dedup (keep-first needs an explicit order — we key on (conv_id, turn order))
* dense calendar spine  — sequence(min_ts, max_ts, interval) + explode
  (no driver-side date_range; the spine is built per series, distributed)
* missing slots flagged is_pad (reference fills value cells with '<PAD>')
* LOCF — last(value, ignorenulls=True) over rowsBetween(unboundedPreceding, 0)
* <EBOS> every k hours anchored at the first midnight **present in the
  spine**, overwriting pads (reference overwrites row values)

At scale the spine explode is bounded per series by the tier frequency; the
left join is on (series, slot_ts) — co-partitioned with the rollup output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def calendar_spine(
    df: DataFrame,
    key: str,
    ts_col: str,
    freq_seconds: int,
    max_slots_per_series: int | None = 10_000_000,
) -> DataFrame:
    """Per-key dense spine: one row per freq-aligned slot in [min, max].

    max_slots_per_series guards the explode at scale: a series whose span /
    freq exceeds it (e.g. a year-long conversation gap-filled at 1s) fails
    fast with a named error instead of materializing billions of rows in one
    task — pick the tier frequency that matches the span, or pass None to
    disable."""
    ext = df.groupBy(key).agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    )
    start = F.col("_min_ts")
    if max_slots_per_series is not None:
        n_slots = (
            F.unix_timestamp(F.col("_max_ts").cast("timestamp"))
            - F.unix_timestamp(F.col("_min_ts").cast("timestamp"))
        ) / freq_seconds
        msg = F.concat(
            F.lit("gap-fill spine for series "),
            F.col(key).cast("string"),
            F.lit(
                f" exceeds {max_slots_per_series} slots at freq={freq_seconds}s"
                " — use a coarser tier frequency or raise max_slots_per_series"
            ),
        )
        # the assertion rides the sequence's start argument so Catalyst can't
        # prune it (assert_true returns NULL on success)
        start = F.when(
            F.assert_true(n_slots <= max_slots_per_series, msg).isNull(),
            F.col("_min_ts"),
        )
    return ext.select(
        key,
        F.explode(
            F.sequence(
                start, F.col("_max_ts"), F.expr(f"interval {freq_seconds} seconds")
            )
        ).alias("slot_ts"),
    )


def gap_fill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    freq_seconds: int,
    locf: bool = True,
    method: str | None = None,
) -> DataFrame:
    """Left-join a dense spine onto per-key observations.

    ``method``: "locf" (default; = locf=True), "none" (= locf=False), or
    "linear" — pad slots interpolate between the surrounding observations
    (v + (v_next - v) * elapsed/gap, the interpolate() of a time-series
    store); the trailing run after the last observation has no right
    endpoint and no pads, and observed-null endpoints are LOCF-carried
    first so every segment is defined. Linear stays inside the same
    one-exchange generator: the lead() that finds the next slot also
    carries the next VALUE, so interpolation is pure per-row arithmetic on
    the exploded pads.

    Output: (key, slot_ts, <value_cols>, is_pad) — value columns null on pad
    slots unless ``locf`` carries the last observation forward.
    Assumes df's ts values are freq-aligned (i.e. already rolled up to the
    tier whose gaps are being exposed); dedups multiple rows per slot
    keep-first by ts order (utils/discretisize.py:290).

    Plan shape — ONE exchange, NO join: each observation GENERATES its own
    slot plus the pad slots up to (exclusive) the next observation —
    lead() + sequence() + posexplode — so LOCF falls out for free (a pad
    replicates its generating row's values) and the classic
    spine-left-join-obs formulation disappears. That join is what made
    this operator 3 shuffles wide: Spark requires ALL join keys
    co-partitioned (spark.sql.requireAllClusterKeysForCoPartition defaults
    true), so spine⋈obs re-exchanged both sides on (key, slot_ts) even
    when both were already hash(key)-partitioned. Windows don't have that
    restriction — every stage here (keep-first lag dedup, LOCF run, lead)
    demands only clustering(key) and they all share ONE hash(key) exchange
    and one sort (pytest-pinned in test_plan_shapes).
    max_slots_per_series guards the per-row explode: one year-long gap at
    1s frequency would materialize 31M rows in a single generator call —
    fail fast with a named error instead."""
    dedup_w = W.partitionBy(key).orderBy(ts_col, *value_cols)
    obs = (
        df.withColumn("_prev_ts", F.lag(ts_col).over(dedup_w))
        .filter(F.col("_prev_ts").isNull() | (F.col("_prev_ts") != F.col(ts_col)))
        .drop("_prev_ts")
        .withColumnRenamed(ts_col, "slot_ts")
    )
    run_w = W.partitionBy(key).orderBy("slot_ts")
    # pad flag fidelity with the spine-join form: an OBSERVED row whose
    # first value column is null is also flagged is_pad (captured before
    # LOCF overwrites it)
    obs = obs.withColumn("_pad0", F.col(value_cols[0]).isNull())
    if method is None:
        method = "locf" if locf else "none"
    if method not in ("locf", "linear", "none"):
        raise ValueError(f"gap_fill method must be locf/linear/none, got {method!r}")
    if method in ("locf", "linear"):
        # carry BEFORE exploding: an observed-but-null value is replaced by
        # the previous non-null, matching the spine-join-then-window form
        carried_w = run_w.rowsBetween(W.unboundedPreceding, W.currentRow)
        for c in value_cols:
            obs = obs.withColumn(c, F.last(c, ignorenulls=True).over(carried_w))
    obs = obs.withColumn("_next_ts", F.lead("slot_ts").over(run_w))
    if method == "linear":
        for c in value_cols:
            obs = obs.withColumn(f"_next_{c}", F.lead(c).over(run_w))
    gap_end = F.coalesce(
        F.col("_next_ts") - F.expr(f"interval {freq_seconds} seconds"),
        F.col("slot_ts"),
    )
    max_slots = 10_000_000
    n_slots = (
        F.unix_timestamp(F.col("_next_ts").cast("timestamp"))
        - F.unix_timestamp(F.col("slot_ts").cast("timestamp"))
    ) / freq_seconds
    msg = F.concat(
        F.lit("gap-fill spine for series "),
        F.col(key).cast("string"),
        F.lit(
            f" exceeds {max_slots} slots in one gap at freq={freq_seconds}s"
            " — use a coarser tier frequency"
        ),
    )
    gap_end = F.when(
        F.assert_true(F.coalesce(n_slots, F.lit(0.0)) <= max_slots, msg).isNull(),
        gap_end,
    )
    slots = F.sequence(
        F.col("slot_ts"), gap_end, F.expr(f"interval {freq_seconds} seconds")
    )
    extra = (
        ["_next_ts", *[f"_next_{c}" for c in value_cols]]
        if method == "linear"
        else []
    )
    exploded = obs.select(
        key,
        *value_cols,
        "_pad0",
        F.col("slot_ts").alias("_obs_ts"),
        *extra,
        F.posexplode(slots).alias("_pos", "_gen_slot"),
    )
    if method == "locf":
        out_vals = [F.col(c).alias(c) for c in value_cols]
    elif method == "none":
        out_vals = [F.when(F.col("_pos") == 0, F.col(c)).alias(c) for c in value_cols]
    else:  # linear: v + (v_next - v) * elapsed / gap, exact-µs arithmetic
        gap_us = (
            F.unix_micros(F.col("_next_ts").cast("timestamp"))
            - F.unix_micros(F.col("_obs_ts").cast("timestamp"))
        ).cast("double")
        elapsed_us = (F.col("_pos") * F.lit(float(freq_seconds) * 1e6)).cast("double")
        out_vals = [
            F.when(F.col("_pos") == 0, F.col(c))
            .otherwise(
                F.col(c)
                + (F.col(f"_next_{c}") - F.col(c)) * elapsed_us / gap_us
            )
            .alias(c)
            for c in value_cols
        ]
    return exploded.select(
        key,
        F.col("_gen_slot").alias("slot_ts"),
        *out_vals,
        ((F.col("_pos") > 0) | F.col("_pad0")).alias("is_pad"),
    )


def mark_ebos(
    filled: DataFrame, key: str, hour_toks: int, slot_col: str = "slot_ts"
) -> DataFrame:
    """Flag every ``hour_toks`` hours from each key's first midnight slot
    (inclusive); is_pad is cleared where is_ebos overwrites it
    (utils/discretisize.py:303-318)."""
    w = W.partitionBy(key)
    slot_sec = F.unix_timestamp(slot_col)
    is_midnight = (F.hour(slot_col) == 0) & (F.minute(slot_col) == 0)
    anchored = filled.withColumn(
        "_anchor",
        F.min(F.when(is_midnight, slot_sec)).over(w),
    )
    elapsed_h = F.floor((slot_sec - F.col("_anchor")) / 3600)
    out = anchored.withColumn(
        "is_ebos",
        F.col("_anchor").isNotNull()
        & (slot_sec >= F.col("_anchor"))
        & (elapsed_h % hour_toks == 0),
    ).drop("_anchor")
    return out.withColumn("is_pad", F.col("is_pad") & ~F.col("is_ebos"))


def gap_fill_with_markers(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    freq_seconds: int,
    hour_toks: int = 24,
    locf: bool = True,
) -> DataFrame:
    """Full F4 composition: spine → <PAD> → LOCF → <EBOS>."""
    return mark_ebos(
        gap_fill(df, key, ts_col, value_cols, freq_seconds, locf=locf),
        key,
        hour_toks,
    )
