"""As-of join — the time-series join Spark lacks as a primitive.

Each left row pairs with the LATEST right row whose timestamp is at or
before the left row's (per key): events to the most recent config, trades
to the prevailing quote, turns to the active scaler version. The naive
formulation is an inequality join (`l.key = r.key AND r.ts <= l.ts` +
argmax), which Spark plans as a broadcast-nested-loop or a sort-merge with
a per-row backward scan — quadratic within a key.

This implementation is the sort-based linear form: tag and UNION the two
sides, hash-partition by key, sort by (ts, side) inside the partition, and
carry the right side's values forward with `last(ignorenulls=True)` over an
unbounded-preceding window — exactly one shuffle of (left + right) rows,
each carried column a constant-width window state. Right rows sort before
left rows at equal timestamps, so "at or before" includes ties (DuckDB
`ASOF JOIN ... ON l.ts >= r.ts` semantics — its native operator is the
contract oracle). Left rows earlier than every right row keep NULLs
(left-outer as-of).

If several right rows share (key, ts), the carried value is the last one
in ``dedup_order`` (default: arbitrary-but-deterministic by the first value
column) — pre-aggregate the right side when that choice matters.

The carried state is ONE struct holding the entire right row, not one
window per value column: with per-column ``last(ignorenulls=True)`` a NULL
in a single column of the matched right row would silently fall back to an
OLDER row's value for that column, stitching the output from different
right rows — not as-of semantics. Carrying the struct returns the matched
row's values verbatim, NULLs included (DuckDB ASOF behaviour).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left-outer as-of join: every left row + the matched right
    ``value_cols`` for the same ``key``. One shuffle on key.

    direction='backward' (default): the LATEST right row with
    right_ts <= left_ts (trades to the prevailing quote). 'forward': the
    EARLIEST right row with right_ts >= left_ts (events to the next
    scheduled checkpoint) — the same linear window form with the sort
    reversed; DuckDB's native ASOF with a <= condition is the oracle.

    ``tolerance_s`` (pandas merge_asof parity): a match older (backward)
    or farther ahead (forward) than this many seconds is discarded — the
    whole matched row at once, never per-column, so the all-or-nothing
    struct-carry semantics survive (a stale quote doesn't leak single
    fields). Exact-µs integer comparison, same linear plan (the matched
    row's timestamp rides the carried struct)."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_cols = left.columns
    # the right row travels as ONE nullable struct so every carried column
    # comes from the same matched row (NULL fields stay NULL — no per-column
    # fallback to older rows)
    # with tolerance, the matched row's event time rides the struct as the
    # LAST field, so the leading fields keep deciding duplicate-(key, ts)
    # tie order
    struct_fields = {
        c: right.schema[c].dataType.simpleString() for c in value_cols
    }
    if tolerance_s is not None:
        struct_fields["__rts_us"] = "bigint"
    struct_type = (
        "struct<" + ",".join(
            f"`{c}`:{t}" for c, t in struct_fields.items()
        ) + ">"
    )
    r_struct_cols = [F.col(c) for c in value_cols]
    if tolerance_s is not None:
        r_struct_cols.append(
            F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__rts_us")
        )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_r", F.lit(None).cast(struct_type))
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*r_struct_cols).alias("_r"),
    )
    for c in l_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*l_cols, "_ts", "_side", "_r").unionByName(
        r.select(*l_cols, "_ts", "_side", "_r")
    )
    # right rows (_side 0) sort before left rows at equal _ts → ties included;
    # the trailing _r struct key makes duplicate-(key, ts) right rows
    # deterministic (struct ordering = lexicographic over fields)
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        W.partitionBy(key)
        .orderBy(ts_order, "_side", "_r")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    if tolerance_s is not None:
        lt_us = F.unix_micros(F.col("_ts").cast("timestamp"))
        gap_us = (
            lt_us - carried["__rts_us"]
            if direction == "backward"
            else carried["__rts_us"] - lt_us
        )
        # discard the WHOLE matched row beyond tolerance (all-or-nothing)
        carried = F.when(
            gap_us <= F.lit(int(round(tolerance_s * 1_000_000))), carried
        )
    filled = u.select(
        *l_cols,
        "_side",
        *[carried[c].alias(f"asof_{c}") for c in value_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    keys: list[str] | None = None,
    granularity_s: int = 3600,
) -> DataFrame:
    """Interval-containment join (events → the interval(s) containing them)
    via TIME TILING — the second classic time-series join Spark lacks as a
    primitive. A raw `l.ts BETWEEN r.start AND r.end` predicate has no
    equi-key, so Spark plans a (broadcast) nested loop: every event ×
    every interval. Tiling restores an equi-key: each interval explodes
    into the ``granularity_s`` buckets it spans, each event maps to its one
    bucket, the join runs on (bucket [+ keys]) as a plain hash join, and a
    residual BETWEEN filter makes the result exact. Cost is linear in
    events + total interval-bucket tiles; pick the granularity near the
    typical interval length so each interval is a handful of tiles (the
    same scheme as Databricks' range-join bin optimization, expressed with
    public explode/sequence primitives)."""
    g = int(granularity_s)
    keys = keys or []
    l = left.withColumn("_tile", F.floor(F.unix_timestamp(ts_col) / g))
    iv = intervals.withColumn(
        "_tile",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(start_col) / g),
                F.floor(F.unix_timestamp(end_col) / g),
            )
        ),
    )
    return (
        l.join(iv, ["_tile"] + keys)
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_tile")
    )


def range_anti_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    keys: list[str] | None = None,
    granularity_s: int = 3600,
) -> DataFrame:
    """Events contained in NO interval — the exclusion twin of range_join
    (drop maintenance windows from SLO stats, strip outage periods before
    training). Same time-tiling trick, then a LEFT ANTI join against the
    distinct covered event keys: a bare NOT (ts BETWEEN ...) predicate has
    no equi-key and nested-loops, while covered-key materialization keeps
    both joins hash joins (the same decomposition as the outer-join
    broadcast workaround in operators/report.py)."""
    id_cols = (keys or []) + [ts_col]
    covered = range_join(
        left.select(*id_cols).distinct(), intervals, ts_col, start_col,
        end_col, keys, granularity_s,
    ).select(*id_cols).distinct()
    return left.join(covered, id_cols, "left_anti")


def asof_lerp(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Interpolated point-in-time join — the third as-of direction
    (backward = prevailing value, forward = next value, LERP = the value
    the series "was passing through" at the probe instant, the PromQL /
    InfluxDB interpolate convention): every left row gets

        v(t) = v_b + (v_f - v_b) · (t - t_b) / (t_f - t_b)

    from the latest sample at-or-before and the earliest sample
    at-or-after its timestamp (exact hit ⇒ that sample's value; missing
    bracket on either side ⇒ NULL — no extrapolation).

    Same zero-join linear form as ``asof_join``: ONE hash exchange on
    ``key``, the union sorted twice inside the partition (ascending for
    the backward carry, descending for the forward carry — samples sort
    before probes at equal timestamps in both, so an exact hit is its
    own bracket). Value and timestamp ride ONE struct per direction, so
    both always come from the same sample row.

    Float contract: with an integer ``val_col`` every input to the lerp
    is an exact BIGINT cast to double, and the expression tree (one
    subtract, one divide, one multiply, one add) is identical on both
    engines — emitted UNROUNDED. t_f = t_b (exact hit / duplicate
    sample timestamp) short-circuits to v_b before the 0/0.
    """
    l_cols = left.columns
    pair_t = "struct<`v`:bigint,`t`:bigint>"
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_p", F.lit(None).cast(pair_t))
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(val_col).cast("long").alias("v"),
            F.unix_micros(F.col(right_ts).cast("timestamp")).alias("t"),
        ).alias("_p"),
    )
    for c in l_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*l_cols, "_ts", "_side", "_p").unionByName(
        r.select(*l_cols, "_ts", "_side", "_p")
    )
    frame = (W.unboundedPreceding, 0)
    wb = (
        W.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_p").asc())
        .rowsBetween(*frame)
    )
    wf = (
        W.partitionBy(key)
        .orderBy(F.col("_ts").desc(), F.col("_side").asc(), F.col("_p").desc())
        .rowsBetween(*frame)
    )
    pb = F.last("_p", ignorenulls=True).over(wb)
    pf = F.last("_p", ignorenulls=True).over(wf)
    t = F.unix_micros(F.col("_ts").cast("timestamp"))
    vb, tb = pb["v"].cast("double"), pb["t"]
    vf, tf = pf["v"].cast("double"), pf["t"]
    lerp = (
        F.when(pb.isNull() | pf.isNull(), F.lit(None).cast("double"))
        .when(tf == tb, vb)
        .otherwise(
            vb
            + (vf - vb)
            * ((t - tb).cast("double") / (tf - tb).cast("double"))
        )
    )
    out = u.select(*l_cols, "_side", lerp.alias(f"lerp_{val_col}"))
    return out.filter(F.col("_side") == 1).drop("_side")
