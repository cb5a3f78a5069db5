"""Incremental tier refresh — the production shape of the retention engine.

A day of transcripts lands; the 1m/5m/1h/1d tiers (and the HLL distinct
tiers) refresh by computing ONLY that day's partitions and dynamically
overwriting them in the tier store — history is never rescanned. This is
exact because every tier bucket (minute/5-minute/hour/day) nests inside a
calendar day, so a day's tier partitions are a pure function of that day's
signal rows.

The one cross-day dependency is ``latency_s``: a turn's latency lags
against the conversation's PREVIOUS turn, which for the first turn after
midnight lives in an earlier day (possibly much earlier for dormant
conversations). A fixed lookback would be approximate; instead the store
carries a per-conversation WATERMARK state table — ``_conv_state/through=D``
holds each conversation's last turn timestamp over all days <= D. Refreshing
day D joins day-D raw turns with the state through D-1 as pseudo-rows in
the lag window, so the first turn's latency is exact no matter how old the
previous turn is. The state for day D is then merged from (state through
D-1, day D maxima) — incremental itself, #active-conversations rows.

Ingest is FORWARD-ONLY in event time (the classic warehouse constraint):
each refresh's days must be >= every completed day; re-refreshing the
newest day (late arrivals) replays from its predecessor's state snapshot.
Older backfills = replay forward from the backfilled day.

Byte-identity of the incrementally-built store with a from-scratch cascade
is pytest-pinned (tests/test_incremental_refresh.py).

Reference parity: the reference's resumability is per-file skip-if-exists
(process_chronos_dataset.py:473-488); this is the same idea lifted to
day-partition granularity with exact cross-boundary state.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.cms import cms_rollup_from_finer, cms_rollup_tier
from ..operators.heavy import heavy_rollup_from_finer, heavy_rollup_tier
from ..operators.kll import kll_rollup_from_finer, kll_rollup_tier
from ..operators.kmv import kmv_rollup_from_finer, kmv_rollup_tier
from ..operators.rollup import (
    TIERS,
    distinct_rollup_from_finer,
    distinct_rollup_tier,
    histogram_rollup_from_finer,
    histogram_rollup_tier,
    rollup_from_finer,
    rollup_tier,
)
from .manifest import commit_partition, read_manifest

TIER_ORDER = ["1m", "5m", "1h", "1d"]


def _side_tier_day(spark, store_root, manifest, day, t0, prefix, first, finer):
    """One sketch family's 1m->1d cascade for a single day partition —
    finest tier from signals, coarser tiers by sketch merge (identical to
    the cascade path, so refreshed state equals scratch state)."""
    cur, prev_cache = None, None
    for i, tier in enumerate(TIER_ORDER):
        cur = (first(tier) if i == 0 else finer(cur, tier)).persist()
        cur.write.mode("overwrite").parquet(
            os.path.join(store_root, f"{prefix}_{tier}", f"day={day}")
        )
        commit_partition(
            spark, manifest, "incremental", f"{prefix}_{tier}", day,
            cur.count(), wall_s=time.time() - t0,
        )
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = cur
    prev_cache.unpersist()


def _side_tier_batch(spark, store_root, manifest, days, t0, prefix, first, finer):
    """Batch-mode twin of _side_tier_day: one cascade for the whole run,
    day partitions split out by dynamic partition overwrite."""
    cur, prev_cache = None, None
    for i, tier in enumerate(TIER_ORDER):
        cur = (first(tier) if i == 0 else finer(cur, tier)).persist()
        cur.withColumn("day", F.to_date("bucket_ts")).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "day"
        ).parquet(os.path.join(store_root, f"{prefix}_{tier}"))
        per_day = {
            str(r["d"]): r["n"]
            for r in cur.groupBy(F.to_date("bucket_ts").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for d in days:
            commit_partition(
                spark, manifest, "incremental", f"{prefix}_{tier}", d,
                per_day.get(d, 0), wall_s=time.time() - t0,
            )
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = cur
    prev_cache.unpersist()


def _state_path(store_root: str, through_day: str) -> str:
    return os.path.join(store_root, "_conv_state", f"through={through_day}")


def read_conv_state(spark: SparkSession, store_root: str, through_day: str) -> DataFrame | None:
    p = _state_path(store_root, through_day)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)


def completed_days(spark: SparkSession, store_root: str) -> list[str]:
    m = read_manifest(spark, os.path.join(store_root, "_manifest"))
    if m is None:
        return []
    rows = (
        m.filter((F.col("tier") == "_day") & (F.col("status") == "done"))
        .select("part_key")
        .distinct()
        .collect()
    )
    return sorted(r["part_key"] for r in rows)


def stale_days(spark: SparkSession, raw: DataFrame, store_root: str,
               ts_col: str = "ts") -> list[str]:
    """Days present in the raw table whose row count differs from what the
    manifest recorded at last refresh — new days plus late-data days. The
    scan touches ONLY the ``ts`` column (column pruning drops text/value
    columns before the count aggregate); when the raw table is physically
    day-partitioned the group-by collapses onto the partition value and
    the scan is listing-cheap, otherwise it is a single narrow-column
    pass — not free, but never a full-width read."""
    counts = {
        str(r["_day"]): r["n"]
        for r in raw.groupBy(F.to_date(ts_col).alias("_day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    m = read_manifest(spark, os.path.join(store_root, "_manifest"))
    recorded: dict[str, set[int]] = {}
    if m is not None:
        for r in (
            m.filter((F.col("tier") == "_day") & (F.col("status") == "done"))
            .select("part_key", "n_rows")
            .collect()
        ):
            recorded.setdefault(r["part_key"], set()).add(r["n_rows"])
    # the manifest is an append-only log with no commit ordering, so a day is
    # fresh iff SOME completed refresh saw exactly today's row count (the
    # count is the change fingerprint; counts only grow under append ingest)
    return sorted(d for d, n in counts.items() if n not in recorded.get(d, set()))


def _signals_for_day(day_raw: DataFrame, prev_state: DataFrame | None) -> DataFrame:
    """derive_signals restricted to one day, with the previous turn's
    timestamp injected from the state table so the first turn after
    midnight lags exactly (functions/signals.derive_signals twin — narrow
    projection: text reduces to counts before the shuffle)."""
    narrow = day_raw.select(
        "conv_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("turn_idx"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.col("tool").isNotNull().alias("is_tool_call"),
        F.lit(False).alias("_state_row"),
    )
    if prev_state is not None:
        pseudo = prev_state.select(
            "conv_id",
            F.col("last_ts").alias("ts"),
            F.lit(-1).alias("turn_idx"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit(None).cast("long").alias("n_tokens"),
            F.lit(None).cast("boolean").alias("is_tool_call"),
            F.lit(True).alias("_state_row"),
        )
        narrow = narrow.unionByName(pseudo)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return (
        narrow.withColumn(
            "latency_s",
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).cast("double")
            / 1e6,
        )
        .filter(~F.col("_state_row"))
        .drop("_state_row")
    )


def _prev_state_checked(
    spark: SparkSession, store_root: str, done: list[str], first_day: str
):
    """State snapshot covering every completed day before ``first_day``.
    Batch refreshes only write the snapshot for their LAST day, so an
    interior snapshot can be missing — silently proceeding with an older
    one would compute wrong cross-midnight latencies. Raise with the exact
    replay range instead."""
    prev_days = [d for d in done if d < first_day]
    if not prev_days:
        return None
    want = max(prev_days)
    state = read_conv_state(spark, store_root, want)
    if state is None:
        have = [d for d in prev_days if os.path.exists(_state_path(store_root, d))]
        anchor = max(have) if have else "the beginning"
        raise ValueError(
            f"no conv-state snapshot through {want} (batch refreshes keep "
            f"only their last day's snapshot); replay forward from "
            f"{anchor} — pass days covering ({anchor}, {first_day}] too"
        )
    return state


def refresh_day(
    spark: SparkSession,
    raw: DataFrame,
    store_root: str,
    day: str,
    key: str = "conv_id",
    ts_col: str = "ts",
    with_hll: bool = True,
    lg_k: int = 12,
    with_hist: bool = True,
    with_kll: bool = True,
    kll_k: int = 512,
    with_heavy: bool = True,
    mg_k: int = 256,
    with_cms: bool = True,
    cms_depth: int = 4,
    cms_width: int = 256,
    with_kmv: bool = True,
    kmv_k: int = 64,
) -> dict:
    """Refresh every tier's ``day=<day>`` partition (and the conv-state
    snapshot ``through=<day>``) from that day's raw rows + the previous
    day's state. The day filter prunes at the scan on a days(ts) layout."""
    t0 = time.time()
    day_raw = raw.filter(F.to_date(ts_col) == F.lit(day))
    done = completed_days(spark, store_root)
    prev_state = _prev_state_checked(spark, store_root, done, day)

    signals = _signals_for_day(day_raw, prev_state).persist()
    n_raw = signals.count()

    stats = {"day": day, "n_raw": n_raw, "tiers": {}}
    manifest = os.path.join(store_root, "_manifest")
    tier_df, prev_cache = None, None
    for i, tier in enumerate(TIER_ORDER):
        tier_df = (
            rollup_tier(signals, tier, key=key)
            if i == 0
            else rollup_from_finer(tier_df, tier, key=key)
        ).persist()  # the next coarser tier derives from this cache, not raw
        tier_df.write.mode("overwrite").parquet(
            os.path.join(store_root, tier, f"day={day}")
        )
        n = tier_df.count()
        stats["tiers"][tier] = n
        commit_partition(
            spark, manifest, "incremental", tier, day, n,
            metrics={"n_buckets": n}, wall_s=time.time() - t0,
        )
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = tier_df
    prev_cache.unpersist()

    if with_hll:
        hll, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            hll = (
                distinct_rollup_tier(signals, tier, key, lg_k)
                if i == 0
                else distinct_rollup_from_finer(hll, tier)
            ).persist()
            hll.write.mode("overwrite").parquet(
                os.path.join(store_root, f"hll_{tier}", f"day={day}")
            )
            commit_partition(
                spark, manifest, "incremental", f"hll_{tier}", day,
                hll.count(), wall_s=time.time() - t0,
            )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = hll
        prev_cache.unpersist()

    if with_hist:
        hist, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            hist = (
                histogram_rollup_tier(signals, tier)
                if i == 0
                else histogram_rollup_from_finer(hist, tier)
            ).persist()
            hist.write.mode("overwrite").parquet(
                os.path.join(store_root, f"hist_{tier}", f"day={day}")
            )
            commit_partition(
                spark, manifest, "incremental", f"hist_{tier}", day,
                hist.count(), wall_s=time.time() - t0,
            )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = hist
        prev_cache.unpersist()

    if with_kll:
        kll, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            kll = (
                kll_rollup_tier(signals, tier, k=kll_k)
                if i == 0
                else kll_rollup_from_finer(kll, tier, k=kll_k)
            ).persist()
            kll.write.mode("overwrite").parquet(
                os.path.join(store_root, f"kll_{tier}", f"day={day}")
            )
            commit_partition(
                spark, manifest, "incremental", f"kll_{tier}", day,
                kll.count(), wall_s=time.time() - t0,
            )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = kll
        prev_cache.unpersist()

    if with_heavy:
        hh, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            hh = (
                heavy_rollup_tier(signals, tier, key, "ts", mg_k)
                if i == 0
                else heavy_rollup_from_finer(hh, tier, mg_k)
            ).persist()
            hh.write.mode("overwrite").parquet(
                os.path.join(store_root, f"heavy_{tier}", f"day={day}")
            )
            commit_partition(
                spark, manifest, "incremental", f"heavy_{tier}", day,
                hh.count(), wall_s=time.time() - t0,
            )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = hh
        prev_cache.unpersist()

    if with_cms:
        _side_tier_day(
            spark, store_root, manifest, day, t0, "cms",
            lambda tier: cms_rollup_tier(signals, tier, key, cms_depth, cms_width),
            lambda cur, tier: cms_rollup_from_finer(cur, tier),
        )
    if with_kmv:
        _side_tier_day(
            spark, store_root, manifest, day, t0, "kmv",
            lambda tier: kmv_rollup_tier(signals, tier, key, kmv_k),
            lambda cur, tier: kmv_rollup_from_finer(cur, tier, kmv_k),
        )

    # state through this day = merge(previous state, today's last turn)
    day_max = signals.groupBy("conv_id").agg(F.max("ts").alias("last_ts"))
    if prev_state is not None:
        merged = (
            prev_state.unionByName(day_max)
            .groupBy("conv_id")
            .agg(F.max("last_ts").alias("last_ts"))
        )
    else:
        merged = day_max
    merged.write.mode("overwrite").parquet(_state_path(store_root, day))

    commit_partition(
        spark, manifest, "incremental", "_day", day, n_raw,
        wall_s=time.time() - t0,
    )
    signals.unpersist()
    stats["wall_s"] = round(time.time() - t0, 2)
    return stats


def refresh_days_batch(
    spark: SparkSession,
    raw: DataFrame,
    store_root: str,
    days: list[str],
    key: str = "conv_id",
    ts_col: str = "ts",
    with_hll: bool = True,
    lg_k: int = 12,
    with_hist: bool = True,
    with_kll: bool = True,
    kll_k: int = 512,
    with_heavy: bool = True,
    mg_k: int = 256,
    with_cms: bool = True,
    cms_depth: int = 4,
    cms_width: int = 256,
    with_kmv: bool = True,
    kmv_k: int = 64,
) -> dict:
    """Refresh a CONTIGUOUS run of days as ONE cascade — the bulk-load /
    backfill path. The per-day loop costs O(days) Spark job rounds (fine
    for the nightly single day, serial for a year of history); here the
    whole range derives signals once (the in-range lag window spans
    midnights natively; only the leading edge needs the state snapshot) and
    each tier writes ALL its day partitions in one dynamic-partition-
    overwrite job: O(1) job rounds for N days.

    Only the LAST day's conv-state snapshot is written (state for interior
    days never existed as a boundary); a later replay of an interior day
    detects the missing snapshot and instructs a forward replay
    (_prev_state_checked). ``days`` must include EVERY raw day inside its
    span — a hole would make the in-range lag silently bridge over the
    excluded day's turns."""
    days = sorted(days)
    day_lo, day_hi = days[0], days[-1]
    range_raw = raw.filter(
        (F.to_date(ts_col) >= F.lit(day_lo)) & (F.to_date(ts_col) <= F.lit(day_hi))
    )
    in_range = sorted(
        str(r["d"])
        for r in range_raw.select(F.to_date(ts_col).alias("d")).distinct().collect()
    )
    missing = [d for d in in_range if d not in set(days)]
    if missing:
        raise ValueError(
            f"batch range [{day_lo}, {day_hi}] skips raw day(s) {missing}; "
            "the in-range lag would bridge over their turns — include them"
        )
    t0 = time.time()
    done = completed_days(spark, store_root)
    prev_state = _prev_state_checked(spark, store_root, done, day_lo)
    signals = _signals_for_day(range_raw, prev_state).persist()
    day_counts = {
        str(r["d"]): r["n"]
        for r in signals.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = os.path.join(store_root, "_manifest")
    stats = {"days": days, "n_raw": sum(day_counts.values()), "tiers": {}}

    # dynamic partition overwrite is scoped to each WRITE via the
    # DataFrameWriter option (round-5 ADVICE fix) — the old session-wide
    # conf set/restore raced with concurrent jobs sharing the session
    tier_df, prev_cache = None, None
    for i, tier in enumerate(TIER_ORDER):
        tier_df = (
            rollup_tier(signals, tier, key=key)
            if i == 0
            else rollup_from_finer(tier_df, tier, key=key)
        ).persist()
        tier_df.withColumn("day", F.to_date("bucket_ts")).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "day"
        ).parquet(os.path.join(store_root, tier))
        per_day = {
            str(r["d"]): r["n"]
            for r in tier_df.groupBy(F.to_date("bucket_ts").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        stats["tiers"][tier] = sum(per_day.values())
        for d in days:
            commit_partition(
                spark, manifest, "incremental", tier, d,
                per_day.get(d, 0), wall_s=time.time() - t0,
            )
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = tier_df
    prev_cache.unpersist()

    if with_hll:
        hll, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            hll = (
                distinct_rollup_tier(signals, tier, key, lg_k)
                if i == 0
                else distinct_rollup_from_finer(hll, tier)
            ).persist()
            hll.withColumn("day", F.to_date("bucket_ts")).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy(
                "day"
            ).parquet(os.path.join(store_root, f"hll_{tier}"))
            per_day = {
                str(r["d"]): r["n"]
                for r in hll.groupBy(F.to_date("bucket_ts").alias("d"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            for d in days:
                commit_partition(
                    spark, manifest, "incremental", f"hll_{tier}", d,
                    per_day.get(d, 0), wall_s=time.time() - t0,
                )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = hll
        prev_cache.unpersist()

    if with_hist:
        hist, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            hist = (
                histogram_rollup_tier(signals, tier)
                if i == 0
                else histogram_rollup_from_finer(hist, tier)
            ).persist()
            hist.withColumn("day", F.to_date("bucket_ts")).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy(
                "day"
            ).parquet(os.path.join(store_root, f"hist_{tier}"))
            per_day = {
                str(r["d"]): r["n"]
                for r in hist.groupBy(F.to_date("bucket_ts").alias("d"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            for d in days:
                commit_partition(
                    spark, manifest, "incremental", f"hist_{tier}", d,
                    per_day.get(d, 0), wall_s=time.time() - t0,
                )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = hist
        prev_cache.unpersist()

    if with_kll:
        kll, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            kll = (
                kll_rollup_tier(signals, tier, k=kll_k)
                if i == 0
                else kll_rollup_from_finer(kll, tier, k=kll_k)
            ).persist()
            kll.withColumn("day", F.to_date("bucket_ts")).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy(
                "day"
            ).parquet(os.path.join(store_root, f"kll_{tier}"))
            per_day = {
                str(r["d"]): r["n"]
                for r in kll.groupBy(F.to_date("bucket_ts").alias("d"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            for d in days:
                commit_partition(
                    spark, manifest, "incremental", f"kll_{tier}", d,
                    per_day.get(d, 0), wall_s=time.time() - t0,
                )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = kll
        prev_cache.unpersist()

    if with_heavy:
        hh, prev_cache = None, None
        for i, tier in enumerate(TIER_ORDER):
            hh = (
                heavy_rollup_tier(signals, tier, key, "ts", mg_k)
                if i == 0
                else heavy_rollup_from_finer(hh, tier, mg_k)
            ).persist()
            hh.withColumn("day", F.to_date("bucket_ts")).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy(
                "day"
            ).parquet(os.path.join(store_root, f"heavy_{tier}"))
            per_day = {
                str(r["d"]): r["n"]
                for r in hh.groupBy(F.to_date("bucket_ts").alias("d"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            for d in days:
                commit_partition(
                    spark, manifest, "incremental", f"heavy_{tier}", d,
                    per_day.get(d, 0), wall_s=time.time() - t0,
                )
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = hh
        prev_cache.unpersist()

    if with_cms:
        _side_tier_batch(
            spark, store_root, manifest, days, t0, "cms",
            lambda tier: cms_rollup_tier(signals, tier, key, cms_depth, cms_width),
            lambda cur, tier: cms_rollup_from_finer(cur, tier),
        )
    if with_kmv:
        _side_tier_batch(
            spark, store_root, manifest, days, t0, "kmv",
            lambda tier: kmv_rollup_tier(signals, tier, key, kmv_k),
            lambda cur, tier: kmv_rollup_from_finer(cur, tier, kmv_k),
        )

    batch_max = signals.groupBy("conv_id").agg(F.max("ts").alias("last_ts"))
    merged = (
        prev_state.unionByName(batch_max)
        .groupBy("conv_id")
        .agg(F.max("last_ts").alias("last_ts"))
        if prev_state is not None
        else batch_max
    )
    merged.write.mode("overwrite").parquet(_state_path(store_root, day_hi))
    for d in days:
        commit_partition(
            spark, manifest, "incremental", "_day", d,
            day_counts.get(d, 0), wall_s=time.time() - t0,
        )
    signals.unpersist()
    stats["wall_s"] = round(time.time() - t0, 2)
    stats["mode"] = "batch"
    return stats


def refresh_tiers(
    spark: SparkSession,
    raw: DataFrame,
    store_root: str,
    days: list[str] | None = None,
    key: str = "conv_id",
    ts_col: str = "ts",
    with_hll: bool = True,
    lg_k: int = 12,
    mode: str = "auto",
    with_hist: bool = True,
    with_kll: bool = True,
    kll_k: int = 512,
    with_heavy: bool = True,
    mg_k: int = 256,
    with_cms: bool = True,
    with_kmv: bool = True,
) -> list[dict]:
    """Refresh the tier store for ``days`` (default: stale_days — new days
    plus days whose raw count changed). Days run in ascending order so each
    day's state snapshot feeds the next. Forward-only: refreshing a day
    earlier than an already-completed LATER day raises (replay forward from
    the backfilled day instead — its state snapshot is on disk).

    ``mode``: 'per_day' (one cascade per day, snapshot per day — the
    nightly shape), 'batch' (one cascade for the whole contiguous run —
    the bulk-load/backfill shape, O(1) job rounds), or 'auto' (default):
    batch when 3+ days and none is already completed (initial load /
    multi-day catch-up), per-day otherwise."""
    if days is None:
        days = stale_days(spark, raw, store_root, ts_col)
    days = sorted(days)
    if not days:
        return []
    done = completed_days(spark, store_root)
    later = [d for d in done if d > days[0]]
    if any(d not in days for d in later):
        raise ValueError(
            f"forward-only ingest: refreshing {days[0]} would invalidate "
            f"completed later day(s) {later} — replay them too "
            f"(pass days={sorted(set(days) | set(later))})"
        )
    if mode == "auto":
        mode = "batch" if len(days) >= 3 and not any(d in done for d in days) else "per_day"
    if mode == "batch":
        return [
            refresh_days_batch(
                spark, raw, store_root, days, key, ts_col, with_hll, lg_k,
                with_hist, with_kll, kll_k, with_heavy, mg_k,
                with_cms=with_cms, with_kmv=with_kmv,
            )
        ]
    return [
        refresh_day(
            spark, raw, store_root, d, key, ts_col, with_hll, lg_k, with_hist,
            with_kll, kll_k, with_heavy, mg_k,
            with_cms=with_cms, with_kmv=with_kmv,
        )
        for d in days
    ]


def read_tier(spark: SparkSession, store_root: str, tier: str) -> DataFrame:
    """Read one tier across all day partitions (day dir name recovered via
    basePath so partition pruning on `day` works downstream)."""
    root = os.path.join(store_root, tier)
    return spark.read.option("basePath", root).parquet(root).drop("day")


def store_summary(spark: SparkSession, store_root: str) -> str:
    m = read_manifest(spark, os.path.join(store_root, "_manifest"))
    if m is None:
        return json.dumps({})
    rows = m.groupBy("tier").agg(
        F.countDistinct("part_key").alias("days"), F.sum("n_rows").alias("rows")
    ).collect()
    return json.dumps({r["tier"]: {"days": r["days"], "rows": r["rows"]} for r in rows})


def retention_sweep(
    spark: SparkSession,
    store_root: str,
    now_day: str,
    policy: dict[str, int | None] | None = None,
    cold_pack_tiers: tuple[str, ...] = ("1m",),
    key: str = "conv_id",
    value_col: str = "sum_lat",
    side_prefixes: tuple[str, ...] = ("hll_", "hist_", "kll_", "heavy_", "cms_", "kmv_"),
    sdt_comp_dev: float | None = None,
) -> dict:
    """Enforce TTLs on the tier store PHYSICALLY — the retention leg of the
    north rule applied to storage, not just DataFrames: day partitions
    older than a tier's TTL are dropped as WHOLE DIRECTORIES (a partition
    drop / object-store prefix delete at scale — surviving data is never
    rewritten), after the finest tier's expiring days are packed into
    Gorilla cold blobs (``store/cold_<tier>/day=D``, exact unpack
    pytest-pinned). Coarser tiers retain the history per the policy, so
    dropping expired fine buckets loses nothing the policy wants kept
    (operators/retention.py docstring; this is its store-level twin).

    Side states (``hll_<tier>``, ``hist_<tier>``) expire with their base
    tier. Every retired day commits a ``retired_<tier>`` manifest row, so
    stale-day detection never resurrects an expired day as "missing".

    Returns {tier: [retired days]}."""
    import shutil

    from ..operators.gorilla import gorilla_pack
    from ..operators.retention import DEFAULT_POLICY

    policy = policy or DEFAULT_POLICY
    manifest = os.path.join(store_root, "_manifest")
    retired: dict[str, list[str]] = {}
    t0 = time.time()
    for tier, keep_seconds in policy.items():
        if keep_seconds is None:
            continue
        cutoff = (
            pd_timestamp(now_day) - pd_timedelta(seconds=keep_seconds)
        ).strftime("%Y-%m-%d")
        tier_dirs = [tier] + [
            f"{p}{tier}" for p in side_prefixes
            if os.path.isdir(os.path.join(store_root, f"{p}{tier}"))
        ]
        for tdir in tier_dirs:
            root = os.path.join(store_root, tdir)
            if not os.path.isdir(root):
                continue
            days = sorted(
                d.split("=", 1)[1]
                for d in os.listdir(root)
                if d.startswith("day=")
            )
            for day in days:
                if day >= cutoff:
                    continue
                part = os.path.join(root, f"day={day}")
                if tdir == tier and tier in cold_pack_tiers:
                    # round-5 ADVICE fix: land the cold blob in a DOT-prefixed
                    # temp (invisible to Spark file listing), finalize with one
                    # atomic rename BEFORE dropping the hot partition. A crash
                    # at any point leaves either (hot only), (hot + finalized
                    # cold) — which read_tier_with_cold de-dupes by excluding
                    # cold days whose hot partition still exists — or (cold
                    # only). No window loses the day or double-counts it.
                    cold_root = os.path.join(store_root, f"cold_{tier}")
                    cold_tmp = os.path.join(cold_root, f".day={day}.pack.tmp")
                    cold_final = os.path.join(cold_root, f"day={day}")
                    expiring = spark.read.parquet(part).withColumn(
                        "_day", F.lit(day)
                    )
                    if sdt_comp_dev is not None:
                        # OPT-IN LOSSY historian compression (explicitly off
                        # by default): swinging-door keeps only the points
                        # needed to reconstruct the day within
                        # ±2*sdt_comp_dev by linear interpolation
                        # (operators/downsample.swinging_door docstring);
                        # first/last per series always survive. The PI-style
                        # ancient-data trade: cold blobs shrink further,
                        # exact point identity is given up knowingly.
                        from ..operators.downsample import swinging_door

                        with_id = expiring.withColumn(
                            "_sdt_id",
                            F.concat_ws(
                                ":",
                                F.col(key).cast("string"),
                                F.unix_micros(
                                    F.col("bucket_ts").cast("timestamp")
                                ).cast("string"),
                            ),
                        )
                        kept = swinging_door(
                            with_id, key=key, ts_col="bucket_ts",
                            val_col=value_col, id_col="_sdt_id",
                            comp_dev=sdt_comp_dev,
                        ).filter(F.col("kept") == 1).select("_sdt_id")
                        expiring = with_id.join(kept, "_sdt_id").drop("_sdt_id")
                    packed = gorilla_pack(expiring, [key, "_day"], "bucket_ts", value_col)
                    packed.write.mode("overwrite").parquet(cold_tmp)
                    if os.path.isdir(cold_final):
                        shutil.rmtree(cold_final)  # re-run after crash
                    os.rename(cold_tmp, cold_final)
                n = spark.read.parquet(part).count()
                shutil.rmtree(part)
                commit_partition(
                    spark, manifest, "retention", f"retired_{tdir}", day, n,
                    wall_s=time.time() - t0,
                )
                retired.setdefault(tdir, []).append(day)
    return retired


def pd_timestamp(day: str):
    import pandas as pd

    return pd.Timestamp(day)


def pd_timedelta(**kw):
    import pandas as pd

    return pd.Timedelta(**kw)


def compact_store(
    spark: SparkSession,
    store_root: str,
    target_bytes: int = 128 * 1024 * 1024,
    tiers: tuple[str, ...] | None = None,
) -> dict:
    """Small-file compaction for the tier store — every refresh writes a
    day partition with one file per shuffle task, so a long-lived store
    accumulates many tiny parquet files per day (the classic streaming/
    incremental-ingest problem; at scale this is what an Iceberg
    rewrite_data_files action does). Each day directory whose file count
    exceeds ceil(bytes/target) is rewritten to that many files via
    coalesce — data unchanged (row-identity pytest-pinned), then swapped
    in. Idempotent: a compacted day is skipped on the next pass.

    Crash-safety (round-5 ADVICE fix): the rewrite lands in a DOT-prefixed
    temp dir (`.day=D.compact.tmp`) — Spark's file listing ignores
    dot/underscore-prefixed paths, so a concurrent or post-crash
    `read_tier` never sees it as a `day=` partition (the old name
    `day=D.compact.tmp` WAS discovered as a real partition and
    double-counted the day). The swap is rename-rename: old partition is
    renamed aside to `.day=D.compact.old` (single rename — atomic on
    POSIX), the temp renamed in, then the old copy deleted. Every crash
    point leaves at most ONE visible copy of the day; `_recover_compact`
    restores the `.old` copy on the next pass if the crash landed in the
    one window where the day is briefly invisible.

    Returns {tier: {day: (files_before, files_after)}}."""
    import math
    import shutil

    out: dict[str, dict[str, tuple[int, int]]] = {}
    roots = tiers or [
        d for d in os.listdir(store_root)
        if os.path.isdir(os.path.join(store_root, d)) and not d.startswith("_")
    ]
    for tdir in roots:
        root = os.path.join(store_root, tdir)
        _recover_compact(root)
        for dname in sorted(os.listdir(root)):
            if not dname.startswith("day="):
                continue
            part = os.path.join(root, dname)
            files = [
                f for f in os.listdir(part)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            size = sum(os.path.getsize(os.path.join(part, f)) for f in files)
            want = max(1, math.ceil(size / target_bytes))
            if len(files) <= want:
                continue
            df = spark.read.parquet(part)
            tmp = os.path.join(root, "." + dname + ".compact.tmp")
            old = os.path.join(root, "." + dname + ".compact.old")
            df.coalesce(want).write.mode("overwrite").parquet(tmp)
            os.rename(part, old)
            os.rename(tmp, part)
            shutil.rmtree(old)
            out.setdefault(tdir, {})[dname.split("=", 1)[1]] = (len(files), want)
    return out


def _recover_compact(root: str) -> None:
    """Repair a tier root after a compact_store crash: a `.day=D.compact.old`
    whose visible `day=D` is missing means the crash hit between the two
    renames — restore the old copy (the rewrite is re-done next pass).
    Orphaned `.compact.tmp`/`.compact.old` dirs (visible partition intact)
    are stale debris — delete them."""
    import shutil

    for dname in list(os.listdir(root)):
        if not dname.startswith(".day="):
            continue
        hidden = os.path.join(root, dname)
        if dname.endswith(".compact.old"):
            visible = os.path.join(root, dname[1:-len(".compact.old")])
            if not os.path.exists(visible):
                os.rename(hidden, visible)
            else:
                shutil.rmtree(hidden)
        elif dname.endswith(".compact.tmp"):
            shutil.rmtree(hidden)


def read_tier_with_cold(
    spark: SparkSession,
    store_root: str,
    tier: str,
    value_col: str = "sum_lat",
    key: str = "conv_id",
) -> DataFrame:
    """Full-history read of a tier after retention sweeps: hot day
    partitions as-is, UNION the Gorilla cold blobs unpacked back to
    (key, bucket_ts, value). Cold rows carry is_cold=true and only the
    packed value column (the TTL policy's documented trade: expired fine
    buckets keep one metric in cold, full state lives in the coarser
    tiers). Day-pruned scans on both sides, no join.

    Crash-consistency (round-5 ADVICE fix): a cold day whose HOT partition
    still exists (retention_sweep crashed between cold finalize and hot
    drop) is excluded from the cold side — the hot copy wins, so the day
    is never returned twice; the next sweep completes the drop.

    If the sweep ran with ``sdt_comp_dev`` set, cold days are the LOSSY
    swinging-door keep-set: reads return the kept points only, and the
    day's full shape is recoverable within ±2·comp_dev by interpolating
    between them — callers that need exact history must keep the tier hot
    (or sweep with the default lossless packing)."""
    from ..operators.gorilla import gorilla_unpack

    hot = read_tier(spark, store_root, tier).select(
        key, "bucket_ts", F.col(value_col), F.lit(False).alias("is_cold")
    )
    cold_root = os.path.join(store_root, f"cold_{tier}")
    if not os.path.isdir(cold_root):
        return hot
    hot_root = os.path.join(store_root, tier)
    hot_days = {
        d.split("=", 1)[1]
        for d in (os.listdir(hot_root) if os.path.isdir(hot_root) else [])
        if d.startswith("day=")
    }
    cold_src = spark.read.option("basePath", cold_root).parquet(cold_root)
    overlap = sorted(
        hot_days
        & {
            d.split("=", 1)[1]
            for d in os.listdir(cold_root)
            if d.startswith("day=")
        }
    )
    if overlap:
        cold_src = cold_src.filter(~F.col("day").cast("string").isin(overlap))
    cold = gorilla_unpack(cold_src).select(
        F.split("series_id", r"\|")[0].alias(key),
        F.col("ts").alias("bucket_ts"),
        F.col("value").alias(value_col),
        F.lit(True).alias("is_cold"),
    )
    return hot.unionByName(cold)
