"""Incremental-refresh crossover vs history length (round-5 VERDICT item 6).

The constant-vs-linear argument for incremental refresh was previously
argued, not measured: at toy scale a one-day refresh (fixed job overhead)
can lose to a scratch rebuild. This tool MEASURES both walls as history
grows — refresh-one-appended-day into an H-day store vs rebuilding all
H+1 days from raw — at H in {10, 20, 40}. Expected shape: refresh ~flat
(one day's scan + fixed overhead), rebuild growing ~linearly with H; the
crossover point is where incremental starts winning and everything right
of it is the scale regime. Writes BENCH/incremental_crossover.json and
prints a table for BENCH/BASELINE.md.

Protocol notes: tier families beyond the core cascade (hll/hist/kll) are
disabled on BOTH sides so the comparison is cascade-vs-cascade; the
store setup for each H is untimed; one warm-up action precedes timing.

Usage: python tools/bench_incremental_crossover.py [C] (default 3000 convs)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    from pyspark.sql import functions as F

    from timeseriestokenizer_spark.datagen_spark import transcripts_spark
    from timeseriestokenizer_spark.functions.signals import signals_narrow
    from timeseriestokenizer_spark.operators.rollup import (
        rollup_from_finer,
        rollup_tier,
    )
    from timeseriestokenizer_spark.plans.incremental import refresh_tiers
    from timeseriestokenizer_spark.session import get_spark

    spark = get_spark(
        "bench-incr-crossover", master="local[8]", shuffle_partitions=32
    )
    raw_all = transcripts_spark(spark, C=C, avg_len=200, seed=42, span_days=45)
    days = sorted(
        str(r["d"])
        for r in raw_all.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    results = []
    for hist in (10, 20, 40):
        if hist + 1 > len(days):
            print(f"skip H={hist}: only {len(days)} days generated")
            continue
        hist_days, new_day = days[:hist], days[hist]
        raw = raw_all.filter(F.to_date("ts") <= F.lit(new_day)).cache()
        n_rows = raw.count()
        store = tempfile.mkdtemp(prefix=f"xover_{hist}_")
        try:
            refresh_tiers(
                spark, raw.filter(F.to_date("ts") < F.lit(new_day)), store,
                with_hll=False, with_hist=False, with_kll=False, with_heavy=False,
            with_cms=False, with_kmv=False,
            )
            t0 = time.time()
            refresh_tiers(
                spark, raw, store, days=[new_day],
                with_hll=False, with_hist=False, with_kll=False, with_heavy=False,
            with_cms=False, with_kmv=False,
            )
            incr_s = time.time() - t0

            work = tempfile.mkdtemp(prefix=f"xover_scratch_{hist}_")
            t0 = time.time()
            rollup_tier(signals_narrow(raw), "1m").write.parquet(f"{work}/1m")
            prev = spark.read.parquet(f"{work}/1m")
            for tier in ["5m", "1h", "1d"]:
                rollup_from_finer(prev, tier).write.parquet(f"{work}/{tier}")
                prev = spark.read.parquet(f"{work}/{tier}")
            scratch_s = time.time() - t0
            shutil.rmtree(work, ignore_errors=True)
        finally:
            shutil.rmtree(store, ignore_errors=True)
            raw.unpersist()
        row = {
            "history_days": hist,
            "total_rows": n_rows,
            "refresh_one_day_s": round(incr_s, 2),
            "scratch_rebuild_s": round(scratch_s, 2),
            "rebuild_over_refresh": round(scratch_s / incr_s, 2),
        }
        results.append(row)
        print(row, flush=True)

    out = {"C": C, "span_days": 45, "rows": results}
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "incremental_crossover.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)
    spark.stop()


if __name__ == "__main__":
    main()
