"""Incremental tier refresh job: absorb newly appended transcript days into
the 1m/5m/1h/1d (+ HLL distinct) tier store without rescanning history.

    python tools/build_pyfiles.py
    spark-submit --py-files dist/timeseriestokenizer_spark.zip \
        jobs/incremental_refresh_job.py --input <transcripts_parquet> \
        --store <tier_store_dir> [--days 2026-01-05,2026-01-06] [--no-hll]

With no --days, stale days are detected from the manifest (new days plus
days whose raw row count changed — late arrivals). Each refreshed day costs
one partition-pruned scan of that day's raw rows plus a join against the
previous day's conversation-watermark snapshot; completed days are never
read again. Prints one JSON line with the per-day stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow plain `python jobs/incremental_refresh_job.py` without --py-files
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--store", required=True)
    p.add_argument("--days", default=None, help="comma-separated; default: stale days")
    p.add_argument("--hll", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--hist", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--kll", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--heavy", action=argparse.BooleanOptionalAction, default=True)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from timeseriestokenizer_spark.datagen import read_transcripts
    from timeseriestokenizer_spark.plans.incremental import (
        refresh_tiers,
        store_summary,
    )

    spark = SparkSession.builder.appName("tts-incremental-refresh").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    raw = read_transcripts(spark, args.input)
    days = args.days.split(",") if args.days else None
    stats = refresh_tiers(spark, raw, args.store, days=days, with_hll=args.hll,
                          with_hist=args.hist, with_kll=args.kll,
                          with_heavy=args.heavy)
    print(json.dumps({
        "job": "incremental_refresh",
        "refreshed": stats,
        "store": json.loads(store_summary(spark, args.store)),
        "wall_s": round(time.time() - t0, 2),
    }))


if __name__ == "__main__":
    main()
