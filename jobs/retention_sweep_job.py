"""Retention sweep over an incremental tier store: enforce per-tier TTLs
physically (drop expired day partitions; Gorilla-cold-pack the finest tier
first), per the north rule's rollup + downsample + RETENTION triad.

    python jobs/retention_sweep_job.py --store <tier_store_dir> \
        --now 2026-02-01 [--policy '{"1m": 604800, "5m": 2592000}']

Policy values are keep-seconds per tier (JSON; omitted tiers use
DEFAULT_POLICY; null = keep forever). Prints one JSON line of retired days
per tier. Idempotent: a second sweep retires nothing new.
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True)
    p.add_argument("--now", required=True, help="sweep-as-of day (YYYY-MM-DD)")
    p.add_argument("--policy", default=None, help="JSON {tier: keep_seconds|null}")
    p.add_argument("--cold-pack", default="1m", help="comma list of tiers to cold-pack")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from timeseriestokenizer_spark.operators.retention import DEFAULT_POLICY
    from timeseriestokenizer_spark.plans.incremental import retention_sweep

    spark = SparkSession.builder.appName("tts-retention-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    policy = dict(DEFAULT_POLICY)
    if args.policy:
        policy.update(json.loads(args.policy))
    retired = retention_sweep(
        spark, args.store, args.now, policy=policy,
        cold_pack_tiers=tuple(args.cold_pack.split(",")) if args.cold_pack else (),
    )
    print(json.dumps({
        "job": "retention_sweep",
        "retired": retired,
        "wall_s": round(time.time() - t0, 2),
    }))


if __name__ == "__main__":
    main()
