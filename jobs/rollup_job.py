"""Production entry point: tiered rollup over a transcript table, resumable,
run via spark-submit:

    python tools/build_pyfiles.py   # -> dist/timeseriestokenizer_spark.zip
    spark-submit --driver-memory 6g --py-files dist/timeseriestokenizer_spark.zip \
        jobs/rollup_job.py --input <transcripts_parquet> --output <dir> \
        --manifest <dir>/manifest --tiers 1m,5m,1h,1d --run-id r1

On a cluster the same invocation works unchanged (master from spark-submit);
per-partition progress commits to the manifest so a killed run resumes
without double-counting (plans/manifest.py).
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow plain `python jobs/<job>.py` without --py-files (spark-submit with
# --py-files and in-process test callers are unaffected)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--tiers", default="1m,5m,1h,1d")
    p.add_argument("--run-id", default="run")
    p.add_argument("--salts", type=int, default=0, help=">0 enables salted agg")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from timeseriestokenizer_spark.functions.signals import signals_narrow
    from timeseriestokenizer_spark.plans.manifest import resumable_rollup

    spark = SparkSession.builder.appName("tts-rollup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    transcripts = spark.read.parquet(args.input)
    signals = signals_narrow(transcripts)
    n_turns = transcripts.count()

    computed = {}
    for tier in args.tiers.split(","):
        computed[tier] = resumable_rollup(
            spark,
            signals,
            tier,
            f"{args.output}/tier={tier}",
            args.manifest,
            run_id=args.run_id,
        )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / wall),
                "computed_partitions": {k: len(v) for k, v in computed.items()},
                "wall_s": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
