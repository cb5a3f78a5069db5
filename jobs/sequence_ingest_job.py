"""Runnable ingest job: array-typed ("Sequence") parquet → long format —
the Spark twin of the reference's HF-export converter
(download_chronos_to_csv.py:18-66), run via spark-submit:

    python tools/build_pyfiles.py   # -> dist/timeseriestokenizer_spark.zip
    spark-submit --driver-memory 6g --py-files dist/timeseriestokenizer_spark.zip \
        jobs/sequence_ingest_job.py --input <array_parquet> --output <dir> \
        [--seq-cols timestamp,target] [--repartition N]

Sequence columns default to every array-typed column in the schema (the
reference's datasets.Sequence probe). --repartition spreads the pre-explode
rows when the source has few row groups (one series row explodes to
thousands of observations — a single-row-group file would otherwise pin the
whole explosion to one task; CLAUDE.md gotcha).
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow plain `python jobs/<job>.py` without --py-files (spark-submit with
# --py-files and in-process test callers are unaffected)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--seq-cols", default=None, help="comma list; default = all array cols")
    p.add_argument("--repartition", type=int, default=0)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from timeseriestokenizer_spark.sources.sequence_ingest import (
        explode_sequence_columns,
        sequence_columns,
    )

    spark = SparkSession.builder.appName("tts-sequence-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    df = spark.read.parquet(args.input)
    if args.repartition:
        df = df.repartition(args.repartition)
    seq_cols = args.seq_cols.split(",") if args.seq_cols else sequence_columns(df)
    long_df = explode_sequence_columns(df, seq_cols)
    long_df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({
        "job": "sequence_ingest",
        "seq_cols": seq_cols,
        "rows_out": n,
        "wall_s": round(time.time() - t0, 3),
    }))


if __name__ == "__main__":
    main()
