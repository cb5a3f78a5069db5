"""Scaling-efficiency evidence: run the identical rollup job at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for N and 4N
executors, per BASELINE.json north_rule) on the same on-disk input and report
throughput at both plus efficiency = tput(4N) / (4 * tput(N)).

Protocol:
* input: Spark-native deterministic transcripts (datagen_spark.py), written
  to parquet ONCE — both levels scan the same files.
* each level runs in a fresh subprocess (one JVM per level).
* job: parquet scan → per-turn signals (lag latency, char/token counts) →
  full 1m/5m/1h/1d rollup cascade, all tiers materialized.
* warm-up pass then best-of-3 timing; result row-counts compared across
  levels (determinism check: identical buckets at any parallelism).

Results go to stdout as JSON and are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from timeseriestokenizer_spark.session import get_spark
from timeseriestokenizer_spark.datagen_spark import transcripts_spark
path, convs, avg_len = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark("scaling-gen", master="local[32]", shuffle_partitions=32)
df = transcripts_spark(spark, C=convs, avg_len=avg_len, n_partitions=64)
df.write.mode("overwrite").parquet(path)
print("GEN", spark.read.parquet(path).count())
"""

CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, "/root/repo")
from timeseriestokenizer_spark.session import get_spark
from timeseriestokenizer_spark.functions.signals import signals_narrow
from timeseriestokenizer_spark.operators.rollup import rollup_from_finer, rollup_tier

path, cores = sys.argv[1], int(sys.argv[2])
spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
work = f"/tmp/scaling_tiers_{cores}"

def job():
    # production shape: each tier PERSISTS and the next derives from storage —
    # raw data is scanned exactly once (writing also defeats Catalyst's
    # aggregate pruning, so the full rollup state is really computed)
    shutil.rmtree(work, ignore_errors=True)
    t = spark.read.parquet(path)
    rollup_tier(signals_narrow(t), "1m").write.parquet(f"{work}/1m")
    prev = spark.read.parquet(f"{work}/1m")
    for tier in ["5m", "1h", "1d"]:
        rollup_from_finer(prev, tier).write.parquet(f"{work}/{tier}")
        prev = spark.read.parquet(f"{work}/{tier}")

job()  # warm-up (JIT, codegen, file listing)
counts = {k: spark.read.parquet(f"{work}/{k}").count() for k in ["1m", "5m", "1h", "1d"]}
n = spark.read.parquet(path).count()
best = None
for _ in range(3):
    t0 = time.time()
    job()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cores": cores, "turns": n, "wall_s": round(best, 3),
                  "turns_per_sec": round(n / best), "tier_buckets": counts}))
"""


def main():
    # default 400k convs (~80M turns): the documented protocol size. At the
    # old 60k default (~12M turns) the 32-core run finishes in ~14 s and
    # fixed scheduler/write overhead caps efficiency at ~0.55-0.58 even when
    # the engine scales fine — measured both ways, see BENCH/BASELINE.md §5.
    convs = int(os.environ.get("SCALING_CONVS", "400000"))
    avg_len = int(os.environ.get("SCALING_AVG_LEN", "200"))
    path = os.environ.get("SCALING_PATH", "/tmp/scaling_transcripts_80m")

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen = subprocess.run(
            [sys.executable, "-c", GEN, path, str(convs), str(avg_len)],
            capture_output=True, text=True, timeout=1800,
        )
        assert "GEN" in gen.stdout, gen.stderr[-2000:]

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", CHILD, path, str(cores)],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)

    lo, hi = results[8], results[32]
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
    result = {
        "job": "parquet scan → signals → 1m/5m/1h/1d rollup cascade",
        "input_turns": lo["turns"],
        "local8": lo,
        "local32": hi,
        "speedup_8_to_32": round(hi["turns_per_sec"] / lo["turns_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "identical_results": lo["tier_buckets"] == hi["tier_buckets"],
        "measured_at": __import__("datetime").datetime.now().isoformat(timespec="seconds"),
    }
    print(json.dumps(result))
    # artifact consumed by bench.py — the bench JSON must carry MEASURED
    # scaling numbers, never stale literals (a regression would otherwise
    # keep reporting old evidence as fresh)
    artifact = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "BENCH", "scaling_latest.json")
    with open(artifact, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
