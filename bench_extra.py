"""Per-query isolation harness for optimization work (guide §1.4).

NOT the driver bench — bench.py is frozen. This file times individual
contract queries with the noop sink under the same session config as
bench.py, optionally several reps, and can dump .explain("formatted")
plans to plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...            # time queries, 3 reps each
  python bench_extra.py --reps 5 q1          # more reps
  python bench_extra.py --plan before q1 q2  # also write plans/r06/<q>_before.txt
  python bench_extra.py --all-headline       # the 14 headline queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseriestokenizer_spark import contract  # noqa: E402
from timeseriestokenizer_spark.session import get_spark, python_stage_conf  # noqa: E402

HEADLINE = [
    "rollup_1m", "rollup_1h_cascade", "rollup_1d", "latency", "gapfill_locf",
    "quantize_tokens", "dequantize_recon", "tpe_compression",
    "gorilla_roundtrip", "minhash_dedup_pairs", "doc_simhash",
    "ann_bruteforce", "pricing_summary", "revenue_by_nation",
]


def main():
    args = sys.argv[1:]
    reps = 3
    plan_tag = None
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plan":
            plan_tag = args[i + 1]; i += 2
        elif a == "--all-headline":
            names.extend(HEADLINE); i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus), extra_conf=python_stage_conf(),
    )
    for tbl in ["events", "documents", "embeddings", "lineitem", "orders"]:
        contract.load(spark, sf_dir, tbl).count()

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = contract.QUERIES[name]
        if plan_tag:
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{plan_tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for _ in range(reps):
            # bench.py runs each query ONCE in a fresh session: queries that
            # .cache() intermediates must not get cross-rep cache reuse here
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"times": times, "min": min(times), "median": sorted(times)[len(times) // 2]}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
