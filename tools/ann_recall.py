"""ANN recall-vs-cost curve (round-5 VERDICT item 4).

IVF/LSH equality is contract-proven only at exhaustive settings
(n_probe = n_cells degrades to brute force); this tool records what the
NON-exhaustive settings actually buy: recall@10 against the exact
brute-force neighbors, and the wall cost, for n_probe in {1, 2, 4, 8,
n_cells} and for the LSH bucket join at the default band settings.
Writes BENCH/ann_recall.json; the documented-default floor
(recall@10 >= 0.9 at n_probe=4, n_cells=16) is pinned in
tests/test_dedup_similarity.py::test_ivf_default_recall_floor.

Usage: python tools/ann_recall.py [sf_dir]   (default /root/testdata/sf0.1)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from timeseriestokenizer_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        train_centroids,
    )
    from timeseriestokenizer_spark.session import get_spark

    spark = get_spark("ann-recall", master="local[8]", shuffle_partitions=8)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    n_vecs = emb.count()
    queries = emb.filter(F.col("vec_id") < 50).cache()
    n_q = queries.count()
    k = 10

    truth = {
        (r["query_id"], r["cand_id"])
        for r in brute_force_topk(emb, queries, k=k).collect()
    }

    def recall(rows):
        hits = sum(1 for r in rows if (r["query_id"], r["cand_id"]) in truth)
        return hits / (n_q * k)

    n_cells = 16
    cent = train_centroids(emb, n_cells=n_cells)
    out = {
        "sf_dir": sf_dir, "n_vecs": n_vecs, "n_queries": n_q, "k": k,
        "n_cells": n_cells, "ivf": [], "lsh": [],
    }
    for n_probe in (1, 2, 4, 8, n_cells):
        t0 = time.time()
        rows = ivf_topk(emb, queries, cent, k=k, n_probe=n_probe).collect()
        wall = time.time() - t0
        out["ivf"].append(
            {
                "n_probe": n_probe,
                "recall_at_10": round(recall(rows), 4),
                "wall_s": round(wall, 2),
                # candidate work scales with probed fraction — the cost axis
                "probed_frac": round(n_probe / n_cells, 3),
            }
        )
        print(out["ivf"][-1], flush=True)
    for n_planes in (4, 6, 8):
        t0 = time.time()
        rows = lsh_topk(emb, queries, k=k, n_planes=n_planes).collect()
        wall = time.time() - t0
        out["lsh"].append(
            {
                "n_planes": n_planes,
                "recall_at_10": round(recall(rows), 4),
                "wall_s": round(wall, 2),
                "bucket_frac": round(1.0 / (2 ** n_planes), 5),
            }
        )
        print(out["lsh"][-1], flush=True)

    # --- clustered corpus: the regime IVF exists for -------------------
    # The sf embeddings are near-isotropic (uniform synthetic), where ANY
    # cell partitioning scatters true neighbors across cells and recall
    # tracks the probed fraction — the known high-dim degenerate case.
    # Real embedding corpora are clustered; measure that regime too so the
    # default setting carries evidence where it is meant to run.
    import numpy as np

    rng = np.random.RandomState(31)
    centers = rng.normal(0, 1, (16, 32))
    vecs = []
    for i in range(2000):
        c = centers[i % 16]
        vecs.append((i, (c + rng.normal(0, 0.15, 32)).astype(float).tolist(), i % 16))
    cdf = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int"
    ).cache()
    cq = cdf.filter(F.col("vec_id") < 50).cache()
    ctruth = {
        (r["query_id"], r["cand_id"])
        for r in brute_force_topk(cdf, cq, k=k).collect()
    }

    def crecall(rows):
        hits = sum(1 for r in rows if (r["query_id"], r["cand_id"]) in ctruth)
        return hits / (50 * k)

    ccent = train_centroids(cdf, n_cells=n_cells)
    out["ivf_clustered"] = []
    for n_probe in (1, 2, 4, 8, n_cells):
        t0 = time.time()
        rows = ivf_topk(cdf, cq, ccent, k=k, n_probe=n_probe).collect()
        out["ivf_clustered"].append(
            {
                "n_probe": n_probe,
                "recall_at_10": round(crecall(rows), 4),
                "wall_s": round(time.time() - t0, 2),
                "probed_frac": round(n_probe / n_cells, 3),
            }
        )
        print("clustered", out["ivf_clustered"][-1], flush=True)

    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "ann_recall.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)
    spark.stop()


if __name__ == "__main__":
    main()
