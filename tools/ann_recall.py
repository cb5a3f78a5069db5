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

    # --- PQ / IVF-PQ: recall under code compression --------------------
    # ADC ranks by (approximate) EUCLIDEAN distance, so the truth set for
    # these curves is the exact euclidean top-k (numpy on the collected
    # 2000x64 matrix — trivially driver-sized for the measurement; the
    # operators themselves never collect the corpus). Measured on the
    # CLUSTERED corpus (the regime the index is for) and the isotropic
    # one, trained codebooks in both cases.
    from timeseriestokenizer_spark.operators.pq import (
        exact_rerank,
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    def euclid_truth(frame):
        rows = sorted(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
            for r in frame.select("vec_id", "embedding").collect()
        )
        ids = np.array([i for i, _ in rows])
        X = np.stack([v for _, v in rows])
        qmask = ids < 50
        d2 = ((X[qmask][:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
        truth_set = set()
        for qi, qid in enumerate(ids[qmask]):
            dd = d2[qi].copy()
            dd[ids == qid] = np.inf
            for ci in np.argsort(dd, kind="stable")[:k]:
                truth_set.add((int(qid), int(ids[ci])))
        return truth_set

    for tag, frame in (("pq_isotropic", emb), ("pq_clustered", cdf)):
        et = euclid_truth(frame)

        def erecall(rows):
            return sum(
                1 for r in rows if (r["query_id"], r["cand_id"]) in et
            ) / (n_q * k)

        fq = frame.filter(F.col("vec_id") < 50)
        out[tag] = {"flat_adc": [], "ivfpq": []}
        for m_sub, kc in ((8, 16), (8, 64), (16, 256)):
            books = pq_train(frame, m=m_sub, k=kc, sample_n=2000)
            codes = pq_encode(frame, books).cache()
            codes.count()
            t0 = time.time()
            rows = pq_adc_topk(codes, fq, books, k=k).collect()
            wall_adc = time.time() - t0
            # ADC+R: 4x over-fetch shortlist, exact euclidean rerank —
            # the standard refine step; only shortlist rows move
            t0 = time.time()
            short = pq_adc_topk(codes, fq, books, k=4 * k)
            rrows = exact_rerank(short, frame, fq, k=k).collect()
            wall_rr = time.time() - t0
            codes.unpersist()
            out[tag]["flat_adc"].append(
                {
                    "m": m_sub, "k_cent": kc,
                    "code_bytes": m_sub,
                    "recall_at_10": round(erecall(rows), 4),
                    "wall_s": round(wall_adc, 2),
                    "rerank4x_recall_at_10": round(erecall(rrows), 4),
                    "rerank_wall_s": round(wall_rr, 2),
                }
            )
            print(tag, out[tag]["flat_adc"][-1], flush=True)
        cents, rbooks = ivfpq_train(frame, n_cells=n_cells, m=8, k=64,
                                    sample_n=2000)
        enc = ivfpq_encode(frame, cents, rbooks).cache()
        enc.count()
        for n_probe in (1, 2, 4, 8, n_cells):
            t0 = time.time()
            rows = ivfpq_topk(
                enc, fq, cents, rbooks, k=k, n_probe=n_probe
            ).collect()
            wall_adc = time.time() - t0
            t0 = time.time()
            short = ivfpq_topk(
                enc, fq, cents, rbooks, k=4 * k, n_probe=n_probe
            )
            rrows = exact_rerank(short, frame, fq, k=k).collect()
            out[tag]["ivfpq"].append(
                {
                    "n_probe": n_probe, "m": 8, "k_cent": 64,
                    "recall_at_10": round(erecall(rows), 4),
                    "wall_s": round(wall_adc, 2),
                    "rerank4x_recall_at_10": round(erecall(rrows), 4),
                    "rerank_wall_s": round(time.time() - t0, 2),
                    "probed_frac": round(n_probe / n_cells, 3),
                }
            )
            print(tag, out[tag]["ivfpq"][-1], flush=True)
        enc.unpersist()

    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "ann_recall.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)
    spark.stop()


if __name__ == "__main__":
    main()
