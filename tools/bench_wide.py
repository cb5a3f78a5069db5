"""Wide-mode fanout at electricity width (round-5 VERDICT item 8).

The reference's widest table is 321 value columns
(/root/reference/process_all_results.py:32 — the electricity dataset);
wide parity was previously tested at 7 columns. This tool runs the full
melt + per-column chain (scaler -> edges -> specials -> TPE train ->
encode) at 321 columns and records the wall, per-column throughput, and
artifact shape into BENCH/wide321.json. Correctness at this width is
pinned by tests/test_wide_parity.py::test_wide_321_columns.

Usage: python tools/bench_wide.py [n_rows]   (default 2000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    import numpy as np
    import pandas as pd

    from timeseriestokenizer_spark.operators.wide import tokenize_wide
    from timeseriestokenizer_spark.session import get_spark

    n_cols = 321
    spark = get_spark("bench-wide", master="local[8]", shuffle_partitions=32)
    ts = pd.date_range("2026-01-01 07:00:00", periods=n_rows, freq="h")
    h = np.arange(n_rows)
    rng = np.random.RandomState(40)
    data = {"date": ts}
    for i in range(n_cols):
        data[f"MT_{i:03d}"] = (
            np.sin(2 * np.pi * h / 24 + i) * (1 + i % 9) + 0.1 * rng.standard_normal(n_rows)
        )
    wide = spark.createDataFrame(pd.DataFrame(data)).cache()
    wide.count()

    t0 = time.time()
    art = tokenize_wide(wide, N=50, target_vocab=300).cache()
    n_art = art.count()
    wall = time.time() - t0
    comp = art.agg({"compression": "avg"}).collect()[0][0]
    out = {
        "n_rows": n_rows,
        "n_cols": n_cols,
        "n_values": n_rows * n_cols,
        "artifact_rows": n_art,
        "wall_s": round(wall, 2),
        "cols_per_s": round(n_cols / wall, 2),
        "values_per_s": round(n_rows * n_cols / wall),
        "avg_compression": round(comp, 3),
    }
    print(json.dumps(out), flush=True)
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "wide321.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)
    spark.stop()


if __name__ == "__main__":
    main()
