"""`.fvocab` float-vocabulary text format — byte-level parity with the
reference's save_float_vocab / load_float_vocab
(/root/reference/utils/discretisize.py:182-217):

    line 1: ``N=<len(edges)+1>``
    line 2: comma-joined edges at 5-decimal precision

The engine's canonical store is the `vocab` table (series_id, n_bins,
edges array<double>) + broadcast; this text codec exists for parity tests and
for interchange with artifacts produced by the reference pipeline.
"""

from __future__ import annotations

import numpy as np


def save_float_vocab(edges, path: str) -> None:
    edges = np.asarray(edges, dtype=np.float64)
    with open(path, "w") as f:
        f.write(f"N={len(edges) + 1}\n")
        f.write(",".join(f"{x:.5f}" for x in edges))


def load_float_vocab(path: str) -> np.ndarray:
    with open(path) as f:
        first = f.readline().strip()
        assert first.startswith("N="), f"bad .fvocab header: {first!r}"
        n_edges = int(first[2:])
        edges = np.array([float(x) for x in f.readline().strip().split(",")])
    assert len(edges) + 1 == n_edges, "edge count inconsistent with header"
    return edges


def vocab_table(spark, edges_by_series: dict[str, np.ndarray]):
    """Edges dict -> vocab DataFrame (series_id, n_bins, edges)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "series_id": list(edges_by_series),
            "n_bins": [len(v) for v in edges_by_series.values()],
            "edges": [list(map(float, v)) for v in edges_by_series.values()],
        }
    )
    return spark.createDataFrame(pdf)


def vocab_registry(vocab_df) -> dict[str, np.ndarray]:
    return {
        r["series_id"]: np.asarray(r["edges"], dtype=np.float64)
        for r in vocab_df.collect()
    }
