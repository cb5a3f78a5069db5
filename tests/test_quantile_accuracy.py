"""Quantile-edge accuracy A/B (VERDICT r3 item 7): percentile_approx's
guarantee is on RANKS (error <= n/accuracy), and the implied VALUE error
grows with tail skew. This pins the rank bound at several accuracies on a
heavy-tailed distribution and records the value-error blowup the skew
causes — the evidence behind fit_edges' ``accuracy`` knob documentation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.functions.quantize import fit_edges

N = 400_000
N_BINS = 20  # 21 edges


@pytest.fixture(scope="module")
def skewed(spark):
    """One series of N lognormal values (heavy right tail, ~x1000 dynamic
    range) — deterministic, built distributed."""
    h = F.abs(F.xxhash64("id", F.lit(7)))
    # Box-Muller from two uniform hashes → standard normal → lognormal
    u1 = (h % 1_000_000 + 1) / 1_000_001.0
    u2 = (F.abs(F.xxhash64("id", F.lit(8))) % 1_000_000) / 1_000_000.0
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * float(np.pi) * u2)
    df = (
        spark.range(N)
        .select(F.lit("s").alias("series_id"), F.exp(z * 1.5).alias("value"))
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def _rank_error(values_sorted: np.ndarray, edge: float, target_rank: float) -> float:
    actual = np.searchsorted(values_sorted, edge, side="right")
    return abs(actual - target_rank)


def test_rank_error_bounded_by_accuracy(skewed):
    vals = np.sort(
        np.fromiter((r[0] for r in skewed.select("value").collect()), dtype=np.float64)
    )
    probs = np.linspace(0.0, 1.0, N_BINS + 1)
    report = {}
    for accuracy in (1_000, 10_000, 100_000):
        edges = fit_edges(
            skewed, "series_id", "value", N_BINS, kind="quantile", accuracy=accuracy
        )["s"]
        rank_errs = [
            _rank_error(vals, e, p * N) for e, p in zip(edges, probs)
        ]
        val_errs = [
            abs(e - np.quantile(vals, p)) for e, p in zip(edges, probs)
        ]
        report[accuracy] = {
            "max_rank_err": max(rank_errs),
            "bound": N / accuracy,
            "max_value_err": max(val_errs),
            "p999_value_err": abs(edges[-2] - np.quantile(vals, probs[-2])),
        }
        # the documented guarantee (x2 slack: interpolation + fp rounding)
        assert max(rank_errs) <= 2 * N / accuracy + 1, (accuracy, max(rank_errs))
        # min/max edges are exact regardless of accuracy
        assert edges[0] == vals[0] and edges[-1] == vals[-1]
    # raising the knob must tighten ranks monotonically (within noise)
    assert report[100_000]["max_rank_err"] <= report[1_000]["max_rank_err"]
    # skew evidence: the SAME rank error costs far more value error in the
    # tail than in the bulk — value-per-rank spacing around p=0.95 is many
    # times the spacing around the median (a property of the heavy tail,
    # and the reason the knob matters more on skewed corpora)
    d = 0.005
    spacing_tail = np.quantile(vals, 0.95 + d) - np.quantile(vals, 0.95 - d)
    spacing_med = np.quantile(vals, 0.5 + d) - np.quantile(vals, 0.5 - d)
    assert spacing_tail > 3 * spacing_med
    print("quantile accuracy A/B:", report,
          "tail/median spacing:", round(spacing_tail / spacing_med, 1))


def test_exact_at_full_accuracy_small_series(skewed):
    """With accuracy >= n, percentile_approx degrades to near-exact: rank
    error <= 1 on a 10k subsample."""
    small = skewed.limit(10_000).cache()
    vals = np.sort(
        np.fromiter((r[0] for r in small.select("value").collect()), dtype=np.float64)
    )
    n = len(vals)
    edges = fit_edges(
        small, "series_id", "value", N_BINS, kind="quantile", accuracy=50_000
    )["s"]
    probs = np.linspace(0.0, 1.0, N_BINS + 1)
    for e, p in zip(edges, probs):
        assert _rank_error(vals, e, p * n) <= 2
    small.unpersist()
