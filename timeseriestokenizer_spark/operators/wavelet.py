"""Multi-level Haar wavelet transform per series — the average/difference
pyramid: level-k approximation = block mean over 2^k points, detail =
(left-half sum − right-half sum)/2^k. The multi-resolution compaction
companion to PAA/SAX (operators/downsample.py): approx is a downsample,
detail is the information you'd lose, and one level inverts exactly as
x_even = a + d, x_odd = a − d.

Graft-new (the reference downsamples by rebinning only — SURVEY.md §2
A3/F13); standard public construction (Haar 1910; the unnormalized
average/difference convention, as in Burrus et al., "Introduction to
Wavelets").

Scale shape: ONE exchange — series become time-ordered arrays
(operators/trend._series_values), every level's coefficients are built
row-locally with transform/aggregate/slice higher-order functions, and
inline() explodes the concatenated levels. Level count is a parameter
(plan size linear in L); trailing elements that don't fill a block at a
given level are truncated at THAT level only.

Float contract: block sums are exact BIGINTs on integer input; the one
division per coefficient is by the dyadic 2^k, so every emitted double
is exact — hash-identical across engines, no rounding."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .trend import _series_values


def haar_dwt(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    levels: int = 3,
) -> DataFrame:
    """(key, level, idx, approx, detail): Haar coefficients for levels
    1..``levels``; level k yields floor(n / 2^k) full blocks."""
    if not 1 <= levels <= 16:
        raise ValueError("levels must be in [1, 16]")
    arr = _series_values(df, key, ts_col, val_col, id_col)
    level_arrays = []
    for k in range(1, levels + 1):
        blk, half = 1 << k, 1 << (k - 1)
        level_arrays.append(
            f"""CASE WHEN size(vs) >= {blk} THEN
              transform(
                sequence(0, CAST(size(vs) AS INT) DIV {blk} - 1),
                b -> named_struct(
                  'level', {k},
                  'idx', CAST(b AS BIGINT),
                  'approx',
                    CAST(aggregate(slice(vs, b * {blk} + 1, {blk}),
                                   CAST(0 AS BIGINT), (a, x) -> a + x)
                         AS DOUBLE) / CAST({blk} AS DOUBLE),
                  'detail',
                    CAST(aggregate(slice(vs, b * {blk} + 1, {half}),
                                   CAST(0 AS BIGINT), (a, x) -> a + x)
                       - aggregate(slice(vs, b * {blk} + {half} + 1, {half}),
                                   CAST(0 AS BIGINT), (a, x) -> a + x)
                         AS DOUBLE) / CAST({blk} AS DOUBLE)))
            ELSE array() END"""
        )
    coeffs = "inline(concat(" + ", ".join(level_arrays) + "))"
    return arr.select(F.col(key), F.expr(coeffs))
