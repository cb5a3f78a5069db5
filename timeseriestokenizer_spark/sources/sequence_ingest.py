"""Sequence-column ingest: the Spark twin of the reference's HF→long-format
converter (download_chronos_to_csv.py:18-30 `to_pandas_long` and its chunked
variants at :33-66): find every array-typed ("Sequence") column and explode
them in LOCKSTEP so each output row is one timestamped observation, scalar
columns repeated.

Spark-first mapping:
* pandas ``df.explode(sequence_columns)`` → ``arrays_zip`` (positional
  struct-of-arrays zip) + ``posexplode_outer``. One narrow generator, no
  shuffle; the chunked-streaming variants of the reference collapse to
  ordinary partition-wise execution (S3) — Spark never holds the exploded
  frame in one memory image.
* the emitted ``seq_pos`` column is the within-series ordinal — the
  deterministic order anchor (survey O5/W7) that pandas keeps implicitly in
  the index.

Semantics deltas from pandas.explode, both deliberate:
* ragged arrays: pandas RAISES on mismatched element counts; arrays_zip
  pads the shorter arrays with NULL (at 100 TB a single bad row must not
  kill the job — filter ``value IS NULL`` downstream or pre-validate).
* empty/NULL arrays: one row with NULL elements and NULL seq_pos
  (posexplode_outer), mirroring pandas' NaN row for empty lists.
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_columns(df: DataFrame) -> list[str]:
    """Array-typed columns — the schema-driven twin of the reference's
    ``isinstance(ds.features[col], datasets.Sequence)`` probe."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)]


def explode_sequence_columns(
    df: DataFrame, seq_cols: list[str] | None = None, pos_col: str = "seq_pos"
) -> DataFrame:
    """Long format: every array column exploded in lockstep (same position →
    same row), scalar columns repeated, ``pos_col`` carrying the ordinal."""
    if seq_cols is None:
        seq_cols = sequence_columns(df)
    if not seq_cols:
        return df
    scalar = [c for c in df.columns if c not in seq_cols]
    zipped = F.arrays_zip(*[F.col(c) for c in seq_cols])
    out = df.select(
        *scalar, F.posexplode_outer(zipped).alias(pos_col, "_zipped")
    )
    return out.select(
        *scalar, pos_col, *[F.col("_zipped")[c].alias(c) for c in seq_cols]
    )
