"""Gap-fill / <PAD> / LOCF / <EBOS> vs the oracle spine (SURVEY §5.2.5)."""

import numpy as np
import pandas as pd

from timeseriestokenizer_spark.oracle import numpy_oracle as O
from timeseriestokenizer_spark.operators.gapfill import (
    calendar_spine,
    gap_fill,
    gap_fill_with_markers,
)


def _mk_df(spark, rows, cols=("series_id", "ts", "v")):
    return spark.createDataFrame(pd.DataFrame(rows, columns=list(cols)))


def test_spine_dense(spark):
    rows = [
        ("a", pd.Timestamp("2026-01-01 00:00:00"), 1.0),
        ("a", pd.Timestamp("2026-01-01 03:00:00"), 2.0),
    ]
    spine = calendar_spine(_mk_df(spark, rows), "series_id", "ts", 3600).toPandas()
    assert len(spine) == 4
    assert spine["slot_ts"].is_monotonic_increasing


def test_gapfill_pad_and_locf(spark):
    rows = [
        ("a", pd.Timestamp("2026-01-01 00:00:00"), 1.0),
        ("a", pd.Timestamp("2026-01-01 01:00:00"), 2.0),
        ("a", pd.Timestamp("2026-01-01 04:00:00"), 5.0),
        ("b", pd.Timestamp("2026-01-02 10:00:00"), 9.0),
    ]
    out = (
        gap_fill(_mk_df(spark, rows), "series_id", "ts", ["v"], 3600)
        .orderBy("series_id", "slot_ts")
        .toPandas()
    )
    a = out[out.series_id == "a"]
    assert a["is_pad"].tolist() == [False, False, True, True, False]
    assert a["v"].tolist() == [1.0, 2.0, 2.0, 2.0, 5.0]  # LOCF
    b = out[out.series_id == "b"]
    assert len(b) == 1 and not b["is_pad"].iloc[0]


def test_gapfill_no_locf_keeps_nulls(spark):
    rows = [
        ("a", pd.Timestamp("2026-01-01 00:00:00"), 1.0),
        ("a", pd.Timestamp("2026-01-01 02:00:00"), 3.0),
    ]
    out = (
        gap_fill(_mk_df(spark, rows), "series_id", "ts", ["v"], 3600, locf=False)
        .orderBy("slot_ts")
        .toPandas()
    )
    assert np.isnan(out["v"].iloc[1])


def test_ebos_matches_oracle_spine(spark):
    """Hourly series crossing midnight, 12h EBOS period — engine flags equal
    the oracle twin of mark_special_tokens (utils/discretisize.py:282-319)."""
    base = pd.Timestamp("2025-12-31 20:00:00")
    present = [0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 14, 15, 16, 17, 18]  # gaps at 4, 11-13
    rows = [("s", base + pd.Timedelta(hours=h), float(h)) for h in present]
    out = (
        gap_fill_with_markers(
            _mk_df(spark, rows), "series_id", "ts", ["v"], 3600, hour_toks=12
        )
        .orderBy("slot_ts")
        .toPandas()
    )
    ts_sec = np.array(
        [(base + pd.Timedelta(hours=h)).value // 10**9 for h in present], dtype=np.int64
    )
    spine, is_pad, is_ebos = O.mark_special_tokens_spine(ts_sec, 3600, hour_toks=12)
    assert len(out) == len(spine)
    assert out["is_pad"].tolist() == is_pad.tolist()
    assert out["is_ebos"].tolist() == is_ebos.tolist()


def test_ebos_no_midnight(spark):
    rows = [
        ("s", pd.Timestamp("2026-01-01 01:00:00"), 1.0),
        ("s", pd.Timestamp("2026-01-01 05:00:00"), 2.0),
    ]
    out = gap_fill_with_markers(
        _mk_df(spark, rows), "series_id", "ts", ["v"], 3600, hour_toks=24
    ).toPandas()
    assert not out["is_ebos"].any()
