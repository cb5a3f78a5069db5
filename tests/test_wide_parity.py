"""Wide-table (Experiment-1 shape) end-to-end parity: the engine's grouped
per-column pass must equal a pure-reference-semantics oracle run on the F2
fixture (hourly, gap-free, 7 columns — FIXTURES.md F2, SURVEY §3.1)."""

import numpy as np
import pandas as pd
import pytest

from timeseriestokenizer_spark.operators.wide import melt_wide, tokenize_wide
from timeseriestokenizer_spark.oracle import numpy_oracle as O

COLS = ["HUFL", "HULL", "MUFL", "MULL", "LUFL", "LULL", "OT"]
N_ROWS = 500
N = 50
VOCAB = 120


@pytest.fixture(scope="module")
def etth1_like(spark):
    # hourly, starts at 07:00 so the first-midnight anchor is exercised
    ts = pd.date_range("2026-01-01 07:00:00", periods=N_ROWS, freq="h")
    h = np.arange(N_ROWS)
    data = {"date": ts}
    for i, c in enumerate(COLS):
        data[c] = np.sin(2 * np.pi * h / 24) * (i + 1) + 0.1 * np.cos(h / 7 + i)
    pdf = pd.DataFrame(data)
    return spark.createDataFrame(pdf), pdf


def _oracle_column(values, ts, N, vocab, hour_toks=24):
    mean, std = O.fit_scaler(values)
    scaled = O.scale(values, mean, std)
    edges = O.equal_width_edges(scaled, N - 2)
    symbols = O.digitize_tokens(scaled, edges)
    ts_s = ts.astype("datetime64[s]").astype(np.int64)
    spine, is_pad, is_ebos = O.mark_special_tokens_spine(ts_s, 3600, hour_toks)
    assert not is_pad.any()  # gap-free fixture
    special_at = {int(p): N for p in np.nonzero(is_ebos)[0]}
    base = O.insert_special_tokens(symbols, special_at)
    model = O.TpeModel(N)
    encoded = model.train(base, vocab)
    return mean, std, edges, base, model, encoded


def test_melt_shape(spark, etth1_like):
    wide, pdf = etth1_like
    long = melt_wide(wide).toPandas()
    assert len(long) == N_ROWS * len(COLS)
    assert set(long["series_id"]) == set(COLS)
    got = long[long.series_id == "OT"].sort_values("ts")["value"].to_numpy()
    assert np.array_equal(got, pdf["OT"].to_numpy())


def test_wide_tokenize_matches_oracle(spark, etth1_like):
    wide, pdf = etth1_like
    arts = {r["series_id"]: r for r in tokenize_wide(wide, N=N, target_vocab=VOCAB).collect()}
    assert set(arts) == set(COLS)
    ts = pdf["date"].to_numpy()
    for c in COLS:
        mean, std, edges, base, model, encoded = _oracle_column(
            pdf[c].to_numpy(), ts, N, VOCAB
        )
        a = arts[c]
        assert a["mean"] == pytest.approx(mean, abs=1e-12)
        assert a["std"] == pytest.approx(std, abs=1e-12)
        assert np.array_equal(np.asarray(a["edges"]), edges)
        assert list(a["base_tokens"]) == base        # incl. EBOS insert drift
        got_merges = {(m["left"], m["right"]): m["id"] for m in a["merges"]}
        assert got_merges == model.merges
        assert list(a["encoded_tokens"]) == encoded
        assert a["compression"] > 1.2


def test_ebos_ids_present_and_count(spark, etth1_like):
    wide, pdf = etth1_like
    arts = tokenize_wide(wide, N=N, target_vocab=N).collect()  # 0 merges
    ts_s = pdf["date"].to_numpy().astype("datetime64[s]").astype(np.int64)
    _, _, is_ebos = O.mark_special_tokens_spine(ts_s, 3600, 24)
    for a in arts:
        base = list(a["base_tokens"])
        assert base.count(N) == int(is_ebos.sum())  # one EBOS id per marked slot
        assert len(base) == N_ROWS + int(is_ebos.sum())  # inserts lengthen


def test_insert_drift_semantics():
    """The raw-index insert drift (SURVEY §4.3.5) — verbatim reference quirk."""
    out = O.insert_special_tokens([10, 11, 12, 13], {0: 99, 2: 99})
    assert out == [99, 10, 99, 11, 12, 13]  # second special drifts before 11


def test_wide_321_columns(spark):
    """Electricity-width fanout (reference process_all_results.py:32: 321
    value columns): the melt + grouped per-column chain must emit one
    artifact row per column and match the numpy oracle bit-for-bit on
    sampled columns at this width — the shape where grouped-map dispatch
    and melt fanout could regress. Wall at 2000 rows is recorded by
    tools/bench_wide.py (BENCH/wide321.json)."""
    n_rows, n_cols = 200, 321
    ts = pd.date_range("2026-01-01 07:00:00", periods=n_rows, freq="h")
    h = np.arange(n_rows)
    rng = np.random.RandomState(41)
    data = {"date": ts}
    for i in range(n_cols):
        data[f"MT_{i:03d}"] = (
            np.sin(2 * np.pi * h / 24 + i) * (1 + i % 9)
            + 0.1 * rng.standard_normal(n_rows)
        )
    pdf = pd.DataFrame(data)
    wide = spark.createDataFrame(pdf)
    assert len(wide.columns) == n_cols + 1
    art = {r["series_id"]: r for r in tokenize_wide(wide, N=50, target_vocab=150).collect()}
    assert len(art) == n_cols
    for col in ("MT_000", "MT_160", "MT_320"):
        mean, std, edges, base, model, encoded = _oracle_column(
            pdf[col].to_numpy(np.float64), ts.to_numpy(), 50, 150
        )
        r = art[col]
        assert (r["mean"], r["std"]) == (mean, std)
        assert r["edges"] == list(map(float, edges))
        assert list(r["base_tokens"]) == [int(x) for x in base]
        assert list(r["encoded_tokens"]) == [int(x) for x in encoded]
