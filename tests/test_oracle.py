"""Unit tests for the vendored NumPy oracle itself — the reference's
documented examples and invariants (SURVEY.md §5.1)."""

import numpy as np
import pytest

from timeseriestokenizer_spark.oracle import numpy_oracle as O


def test_get_stats_doc_example():
    # utils/base.py:16 docstring example
    assert O.get_stats([1, 2, 3, 1, 2]) == {(1, 2): 2, (2, 3): 1, (3, 1): 1}


def test_merge_doc_example():
    # utils/base.py:29 docstring example
    assert O.merge_pair([1, 2, 3, 1, 2], (1, 2), 4) == [4, 3, 4]


def test_tpe_worked_example():
    """docs/TPE_EXPLAINED.md worked example: input
    [10,15,10,15,10,15,20,25,20,25], vocab 200, 3 merges →
    (10,15)->201, (201,201)->202, (20,25)->203; encode [202,201,203,203]."""
    seq = [10, 15, 10, 15, 10, 15, 20, 25, 20, 25]
    m = O.TpeModel(200)
    out = m.train(seq, 203)
    assert m.merges == {(10, 15): 201, (201, 201): 202, (20, 25): 203}
    assert out == [202, 201, 203, 203]
    assert m.encode(seq) == [202, 201, 203, 203]
    assert m.decode(out) == seq  # round-trip identity


def test_tpe_tie_break_first_seen():
    # (1,2) and (3,4) both occur twice; dict order → (1,2) first seen wins
    seq = [1, 2, 3, 4, 1, 2, 3, 4]
    m = O.TpeModel(10)
    m.train(seq, 11)
    assert m.merges == {(1, 2): 11}


def test_tpe_auto_bump_vocab():
    m = O.TpeModel(5)
    m.train([7, 7, 7, 7], 9)
    assert m.actual_vocab_size == 7
    assert list(m.merges.values()) == [8, 9]


def test_tpe_encode_lowest_rank_first():
    # encode must apply merges by rank order, not greedy count
    m = O.TpeModel(10, {(1, 2): 11, (11, 3): 12})
    assert m.encode([1, 2, 3, 1, 2, 3]) == [12, 12]
    assert m.decode([12, 12]) == [1, 2, 3, 1, 2, 3]


def test_simple_discretize_range():
    data = np.linspace(-3, 3, 100)
    sym, edges = O.simple_discretize(data, N=50)
    assert len(edges) == 50
    assert sym.min() == 1 and sym.max() == 49  # in-range → 1..n_bins-1


def test_decode_round_trip_bin_centers():
    data = np.array([0.0, 1.0, 2.0, 3.0, 10.0])
    sym, edges = O.simple_discretize(data, N=6)
    dec = O.decode_tokens(sym, edges)
    centers = O.bin_centers(edges)
    for d in dec:
        assert any(np.isclose(d, c) for c in centers)
    # re-quantizing the decode reproduces the symbols exactly
    assert np.array_equal(O.digitize_tokens(np.array(dec), edges), sym)


def test_decode_extrapolation_branches():
    edges = np.array([0.0, 1.0, 2.0])
    # s==0 → below; s>=len(edges) → above; specials skipped
    out = O.decode_tokens([0, 1, 2, 3, 99], edges, special_token_ids={99})
    assert out[0] == pytest.approx(-0.5)
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(1.5)
    assert out[3] == pytest.approx(2.5)
    assert len(out) == 4  # special skipped → shorter


def test_scaler_population_std():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    mean, std = O.fit_scaler(x)
    assert mean == pytest.approx(2.5)
    assert std == pytest.approx(np.std(x, ddof=0))
    z = O.scale(x, mean, std)
    assert np.allclose(O.inverse_scale(z, mean, std), x, atol=1e-12)


def test_scaler_zero_std_guard():
    mean, std = O.fit_scaler(np.array([5.0, 5.0]))
    assert std == 1.0


def test_fvocab_5dp_quantization():
    edges = np.array([0.123456789, 1.999999999])
    q = O.fvocab_quantize(edges)
    assert q[0] == 0.12346 and q[1] == 2.0


def test_adaptive_bins_edge_count_and_density():
    rng = np.random.RandomState(0)
    x = np.concatenate([rng.normal(0, 0.1, 900), rng.uniform(5, 10, 100)])
    edges, sym, alloc = O.adaptive_bins_discretize(x, N=20, K=4)
    assert len(edges) == 20
    assert alloc.sum() == 20
    assert alloc[0] > alloc[-1]  # denser region gets more bins
    assert sym.min() >= 1


def test_mark_special_tokens_spine():
    # hourly series starting 23:00, 5 slots, 1 gap at 01:00
    base = 1767222000  # 2025-12-31T23:00:00Z — %86400 != 0
    ts = np.array([base, base + 3600, base + 3 * 3600, base + 4 * 3600])
    spine, is_pad, is_ebos = O.mark_special_tokens_spine(ts, 3600, hour_toks=24)
    assert len(spine) == 5
    assert is_pad.tolist() == [False, False, True, False, False]
    # first midnight = base+3600 → EBOS there (elapsed 0 % 24 == 0)
    assert is_ebos.tolist() == [False, True, False, False, False]


def test_metrics_reference_semantics():
    trues = np.array([1.0, 2.0, 0.0, np.nan])
    preds = np.array([1.5, 2.0, 1.0, 3.0])
    m = O.calculate_metrics(trues, preds)
    assert m["valid_samples"] == 3
    assert m["MSE"] == pytest.approx(np.mean([0.25, 0.0, 1.0]))
    # zero true → denominator 1 (guard)
    assert m["MAPE"] == pytest.approx(np.mean([0.5, 0.0, 1.0]) * 100)
    assert m["RMSE"] == pytest.approx(np.sqrt(m["MSE"]))


def test_metrics_empty():
    m = O.calculate_metrics([np.nan], [1.0])
    assert m["valid_samples"] == 0 and np.isnan(m["MSE"])


def test_chronos_rebin_convention():
    # transform_with_chronos_vocab.py:188-194: digitize no right, no +1, clipped
    edges = np.array([0.0, 1.0, 2.0, 3.0])
    x = np.array([-5.0, 0.5, 1.5, 99.0])
    sym = O.chronos_rebin(x, edges)
    assert sym.tolist() == [0, 0, 1, 2]
