"""Property-based tests (hypothesis) for the oracle's core invariants —
pure NumPy, no Spark session needed."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from timeseriestokenizer_spark.operators.gorilla import pack_series, unpack_series
from timeseriestokenizer_spark.oracle import numpy_oracle as O


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=12), min_size=2, max_size=300),
    st.integers(min_value=13, max_value=60),
)
def test_tpe_roundtrip_property(tokens, target):
    m = O.TpeModel(12)
    m.train(list(tokens), target)
    assert m.decode(m.encode(list(tokens))) == list(tokens)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=12), min_size=2, max_size=200),
    st.integers(min_value=13, max_value=40),
)
def test_tpe_train_output_equals_encode(tokens, target):
    """The sequence left after training == encode of the original sequence
    (greedy rank order replays the merge history)."""
    m = O.TpeModel(12)
    out = m.train(list(tokens), target)
    assert m.encode(list(tokens)) == out


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=200,
    ).filter(lambda xs: max(xs) - min(xs) > 1e-3),  # non-degenerate bin width
    st.integers(min_value=3, max_value=64),
)
def test_quantize_dequantize_requantize_fixpoint(values, n_bins):
    """decode(quantize(x)) lands on bin centers; re-quantizing the centers
    reproduces the symbols (quantize ∘ decode is identity on token space)."""
    x = np.array(values)
    sym, edges = O.simple_discretize(x, n_bins)
    dec = np.array(O.decode_tokens(sym, edges))
    assert np.array_equal(O.digitize_tokens(dec, edges), sym)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200),
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1,
        max_size=200,
    ),
)
def test_gorilla_roundtrip_property(deltas, values):
    n = min(len(deltas), len(values))
    ts = np.cumsum(np.array(deltas[:n], dtype=np.int64))
    vals = np.array(values[:n], dtype=np.float64)
    blob = pack_series(ts, vals)
    ts2, v2 = unpack_series(blob)
    assert np.array_equal(ts2, ts)
    assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=2,
        max_size=300,
    ).filter(lambda xs: max(xs) > min(xs))
)
def test_scale_inverse_property(values):
    x = np.array(values)
    mean, std = O.fit_scaler(x)
    assert np.allclose(O.inverse_scale(O.scale(x, mean, std), mean, std), x, atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=20,
        max_size=400,
    ).filter(lambda xs: max(xs) > min(xs)),
    st.integers(min_value=4, max_value=30),
    st.integers(min_value=2, max_value=6),
)
# the round-2 red case: a denormal span ([0, 5e-324]) starves the
# midpoint-split repair (0.5*(lo+hi) rounds back onto a bound) — the
# degenerate-extent pad in adaptive_bins_discretize must keep len == N
@example([0.0] * 19 + [5e-324], 10, 3)
def test_adaptive_bins_edge_count_property(values, n_bins, k):
    edges, sym, alloc = O.adaptive_bins_discretize(np.array(values), N=n_bins, K=k)
    # the reference guarantees the EDGE count after the repair loop; the
    # allocation itself may overshoot n_bins (the zero-bump at
    # utils/discretisize.py:99 can push rem negative — repair trims edges)
    assert len(edges) == n_bins
    assert int(alloc.sum()) >= n_bins
    assert np.all(np.diff(edges) >= 0)
