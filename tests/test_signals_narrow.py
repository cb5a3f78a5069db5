"""signals_narrow must equal derive_signals on the rollup-facing columns —
the shuffle-lean projection is a pure optimization, not a semantic change."""

import pandas as pd

from timeseriestokenizer_spark.functions.signals import derive_signals, signals_narrow
from timeseriestokenizer_spark.operators.rollup import rollup_cascade


COLS = ["conv_id", "turn_idx", "ts", "latency_s", "n_chars", "n_tokens", "is_tool_call"]


def test_narrow_equals_full(spark, transcripts):
    a = (
        derive_signals(transcripts)
        .select(*COLS)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        signals_narrow(transcripts)
        .select(*COLS)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_narrow_rollup_equals_full_rollup(spark, transcripts):
    ta = rollup_cascade(derive_signals(transcripts))["1h"]
    tb = rollup_cascade(signals_narrow(transcripts))["1h"]
    a = ta.toPandas().sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    b = tb.toPandas().sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_narrow_plan_drops_text_before_shuffle(spark, transcripts):
    """The physical plan's Exchange must not carry the text column."""
    plan = signals_narrow(transcripts)._jdf.queryExecution().executedPlan().toString()
    exchange_idx = plan.find("Exchange")
    assert exchange_idx != -1
    # everything below the Exchange (printed after it) is the pre-shuffle
    # side; 'text' may appear there (scan/project) but the window/exchange
    # output attribute list above must not reference text
    above = plan[:exchange_idx]
    assert "length(text" not in above  # text already reduced to counts
