"""Resumability (kill-and-rerun → identical tables, no double count) and
salted two-stage aggregation exactness (SURVEY §5.2.6, north_rule)."""

import os

import pandas as pd
import pytest

from timeseriestokenizer_spark.datagen import transcripts_df
from timeseriestokenizer_spark.functions.signals import derive_signals
from timeseriestokenizer_spark.operators.rollup import rollup_tier
from timeseriestokenizer_spark.operators.salting import salted_rollup
from timeseriestokenizer_spark.plans.manifest import (
    done_partitions,
    resumable_rollup,
)


def _collect_sorted(spark, path):
    return (
        spark.read.parquet(path)
        .toPandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_resumable_rollup_skips_done(spark, transcripts, tmp_path):
    sig = derive_signals(transcripts)
    out = str(tmp_path / "t1h")
    man = str(tmp_path / "manifest")

    computed1 = resumable_rollup(spark, sig, "1h", out, man, run_id="r1")
    assert len(computed1) > 1
    full1 = _collect_sorted(spark, out)

    # rerun: manifest marks every day done → nothing recomputed, data identical
    computed2 = resumable_rollup(spark, sig, "1h", out, man, run_id="r1")
    assert computed2 == []
    full2 = _collect_sorted(spark, out)
    pd.testing.assert_frame_equal(full1, full2)


def test_resumable_rollup_resumes_partial(spark, transcripts, tmp_path):
    """Simulate a mid-run kill: run to completion, delete the manifest rows
    AND data of the tail partitions, rerun → only the tail recomputes and the
    final table equals a one-shot rollup."""
    import shutil

    sig = derive_signals(transcripts)
    out = str(tmp_path / "t1d")
    man = str(tmp_path / "manifest")

    all_days = resumable_rollup(spark, sig, "1d", out, man, run_id="r1")
    # "kill": drop the last 2 days' outputs and their manifest rows
    kept_days = all_days[:-2]
    lost = all_days[-2:]
    for d in lost:
        shutil.rmtree(os.path.join(out, f"day={d}"))
    m = spark.read.parquet(man).toPandas()
    m = m[m["part_key"].isin(kept_days)]
    shutil.rmtree(man)
    spark.createDataFrame(m).write.parquet(man)

    recomputed = resumable_rollup(spark, sig, "1d", out, man, run_id="r1")
    assert sorted(recomputed) == sorted(lost)
    assert done_partitions(spark, man, "r1", "1d") == set(all_days)

    # byte-identical to a one-shot rollup (modulo row order)
    oneshot = (
        rollup_tier(sig, "1d")
        .toPandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    resumed = _collect_sorted(spark, out).drop(columns=["day"], errors="ignore")
    resumed = resumed[oneshot.columns]
    pd.testing.assert_frame_equal(resumed, oneshot, check_dtype=False)


@pytest.mark.parametrize("tier", ["1m", "1h"])
def test_salted_rollup_exact(spark, tier):
    """Salted two-stage == direct rollup, exactly, on a skewed table
    (one conversation holding ~30% of turns)."""
    t = transcripts_df(spark, C=15, seed=7, hot_conv_share=0.3)
    sig = derive_signals(t).cache()
    direct = (
        rollup_tier(sig, tier)
        .toPandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    salted = (
        salted_rollup(sig, tier, n_salts=8)
        .toPandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )[direct.columns]
    pd.testing.assert_frame_equal(salted, direct, check_exact=False, atol=1e-9)
    sig.unpersist()
