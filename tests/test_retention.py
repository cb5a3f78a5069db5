"""Retention policy: hot/expired TTL splits per tier, expired points packed
cold and exactly recoverable (north_star 'rollup + downsample + retention')."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from timeseriestokenizer_spark.functions.signals import derive_signals
from timeseriestokenizer_spark.operators.gorilla import gorilla_unpack
from timeseriestokenizer_spark.operators.retention import (
    apply_retention,
    cold_pack_expired,
    split_expired,
)
from timeseriestokenizer_spark.operators.rollup import rollup_cascade


def test_split_expired_partitions_rows(spark, transcripts):
    tiers = rollup_cascade(derive_signals(transcripts))
    t1h = tiers["1h"].cache()
    now = t1h.agg(F.max("bucket_ts")).first()[0]
    hot, expired = split_expired(t1h, now, keep_seconds=3 * 86400)
    n_hot, n_exp, n_all = hot.count(), expired.count(), t1h.count()
    assert n_hot + n_exp == n_all
    assert n_hot > 0 and n_exp > 0  # fixture spans ~30 days
    cutoff = pd.Timestamp(now) - pd.Timedelta(seconds=3 * 86400)
    assert hot.agg(F.min("bucket_ts")).first()[0] >= cutoff
    assert expired.agg(F.max("bucket_ts")).first()[0] < cutoff
    t1h.unpersist()


def test_policy_none_keeps_everything(spark, transcripts):
    tiers = rollup_cascade(derive_signals(transcripts))
    now = tiers["1d"].agg(F.max("bucket_ts")).first()[0]
    out = apply_retention(
        {"1d": tiers["1d"]}, now, policy={"1d": None}
    )
    assert out["1d"]["expired"].count() == 0
    assert out["1d"]["hot"].count() == tiers["1d"].count()


def test_cold_pack_roundtrip(spark, transcripts):
    """Expired 1h points move to Gorilla blobs; unpack reproduces every
    (series, bucket_ts, value) point exactly."""
    tiers = rollup_cascade(derive_signals(transcripts))
    t1h = tiers["1h"].filter(F.col("sum_lat").isNotNull()).cache()
    now = t1h.agg(F.max("bucket_ts")).first()[0]
    _, expired = split_expired(t1h, now, keep_seconds=5 * 86400)
    packed = cold_pack_expired(expired).cache()
    assert packed.count() > 0
    back = gorilla_unpack(packed).toPandas()
    exp = expired.select(
        F.concat("conv_id", F.lit("|"), F.to_date("bucket_ts").cast("string")).alias("series_id"),
        F.col("bucket_ts").alias("ts"),
        F.col("sum_lat").alias("value"),
    ).toPandas()
    back = back.sort_values(["series_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["series_id", "ts"]).reset_index(drop=True)
    assert len(back) == len(exp)
    assert np.array_equal(
        back["ts"].astype("datetime64[us]").to_numpy(),
        exp["ts"].astype("datetime64[us]").to_numpy(),
    )
    assert np.array_equal(back["value"].to_numpy(), exp["value"].to_numpy())
    t1h.unpersist()
    packed.unpersist()
