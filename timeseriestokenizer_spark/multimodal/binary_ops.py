"""Multimodal columns: opaque binary payloads with typed metadata.

Image/audio/video ride as BinaryType columns; decode/feature-extraction run
as Arrow-batched pandas UDFs over mapInPandas. The media *decode* step is
STUBBED (no image/audio libs in this container — `decode_media` raises
NotImplementedError unless a deterministic fake is requested); everything
Spark-side — schema, partitioning, UDF signature, batch shape — is real and
tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def synth_media_from_documents(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Deterministic fake media table: payload = UTF-8 bytes of the text
    (stands in for encoded image bytes), typed metadata derived from it."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake").alias("codec"),
            (F.length(text_col) % 64 + 1).cast("int").alias("width"),
            (F.length(text_col) % 48 + 1).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode media payload to a pixel/sample array.

    STUB: real decoding needs PIL/ffmpeg (absent here). fake=True returns a
    deterministic byte-derived array so the pipeline shape is testable."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; pass fake=True for the deterministic stand-in"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: (len(arr) // 4) * 4].reshape(-1, 4)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame, feature_dim: int = 8, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The feature
    is a deterministic byte-histogram projection (stand-in for a real
    image/audio embedding); batches stream through mapInPandas so one task
    never holds more than a batch of payloads."""

    def _extract(batches):
        for pdf in batches:
            feats, md5s, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                md5s.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
                arr = decode_media(b, "image/fake", fake=fake_decode)
                hist = np.bincount(arr.ravel() % feature_dim, minlength=feature_dim)
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": np.asarray(sizes, dtype=np.int64),
                    "payload_md5": md5s,
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)
