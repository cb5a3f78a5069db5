"""Gorilla-style cold-tier compression: delta-of-delta timestamps and
XOR-encoded float values, packed per (series, bucket) into a BinaryType
column inside a grouped-map pandas UDF (BASELINE.json north_star; the
scheme follows the public Gorilla paper, Pelkonen et al., VLDB 2015).

Bitstream layout per blob:
  header: u32 n_points
  if n: u64 first_ts_us, u64 first_val_bits
  per subsequent point:
    timestamp delta-of-delta (prev delta starts at 0):
      dod == 0                → '0'
      dod in [-63, 64]        → '10'   + 7 bits  (zigzag-less, offset-coded)
      dod in [-255, 256]      → '110'  + 9 bits
      dod in [-2047, 2048]    → '1110' + 12 bits
      else                    → '1111' + 64 bits (raw two's complement)
    value XOR vs previous:
      xor == 0                → '0'
      fits previous window    → '10'   + meaningful bits
      else                    → '11'   + 6b leading + 7b length + bits

Exact round-trip (unpack(pack(ts, v)) == (ts, v) bit-for-bit, NaN-safe since
we move raw IEEE bits) is asserted in tests/test_gorilla.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int):
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, width: int) -> int:
        out = 0
        p = self.pos
        for _ in range(width):
            byte = self.data[p >> 3]
            out = (out << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out


def pack_series(ts_us: np.ndarray, vals: np.ndarray) -> bytes:
    """Pack parallel (timestamp_us:int64, value:float64) arrays to bytes."""
    ts = np.asarray(ts_us, dtype=np.int64)
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    w.write(int(bits[0]), 64)

    prev_delta = 0
    prev_bits = int(bits[0])
    prev_lead, prev_len = -1, -1
    for i in range(1, n):
        delta = int(ts[i] - ts[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)

        b = int(bits[i])
        xor = prev_bits ^ b
        prev_bits = b
        if xor == 0:
            w.write(0, 1)
            continue
        lead = 64 - xor.bit_length()
        trail = (xor & -xor).bit_length() - 1
        mlen = 64 - lead - trail
        if prev_lead >= 0 and lead >= prev_lead and trail >= 64 - prev_lead - prev_len:
            w.write(0b10, 2)
            w.write(xor >> (64 - prev_lead - prev_len), prev_len)
        else:
            w.write(0b11, 2)
            w.write(min(lead, 63), 6)
            w.write(mlen, 7)
            w.write(xor >> trail, mlen)
            prev_lead, prev_len = min(lead, 63), mlen
    return w.getvalue()


def unpack_series(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of pack_series — exact."""
    r = _BitReader(blob)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    bits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, bits.view(np.float64)
    first_ts = r.read(64)
    if first_ts >= 1 << 63:
        first_ts -= 1 << 64
    ts[0] = first_ts
    bits[0] = r.read(64)

    prev_delta = 0
    prev_bits = int(bits[0])
    prev_lead, prev_len = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        prev_delta += dod
        ts[i] = ts[i - 1] + prev_delta

        if r.read(1) == 0:
            bits[i] = prev_bits
            continue
        if r.read(1) == 0:
            xor = r.read(prev_len) << (64 - prev_lead - prev_len)
        else:
            lead = r.read(6)
            mlen = r.read(7)
            xor = r.read(mlen) << (64 - lead - mlen)
            prev_lead, prev_len = lead, mlen
        prev_bits ^= xor
        bits[i] = prev_bits
    return ts, bits.view(np.float64)


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("raw_bytes", T.LongType()),
        T.StructField("packed_bytes", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ]
)


def gorilla_pack(
    df: DataFrame, key: str | list[str], ts_col: str, val_col: str
) -> DataFrame:
    """Pack each series' (ts, value) stream. Pass a composite key like
    ``["conv_id", "day"]`` to bound groups at scale (an unbounded hot
    conversation otherwise concentrates in one task — the grouped-map analog
    of the salting note in operators/salting.py); series_id in the output is
    the '|'-joined key."""
    keys = [key] if isinstance(key, str) else list(key)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="stable")
        ts = pdf[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        vals = pdf[val_col].to_numpy(dtype=np.float64)
        blob = pack_series(ts, vals)
        sid = "|".join(str(pdf[k].iloc[0]) for k in keys)
        return pd.DataFrame(
            {
                "series_id": [sid],
                "n_points": [len(ts)],
                "raw_bytes": [len(ts) * 16],
                "packed_bytes": [len(blob)],
                "blob": [blob],
            }
        )

    return df.select(*keys, ts_col, val_col).groupBy(*keys).applyInPandas(
        _pack, PACKED_SCHEMA
    )


UNPACKED_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def gorilla_unpack(packed: DataFrame) -> DataFrame:
    """Explode packed blobs back to (series_id, ts, value) rows."""

    def _unpack(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                ts, vals = unpack_series(bytes(row["blob"]))
                yield pd.DataFrame(
                    {
                        "series_id": row["series_id"],
                        "ts": pd.to_datetime(ts, unit="us"),
                        "value": vals,
                    }
                )

    return packed.select("series_id", "blob").mapInPandas(_unpack, UNPACKED_SCHEMA)
