"""Pure-numpy baseline JPEG codec (multimodal/jpeg.py): lossy roundtrip
envelope, stream structure, spec edge cases, and the Spark decode path."""

import struct

import numpy as np
import pytest

from timeseriestokenizer_spark.multimodal.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def _gradient(h=24, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_quality_envelope():
    img = _gradient()
    prev_err = None
    for q in (50, 75, 95, 100):
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, q))
        assert out.shape == img.shape and out.dtype == np.uint8
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 12, f"q={q} max err {err.max()}"
        if prev_err is not None:
            assert err.mean() <= prev_err + 0.01  # higher quality, lower error
        prev_err = err.mean()
    assert prev_err < 0.2  # q=100 on a smooth gradient is near-exact


def test_roundtrip_noise_and_odd_dims():
    rng = np.random.RandomState(3)
    for h, w in ((17, 23), (8, 8), (1, 1), (9, 64)):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
        assert out.shape == img.shape
        # noise is the worst case for JPEG; bound is loose but real
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 20


def test_stream_structure():
    """The stream must be structurally valid JFIF: SOI/EOI framing, JFIF
    APP0, SOF0, four DHTs, two DQTs, and a byte-stuffed entropy segment
    (no bare 0xFF followed by a non-marker except stuffed 0x00)."""
    b = encode_jpeg_baseline(_gradient(), 75)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    markers = []
    pos = 2
    while pos + 4 <= len(b):
        assert b[pos] == 0xFF
        m = struct.unpack(">H", b[pos:pos + 2])[0]
        markers.append(m)
        if m == 0xFFDA:
            break
        size = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        pos += 2 + size
    assert markers.count(0xFFDB) == 2 and markers.count(0xFFC4) == 4
    assert 0xFFC0 in markers and markers[-1] == 0xFFDA
    # entropy segment: every 0xFF is followed by 0x00 (stuffing) until EOI
    sos_size = struct.unpack(">H", b[pos + 2:pos + 4])[0]
    ent = b[pos + 2 + sos_size:-2]
    i = 0
    while i < len(ent):
        if ent[i] == 0xFF:
            assert ent[i + 1] == 0x00, "unstuffed 0xFF inside entropy data"
            i += 2
        else:
            i += 1


def test_determinism():
    img = _gradient()
    assert encode_jpeg_baseline(img, 75) == encode_jpeg_baseline(img, 75)


def test_rejects_non_baseline():
    b = bytearray(encode_jpeg_baseline(_gradient(8, 8), 75))
    # flip SOF0 → SOF2 (progressive): must refuse, not mis-decode
    idx = bytes(b).find(b"\xff\xc0")
    b[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_baseline(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x00\x00")


def test_pil_cross_validation_if_available():
    """If a real JPEG library is ever present, OUR stream must decode there
    to within the same error envelope (lib-gated, skips in this sandbox)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _gradient()
    theirs = np.asarray(PIL.open(io.BytesIO(encode_jpeg_baseline(img, 90))).convert("RGB"))
    assert np.abs(theirs.astype(int) - img.astype(int)).max() <= 12


def test_decode_media_jpeg_through_spark(spark):
    """kind='image/jpeg' decodes for REAL in the mapInPandas feature path
    (the former fake=True stand-in for compressed media is gone)."""
    import pandas as pd

    from timeseriestokenizer_spark.multimodal.binary_ops import extract_features

    imgs = {i: _gradient(8 + i, 16 + i) for i in range(4)}
    pdf = pd.DataFrame(
        {
            "media_id": list(imgs),
            "kind": "image/jpeg",
            "payload": [encode_jpeg_baseline(v, 85) for v in imgs.values()],
        }
    )
    media = spark.createDataFrame(pdf)
    out = extract_features(media, fake_decode=False).toPandas().set_index("media_id")
    assert len(out) == 4
    for i, img in imgs.items():
        dec = decode_jpeg_baseline(bytes(pdf[pdf.media_id == i]["payload"].iloc[0]))
        hist = np.bincount(dec.ravel().astype(np.int64) % 8, minlength=8)
        expect = (hist / (hist.sum() or 1)).tolist()
        assert np.allclose(out.loc[i, "feature"], expect)


# --- PNG (multimodal/png.py): lossless, stdlib-zlib-backed ---


def test_png_roundtrip_exact():
    from timeseriestokenizer_spark.multimodal.png import decode_png, encode_png

    rng = np.random.RandomState(5)
    for h, w in ((1, 1), (16, 16), (33, 47)):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_all_filter_types_decode():
    """Hand-built stream using every scanline filter (None/Sub/Up/Average/
    Paeth) must reconstruct exactly — our encoder only emits filter 0, so
    this covers the decode paths real-world writers use."""
    import struct
    import zlib

    from timeseriestokenizer_spark.multimodal.png import _SIG, _chunk, decode_png

    rng = np.random.RandomState(6)
    h, w, ch = 5, 7, 3
    px = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    def filt_line(y, ftype):
        line = px[y].reshape(-1).astype(int)
        prev = px[y - 1].reshape(-1).astype(int) if y else np.zeros(stride, int)
        out = np.zeros(stride, int)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            ul = prev[i - ch] if i >= ch else 0
            up = prev[i]
            pred = [0, left, up, (left + up) >> 1, paeth(left, up, ul)][ftype]
            out[i] = (line[i] - pred) & 0xFF
        return bytes([ftype]) + bytes(out.astype(np.uint8))

    raw = b"".join(filt_line(y, y % 5) for y in range(h))
    stream = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(stream), px)


def test_png_gray_and_rgba_and_rejects():
    import struct
    import zlib

    from timeseriestokenizer_spark.multimodal.png import _SIG, _chunk, decode_png, encode_png

    def build(color, channels, w=4, h=3, interlace=0, depth=8):
        rng = np.random.RandomState(8)
        px = rng.randint(0, 256, (h, w, channels), dtype=np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        return px, (
            _SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )

    gray, stream = build(0, 1)
    assert np.array_equal(decode_png(stream), np.repeat(gray, 3, axis=2))
    rgba, stream = build(6, 4)
    assert np.array_equal(decode_png(stream), rgba[:, :, :3])
    _, inter = build(2, 3, interlace=1)
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(inter)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")


def test_decode_media_png_real():
    from timeseriestokenizer_spark.multimodal.binary_ops import decode_media
    from timeseriestokenizer_spark.multimodal.png import encode_png

    img = _gradient(9, 13)
    assert np.array_equal(decode_media(encode_png(img), "image/png"), img)
