"""Pure-stdlib PNG codec (round 4 — closes the last *image* decode gap).

PNG is DEFLATE + per-scanline prediction filters, and DEFLATE ships in the
Python standard library (zlib) — so unlike MP3 (which genuinely needs a
DSP stack), a complete, byte-faithful PNG codec needs no third-party
packages at all.

Encoder: 8-bit truecolor (RGB), no interlace, filter 0 scanlines, one IDAT,
CRC32 per chunk — a minimal, fully conformant writer.

Decoder: any non-interlaced 8-bit grayscale / RGB / RGBA stream — all five
scanline filters (None, Sub, Up, Average, Paeth), multi-IDAT streams,
ancillary chunks skipped. Interlaced, 16-bit, and palette images raise
NotImplementedError (never a silent mis-decode). Roundtrip is EXACT
(lossless format; pytest-pinned), unlike the baseline-JPEG envelope.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (8-bit truecolor, filter 0)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8 RGB")
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB, no interlace
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB. Grayscale replicates to 3 channels;
    RGBA drops alpha (after using it nowhere — training features read the
    color planes). Raises NotImplementedError outside non-interlaced 8-bit
    gray/RGB/RGBA."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            raise NotImplementedError("palette PNGs not supported")
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNGs not supported")
    if depth != 8:
        raise NotImplementedError("only 8-bit channel depth supported")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None or comp != 0 or filt != 0:
        raise NotImplementedError(f"unsupported color type {color}")

    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    bpp = channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in bpp-strided lanes
            recon = line.copy()
            for i in range(bpp, stride):
                recon[i] = (recon[i] + recon[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                recon[i] = (recon[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for i in range(stride):
                left = int(recon[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                recon[i] = (recon[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = out[y]
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 4:
        return px[:, :, :3].copy()
    return px
