"""Pure-numpy baseline JPEG codec (VERDICT r3 item 4).

Minimal but REAL ITU T.81 baseline sequential JPEG: the encoder emits a
standards-conformant JFIF stream (SOI / APP0 / DQT / SOF0 / DHT / SOS /
EOI, 4:4:4 sampling, 8-bit precision, byte-stuffed entropy segment) and the
decoder parses any baseline 4:4:4 or grayscale stream whose tables ride in
the file — which they always do, including in this encoder's output.

Two simplifications, both spec-legal:
* Huffman tables are NOT the Annex-K defaults but simple canonical codes
  (every DC category at 4 bits, every AC (run,size) symbol at 8 bits —
  complete prefix codes by Kraft: 12/16 < 1, 162/256 < 1). Any conformant
  decoder reads them from DHT; compression is a little worse than
  libjpeg's optimized tables, correctness is identical.
* No chroma subsampling (4:4:4) and no restart markers. The decoder
  rejects streams using features outside baseline 4:4:4/grayscale with
  NotImplementedError rather than mis-decoding them.

Quantization follows the libjpeg quality scaling of the Annex-K example
tables, so decode(encode(img, q)) exhibits the familiar quality/error
trade (pytest pins the error envelope and bit-exactness of the DC path at
quality=100 on smooth gradients).

DCT: orthonormal 8x8 DCT-II as two matrix multiplies (M @ block @ M.T) —
vectorized over all blocks with einsum; entropy coding is the only
per-symbol Python loop.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex-K example quantization tables (these ARE in the spec as examples;
# they travel in DQT, so any values would decode identically)
QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

_C = np.array([1 / np.sqrt(2)] + [1.0] * 7)
_DCT_M = (
    0.5
    * _C[:, None]
    * np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
)

# our Huffman tables: canonical codes, DC = 12 symbols at 4 bits,
# AC = EOB/ZRL + (run 0..15, size 1..10) at 8 bits
DC_SYMBOLS = list(range(12))
AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
DC_BITS = [0] * 16
DC_BITS[3] = 12  # 12 codes of length 4 (index 3 = length 4)
AC_BITS = [0] * 16
AC_BITS[7] = len(AC_SYMBOLS)  # all codes at length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical (BITS/HUFFVAL) procedure."""
    out = {}
    code, k = 0, 0
    for li, n in enumerate(bits):
        length = li + 1
        for _ in range(n):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODES = _canonical_codes(DC_BITS, DC_SYMBOLS)
AC_CODES = _canonical_codes(AC_BITS, AC_SYMBOLS)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128, ycc[..., 2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _blocks(channel: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to multiples of 8 (edge-replicate) and split into 8x8 blocks →
    (n_blocks, 8, 8) in raster order."""
    h, w = channel.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(channel, ((0, H - h), (0, W - w)), mode="edge")
    b = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return b, H // 8, W // 8


def _unblocks(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    full = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return full[:h, :w]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec convention


def _magnitude(v: int) -> tuple[int, int]:
    """(size, appended-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_channel(writer: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """Entropy-encode one block's 64 zigzagged quantized coeffs; returns the
    new DC predictor."""
    dc = int(coeffs[0])
    size, bits = _magnitude(dc - pred)
    code, length = DC_CODES[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    for i in range(1, 64):
        v = int(coeffs[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = AC_CODES[0xF0]
            writer.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = AC_CODES[(run << 4) | size]
        writer.write(c, ln)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        c, ln = AC_CODES[0x00]
        writer.write(c, ln)  # EOB
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dht_body(tc_th: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([tc_th] + bits + symbols)


def encode_jpeg_baseline(pixels: np.ndarray, quality: int = 75) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, custom canonical
    Huffman tables carried in DHT)."""
    h, w, _ = pixels.shape
    qt = [_quality_scale(QT_LUMA, quality), _quality_scale(QT_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(pixels)

    # quantized zigzag coefficients per channel, vectorized DCT
    chan_coeffs = []
    grid = None
    for ci in range(3):
        blocks, by, bx = _blocks(ycc[..., ci])
        grid = (by, bx)
        shifted = blocks - 128.0
        dct = np.einsum("ux,nxy,vy->nuv", _DCT_M, shifted, _DCT_M)
        q = qt[0 if ci == 0 else 1]
        quant = np.round(dct / q).astype(np.int64)
        chan_coeffs.append(quant.reshape(-1, 64)[:, ZIGZAG])

    writer = _BitWriter()
    preds = [0, 0, 0]
    for bi in range(grid[0] * grid[1]):  # MCU order: interleaved Y,Cb,Cr
        for ci in range(3):
            preds[ci] = _encode_channel(writer, chan_coeffs[ci][bi], preds[ci])
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, t in enumerate(qt):
        out += _seg(0xFFDB, bytes([tq]) + bytes(t.flatten()[ZIGZAG].astype(np.uint8)))
    comp = b"".join(
        bytes([cid, 0x11, 0 if cid == 1 else 1]) for cid in (1, 2, 3)
    )  # 4:4:4, Y→qt0, C→qt1
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + comp)
    out += _seg(0xFFC4, _dht_body(0x00, DC_BITS, DC_SYMBOLS))
    out += _seg(0xFFC4, _dht_body(0x10, AC_BITS, AC_SYMBOLS))
    out += _seg(0xFFC4, _dht_body(0x01, DC_BITS, DC_SYMBOLS))
    out += _seg(0xFFC4, _dht_body(0x11, AC_BITS, AC_SYMBOLS))
    scomp = b"".join(bytes([cid, 0x00 if cid == 1 else 0x11]) for cid in (1, 2, 3))
    out += _seg(0xFFDA, bytes([3]) + scomp + bytes([0, 63, 0]))
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker (EOI): feed 1-padding so trailing reads succeed
                    b = 0xFF
                    self.pos = len(self.data)
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:  # past EOI: pad with 1s
            self.acc = (self.acc << (length - self.n)) | ((1 << (length - self.n)) - 1)
            self.n = length
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v


def _decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, symbols).items()
    }


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    for _ in range(16):
        code = (code << 1) | reader.read(1)
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map appended bits back to a signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (or grayscale replicated
    to 3 channels). Supports 8-bit baseline sequential, 4:4:4 or single
    component, tables from the stream; anything else raises
    NotImplementedError — never a silent mis-decode."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    comps = []
    scan_comps = []
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = struct.unpack(">H", payload[pos:pos + 2])[0]
        if marker == 0xFFD9:
            break
        size = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + size]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not baseline")
                z = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8).astype(np.int64)
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = z
                qtables[tq] = t.reshape(8, 8)
                i += 65
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i])
                for i in range(nc)
            ]
            if any(samp != 0x11 for _, samp, _ in comps):
                raise NotImplementedError("only 4:4:4 (no subsampling) supported")
            sof = (h, w, nc)
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                nsym = sum(bits)
                syms = list(body[i + 17:i + 17 + nsym])
                htables[tc_th] = _decode_table(bits, syms)
                i += 17 + nsym
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xFFDA:
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            data_start = pos + 2 + size
            break
        pos += 2 + size
    if sof is None or data_start is None:
        raise ValueError("missing SOF0 or SOS")
    h, w, nc = sof
    if nc not in (1, 3):
        raise NotImplementedError("only 1 or 3 components")

    reader = _BitReader(payload[data_start:])
    by, bx = -(-h // 8), -(-w // 8)
    n_blocks = by * bx
    coeffs = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in range(nc)]
    preds = [0] * nc
    for bi in range(n_blocks):
        for ci in range(nc):
            td = scan_comps[ci][1] >> 4
            ta = scan_comps[ci][1] & 0xF
            dc_tab = htables[(0 << 4) | td]
            ac_tab = htables[(1 << 4) | ta]
            size = _read_symbol(reader, dc_tab)
            diff = _extend(reader.read(size), size)
            preds[ci] += diff
            block = coeffs[ci][bi]
            block[0] = preds[ci]
            k = 1
            while k < 64:
                sym = _read_symbol(reader, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                block[k] = _extend(reader.read(size), size)
                k += 1

    chans = []
    for ci in range(nc):
        tq = comps[ci][2]
        dezig = np.zeros((n_blocks, 64), dtype=np.int64)
        dezig[:, ZIGZAG] = coeffs[ci]
        deq = dezig.reshape(-1, 8, 8) * qtables[tq]
        spatial = np.einsum("xu,nuv,yv->nxy", _DCT_M.T, deq.astype(np.float64), _DCT_M.T)
        chans.append(_unblocks(spatial + 128.0, by, bx, h, w))
    if nc == 1:
        y = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(np.stack(chans, axis=-1))
