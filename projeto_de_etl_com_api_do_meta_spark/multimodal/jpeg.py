"""Pure-Python baseline JPEG codec (stdlib + numpy, no pillow).

A real ITU T.81 baseline sequential encoder/decoder, implemented from the
public spec so compressed image payloads can flow through the multimodal
mapInPandas kernels even in environments without an imaging stack:

* **Encoder** (`encode_jpeg`): 8x8 FDCT, Annex-K quantization tables scaled
  by libjpeg's public quality formula, zig-zag, DC-diff + AC run-length
  Huffman entropy coding with the Annex-K typical tables, 0xFF byte
  stuffing.  Interleaved YCbCr 4:4:4 by default, or 4:2:0 (Y at 2x2
  sampling, chroma 2x2 box-averaged, 16x16 MCUs — the dominant wild
  format) via ``subsampling="420"``.
* **Decoder** (`decode_jpeg`): a spec-driven segment parser (SOI/APPn/COM/
  DQT/DHT/SOF0/DRI/SOS/EOI) — it reads the quant + Huffman tables FROM THE
  STREAM (not from constants shared with the encoder), builds canonical
  prefix codes, entropy-decodes interleaved MCUs for any 1-2x sampling
  factors (4:4:4, 4:2:0, 4:2:2, 4:4:0) with restart-marker support, then
  dequantize -> IDCT -> level shift -> chroma pixel-replication upsample
  -> YCbCr->RGB.  Decoding real-world baseline JPEGs (incl. 4:2:0, r8)
  works, not just our own output.

Required of inputs: 8-bit precision, 1 or 3 components, sampling factors
1-2.  Progressive (SOF2) / arithmetic streams and >2x sampling raise
``ValueError`` with a clear message.

Scale posture: the codec is called from Arrow-batched ``mapInPandas``
kernels (`binary_ops.py`) — pure executor-side CPU with no driver
involvement; the numpy DCT is a batched matmul over all blocks of an image
at once.

Reference analog: the reference repo has no binary/image surface at all
(payloads are JSON rows, ``src/extract.py``); this module exists for the
driver's multimodal north star.  The constants below are from the public
ITU T.81 spec Annex K and libjpeg's ``jcparam.c`` quality scaling.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_CONTENT_TYPE = "image/jpeg"

# -- Annex K tables -----------------------------------------------------------

# K.1 luminance / K.2 chrominance quantization tables (natural row order).
_QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QT_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Zig-zag scan order: _ZIGZAG[k] = natural index of the k-th scanned coef.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# K.3 typical Huffman tables: (bits[1..16], huffval).
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8x8 DCT-II basis: _DCT[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# BT.601 full-range RGB<->YCbCr (the JFIF convention).
_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168735892, -0.331264108, 0.5],
        [0.5, -0.418687589, -0.081312411],
    ]
)
_YCC2RGB = np.array(
    [
        [1.0, 0.0, 1.402],
        [1.0, -0.344136286, -0.714136286],
        [1.0, 1.772, 0.0],
    ]
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg jcparam.c quality->scaling: 5000/q below 50, 200-2q above."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# -- Huffman code construction (canonical, per spec Annex C) -------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a (BITS, HUFFVAL) table."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, offset bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec F.1.2.3


# -- Encoder -------------------------------------------------------------------


def _write_block(
    w: "_BitWriter",
    zz: np.ndarray,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
    pred: list[int],
    ci: int,
) -> None:
    """Entropy-code one zig-zagged quantized block (DC diff + AC RLE)."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, bits = _magnitude(diff)
    code, length = dc_tab[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = int(last_nz[-1]) + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        w.write(code, length)


def _plane_zz(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Batched FDCT + quantize + zig-zag for one component plane whose
    dims are already multiples of 8; returns (nby, nbx, 64) int64."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = np.einsum("ux,bcxy,vy->bcuv", _DCT, blocks, _DCT)
    q = np.round(coefs / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(nby, nbx, 64)[:, :, _ZIGZAG]


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 95,
    channels: int = 3,
    subsampling: str = "444",
) -> bytes:
    """Encode raw RGB (len == w*h*3) or grayscale (len == w*h, channels=1)
    bytes as a baseline JFIF JPEG.  ``subsampling`` is "444" (one 8x8
    block per component per MCU) or "420" (Y at 2x2 sampling, chroma 2x2
    box-averaged — the dominant wild format; 16x16 MCUs)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if len(rgb) != width * height * channels:
        raise ValueError(f"need {width * height * channels} bytes, got {len(rgb)}")
    sub420 = subsampling == "420" and channels == 3
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        ycc = px.astype(np.float64) @ _RGB2YCC.T
        ycc[:, :, 1:] += 128.0
    else:
        ycc = px.astype(np.float64)

    qt_lum = _scaled_qt(_QT_LUM, quality)
    qt_chr = _scaled_qt(_QT_CHR, quality)

    # pad by edge replication to the MCU grain (8 for 4:4:4, 16 for 4:2:0)
    grain = 16 if sub420 else 8
    ph = (height + grain - 1) // grain * grain
    pw = (width + grain - 1) // grain * grain
    padded = np.empty((ph, pw, channels))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]
    padded[:, width:] = padded[:, width - 1 : width]

    dc_lum = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _build_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _build_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    tables = [(dc_lum, ac_lum), (dc_chr, ac_chr), (dc_chr, ac_chr)][:channels]

    w = _BitWriter()
    pred = [0] * channels
    if sub420:
        # planes: Y full-res, Cb/Cr 2x2 box means (the libjpeg h2v2 filter)
        yz = _plane_zz(padded[:, :, 0], qt_lum)
        cbz = _plane_zz(
            padded[:, :, 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)),
            qt_chr,
        )
        crz = _plane_zz(
            padded[:, :, 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)),
            qt_chr,
        )
        # MCU interleave per T.81 A.2.3: 4 Y blocks (2x2), then Cb, then Cr
        for my in range(ph // 16):
            for mx in range(pw // 16):
                for vy in range(2):
                    for vx in range(2):
                        _write_block(
                            w, yz[2 * my + vy, 2 * mx + vx],
                            dc_lum, ac_lum, pred, 0,
                        )
                _write_block(w, cbz[my, mx], dc_chr, ac_chr, pred, 1)
                _write_block(w, crz[my, mx], dc_chr, ac_chr, pred, 2)
    else:
        comp_qts = [(0, qt_lum)] if channels == 1 else [
            (0, qt_lum), (1, qt_chr), (2, qt_chr)
        ]
        comps_zz = [_plane_zz(padded[:, :, ci], qt) for ci, qt in comp_qts]
        nby, nbx = ph // 8, pw // 8
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(channels):
                    dc_tab, ac_tab = tables[ci]
                    _write_block(w, comps_zz[ci][by, bx], dc_tab, ac_tab, pred, ci)
    w.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qt_segs = [(0, qt_lum)] if channels == 1 else [(0, qt_lum), (1, qt_chr)]
    for tid, qt in qt_segs:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt[z]) for z in _ZIGZAG)
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * channels, 8, height, width, channels
    )
    for cid, tq in (((1, 0),) if channels == 1 else ((1, 0), (2, 1), (3, 1))):
        hv = 0x22 if (sub420 and cid == 1) else 0x11
        out += struct.pack("BBB", cid, hv, tq)
    dht_segs = (
        ((0x00, _DC_LUM_BITS, _DC_LUM_VALS), (0x10, _AC_LUM_BITS, _AC_LUM_VALS))
        if channels == 1
        else (
            (0x00, _DC_LUM_BITS, _DC_LUM_VALS),
            (0x10, _AC_LUM_BITS, _AC_LUM_VALS),
            (0x01, _DC_CHR_BITS, _DC_CHR_VALS),
            (0x11, _AC_CHR_BITS, _AC_CHR_VALS),
        )
    )
    for tc_th, bits, vals in dht_segs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for cid, tabs in (((1, 0x00),) if channels == 1 else ((1, 0x00), (2, 0x11), (3, 0x11))):
        out += struct.pack("BB", cid, tabs)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bytes(w.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- Decoder -------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                raise ValueError("hit restart marker mid-symbol")
            else:
                self.marker = nxt
                raise ValueError("hit segment marker mid-symbol")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Discard pad bits and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2


def _build_decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for decoding."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _decode_symbol(r: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """Sign-extend a SIZE-bit magnitude value (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline sequential JPEG.  Returns (width, height, pixels)
    where pixels is uint8 of shape (h, w, 3) for color or (h, w) for
    grayscale.  Tables are read from the stream; 4:4:4 / grayscale only."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict[tuple[int, int], int]] = {}
    ac_luts: dict[int, dict[tuple[int, int], int]] = {}
    width = height = 0
    comps: list[tuple[int, int, int]] = []  # (component id, qt id, sampling)
    restart_interval = 0

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("reached EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                nat = np.empty(64, dtype=np.int32)
                nat[_ZIGZAG] = zz
                qts[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                lut = _build_decode_tree(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision, height, width, nc = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise ValueError(
                        f"sampling factor {h}x{v} not supported (1-2 only)"
                    )
                comps.append((cid, tq, hv))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("progressive/arithmetic JPEG not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_tabs: list[tuple[dict, dict]] = []
            for i in range(ns):
                _cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs.append((dc_luts[tabs >> 4], ac_luts[tabs & 0x0F]))
            return _decode_scan(
                payload, pos, width, height, comps, scan_tabs, qts,
                restart_interval,
            )
        # other segments (APPn, COM) are skipped
    raise ValueError("no SOS segment found")


def _decode_scan(
    payload: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list[tuple[int, int, int]],
    scan_tabs: list[tuple[dict, dict]],
    qts: dict[int, np.ndarray],
    restart_interval: int,
) -> tuple[int, int, np.ndarray]:
    nc = len(comps)
    # MCU geometry per T.81 A.2.3: in an interleaved scan each component
    # contributes h x v blocks per MCU.  A single-component scan is
    # NON-interleaved (T.81 A.2.2): one data unit per MCU on the ceil(dim/8)
    # grid REGARDLESS of the SOF-declared sampling factors — some encoders
    # legally emit grayscale with a 2x2 SOF factor (e.g. chroma-stripped
    # files), and honoring the declared factors there would mis-decode 4
    # blocks per 16x16 MCU.  Force 1x1 for that case.
    hs = [((hv >> 4), (hv & 0x0F)) for _, _, hv in comps]
    if nc == 1:
        hs = [(1, 1)]
    hmax = max(h for h, _ in hs)
    vmax = max(v for _, v in hs)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    coef = [
        np.zeros((mcuy * v, mcux * h, 8, 8), dtype=np.float64)
        for (h, v) in hs
    ]
    r = _BitReader(payload, pos)
    pred = [0] * nc
    zz = np.zeros(64, dtype=np.int64)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align_restart()
                pred = [0] * nc
            mcu += 1
            for ci in range(nc):
                h, v = hs[ci]
                dc_lut, ac_lut = scan_tabs[ci]
                qt = qts[comps[ci][1]]
                for vy in range(v):
                    for vx in range(h):
                        zz[:] = 0
                        size = _decode_symbol(r, dc_lut)
                        diff = _extend(r.receive(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, ac_lut)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(r.receive(size), size)
                            k += 1
                        block = np.empty(64, dtype=np.float64)
                        block[_ZIGZAG] = zz
                        coef[ci][my * v + vy, mx * h + vx] = (
                            block.reshape(8, 8) * qt
                        )

    planes = []
    for ci in range(nc):
        h, v = hs[ci]
        spatial = np.einsum("xu,bcuv,yv->bcxy", _DCT.T, coef[ci], _DCT.T)
        img = (
            spatial.transpose(0, 2, 1, 3).reshape(mcuy * v * 8, mcux * h * 8)
            + 128.0
        )
        # component's true extent (A.1.1: ceil(dim * sampling / max)),
        # then JFIF simple pixel-replication upsampling back to full size
        ch = (height * v + vmax - 1) // vmax
        cw = (width * h + hmax - 1) // hmax
        img = img[:ch, :cw]
        if v != vmax or h != hmax:
            img = np.repeat(
                np.repeat(img, vmax // v, axis=0), hmax // h, axis=1
            )
        planes.append(img[:height, :width])
    if nc == 1:
        return width, height, np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    ycc[:, :, 1:] -= 128.0
    rgb = ycc @ _YCC2RGB.T
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
