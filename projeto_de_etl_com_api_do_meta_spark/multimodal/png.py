"""PNG codec (pure stdlib zlib + numpy) — a REAL compressed, CRC-checked
image format for the multimodal pipeline, implemented from the public spec
(ISO/IEC 15948 / RFC 2083: PNG signature, IHDR/IDAT/IEND chunk layout,
CRC-32 per chunk, DEFLATE-compressed scanlines, filter types 0-4).

Unlike JPEG (lossy float DCT), PNG is LOSSLESS: encode -> decode returns
the exact input pixels, so the registry query's oracle can pin the decoded
pixel SUM bit-for-bit against a pure-SQL recomputation of the generation
rule — a stronger contract than the JPEG round-trip's noise bounds.

Scope (same honesty bar as jpeg.py / g711.py):

* encoder: 8-bit greyscale (color type 0) and truecolor RGB (color type
  2), per-scanline adaptive filtering over ALL FIVE filter types with the
  standard minimum-sum-of-absolute-differences heuristic (deterministic),
  zlib level 9, single IDAT.
* decoder: 8-bit color types 0 / 2 / 6 (RGBA accepted for wild files),
  every chunk's CRC-32 verified, multiple IDAT chunks concatenated,
  filters 0-4 (Sub / Up / Average / Paeth) reconstructed per spec.
  Interlace (Adam7), palettes, and 16-bit depth raise ValueError —
  disclosed seams, not silent wrong answers.

Reference analog: none — the reference repo has no binary surface
(payloads are JSON rows, ``src/extract.py``); this exists for the
driver's multimodal north star.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_CONTENT_TYPE = "image/png"

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec 9.4): nearest of left/up/up-left
    to the linear estimate a + b - c, ties resolved left, up, up-left."""
    p = a.astype(np.int64) + b.astype(np.int64) - c.astype(np.int64)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode 8-bit pixels (row-major, ``channels`` interleaved) as a PNG.

    Per-scanline adaptive filtering: all five spec filters are computed
    vectorized against the raw previous row (encoding references raw
    bytes — only DECODING is sequential) and the one minimizing the
    signed-byte absolute sum is chosen — the standard libpng heuristic,
    fully deterministic.
    """
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (grey) or 3 (RGB)")
    px = np.frombuffer(pixels, dtype=np.uint8)
    if len(px) != width * height * channels:
        raise ValueError("pixel buffer does not match dims")
    rows = px.reshape(height, width * channels).astype(np.int64)
    bpp = channels  # bytes per complete pixel at bit depth 8
    prev = np.zeros(width * channels, dtype=np.int64)
    out = bytearray()
    for y in range(height):
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        cands = [
            cur,  # 0 None
            cur - left,  # 1 Sub
            cur - prev,  # 2 Up
            cur - (left + prev) // 2,  # 3 Average
            cur - _paeth_predict(left, prev, upleft),  # 4 Paeth
        ]
        filtered = [(c % 256).astype(np.uint8) for c in cands]
        # minimum sum of absolute differences, bytes viewed as signed
        costs = [
            int(np.minimum(f.astype(np.int64), 256 - f.astype(np.int64)).sum())
            for f in filtered
        ]
        best = int(np.argmin(costs))  # ties -> lowest filter id
        out.append(best)
        out.extend(filtered[best].tobytes())
        prev = cur
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(out), 9)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PNG.  Returns (width, height, pixels) — uint8 of shape
    (h, w) for greyscale or (h, w, channels) otherwise.  Every chunk's
    CRC-32 is verified; filters 0-4 are reconstructed per spec 9.2."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_SIG)
    width = height = 0
    channels = 0
    idat = bytearray()
    seen_ihdr = seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError("only bit depth 8 supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
            channels = {0: 1, 2: 3, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"color type {color} not supported")
            seen_ihdr = True
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are CRC-checked then skipped
    if not (seen_ihdr and seen_iend and idat):
        raise ValueError("missing IHDR / IDAT / IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline data size mismatch")
    bpp = channels
    recon = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        ftype = raw[y * (stride + 1)]
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-sequential
            cur = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + prev[i]) // 2
                else:
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"unknown filter type {ftype}")
        recon[y] = cur
        prev = cur
    px = recon.astype(np.uint8)
    if channels == 1:
        return width, height, px.reshape(height, width)
    return width, height, px.reshape(height, width, channels)


def png_filter_types(payload: bytes) -> list[int]:
    """The per-scanline filter bytes actually present in a PNG's IDAT —
    a test/diagnostic helper proving the adaptive encoder exercises the
    spec's filter repertoire (decode_png validates CRCs; this re-walks)."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload")
    pos = len(_SIG)
    width = height = channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, _d, color, *_ = struct.unpack(">IIBBBBB", body)
            channels = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    return [raw[y * (stride + 1)] for y in range(height)]
