"""QOI ("Quite OK Image") codec — pure-stdlib, spec-complete.

QOI is a real, published lossless image format (qoiformat.org, spec v1.0,
public domain): a 14-byte header, then a byte stream of six chunk ops over
a running 64-slot color index, a previous-pixel delta, and run-length
encoding, closed by an 8-byte end marker.  It complements the repo's other
REAL codecs (PNG = DEFLATE + filters, JPEG = DCT, FLAC = linear
prediction + Rice, G.711 = companding) with the dictionary/delta/RLE
family — and it is the simplest format whose encoder output is
byte-reproducible across implementations, because the spec fixes the op
priority order (RUN > INDEX > DIFF > LUMA > RGB/RGBA).

Both ``encode_qoi`` and ``decode_qoi`` implement the full spec:

* QOI_OP_RUN   (0b11xxxxxx)  runs of 1..62 equal pixels (bias -1)
* QOI_OP_INDEX (0b00xxxxxx)  64-slot hash index, hash = (3r+5g+7b+11a) % 64
* QOI_OP_DIFF  (0b01rrggbb)  per-channel wrapping deltas in [-2, 1]
* QOI_OP_LUMA  (0b10gggggg)  green delta [-32, 31] + dr-dg/db-dg in [-8, 7]
* QOI_OP_RGB   (0xFE)        literal RGB (alpha unchanged)
* QOI_OP_RGBA  (0xFF)        literal RGBA

Channels 3 (RGB) and 4 (RGBA) as per spec; decode verifies the magic, the
declared pixel count, and the end marker.
"""

from __future__ import annotations

import struct

QOI_MAGIC = b"qoif"
QOI_END = b"\x00\x00\x00\x00\x00\x00\x00\x01"

QOI_CONTENT_TYPE = "image/qoi"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode raw interleaved pixels (RGB or RGBA byte triples/quads,
    row-major) into a QOI file, following the spec's op priority order so
    the output matches the reference encoder byte-for-byte."""
    if channels not in (3, 4):
        raise ValueError(f"QOI supports 3 or 4 channels, got {channels}")
    n_px = width * height
    if len(pixels) != n_px * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {n_px * channels}"
        )
    out = bytearray()
    out += QOI_MAGIC
    out += struct.pack(">IIBB", width, height, channels, 0)

    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    pos = 0
    for _ in range(n_px):
        if channels == 4:
            px = (pixels[pos], pixels[pos + 1], pixels[pos + 2], pixels[pos + 3])
        else:
            px = (pixels[pos], pixels[pos + 1], pixels[pos + 2], prev[3])
        pos += channels
        if px == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run > 0:
            out.append(_OP_RUN | (run - 1))
            run = 0
        h = _hash(*px)
        if index[h] == px:
            out.append(_OP_INDEX | h)
        else:
            index[h] = px
            r, g, b, a = px
            pr, pg, pb, pa = prev
            if a == pa:
                # wrapping int8 deltas
                dr = ((r - pr + 128) & 0xFF) - 128
                dg = ((g - pg + 128) & 0xFF) - 128
                db = ((b - pb + 128) & 0xFF) - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(_OP_RGB)
                    out += bytes((r, g, b))
            else:
                out.append(_OP_RGBA)
                out += bytes((r, g, b, a))
        prev = px
    if run > 0:
        out.append(_OP_RUN | (run - 1))
    out += QOI_END
    return bytes(out)


def decode_qoi(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a QOI file; returns (width, height, channels, pixels).
    Verifies magic, header sanity, exact pixel count, and end marker."""
    if data[:4] != QOI_MAGIC:
        raise ValueError("not a QOI file (bad magic)")
    width, height, channels, colorspace = struct.unpack(">IIBB", data[4:14])
    if channels not in (3, 4):
        raise ValueError(f"bad channel count {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"bad colorspace {colorspace}")
    if data[-8:] != QOI_END:
        raise ValueError("missing QOI end marker")
    n_px = width * height
    out = bytearray(n_px * channels)
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    pos = 14
    end = len(data) - 8
    i = 0
    while i < n_px:
        if pos >= end:
            raise ValueError("QOI stream truncated")
        b0 = data[pos]
        pos += 1
        if b0 == _OP_RGB:
            px = (data[pos], data[pos + 1], data[pos + 2], px[3])
            pos += 3
        elif b0 == _OP_RGBA:
            px = (data[pos], data[pos + 1], data[pos + 2], data[pos + 3])
            pos += 4
        else:
            tag = b0 & 0xC0
            if tag == _OP_INDEX:
                px = index[b0 & 0x3F]
            elif tag == _OP_DIFF:
                dr = ((b0 >> 4) & 0x03) - 2
                dg = ((b0 >> 2) & 0x03) - 2
                db = (b0 & 0x03) - 2
                px = (
                    (px[0] + dr) & 0xFF,
                    (px[1] + dg) & 0xFF,
                    (px[2] + db) & 0xFF,
                    px[3],
                )
            elif tag == _OP_LUMA:
                dg = (b0 & 0x3F) - 32
                b1 = data[pos]
                pos += 1
                dr = dg + ((b1 >> 4) & 0x0F) - 8
                db = dg + (b1 & 0x0F) - 8
                px = (
                    (px[0] + dr) & 0xFF,
                    (px[1] + dg) & 0xFF,
                    (px[2] + db) & 0xFF,
                    px[3],
                )
            else:  # _OP_RUN
                run = (b0 & 0x3F) + 1
                if i + run > n_px:
                    raise ValueError("QOI run overflows pixel count")
                for _ in range(run):
                    off = i * channels
                    out[off] = px[0]
                    out[off + 1] = px[1]
                    out[off + 2] = px[2]
                    if channels == 4:
                        out[off + 3] = px[3]
                    i += 1
                continue
        index[_hash(*px)] = px
        off = i * channels
        out[off] = px[0]
        out[off + 1] = px[1]
        out[off + 2] = px[2]
        if channels == 4:
            out[off + 3] = px[3]
        i += 1
    if pos != end:
        raise ValueError("trailing bytes before QOI end marker")
    return width, height, channels, bytes(out)
