"""Minimal-but-real Windows BMP codec (24-bit uncompressed BI_RGB).

Genuine spec-conformant BMP: 14-byte BITMAPFILEHEADER + 40-byte
BITMAPINFOHEADER (BITMAPV1, the universally-readable form), pixel rows
stored BOTTOM-UP in BGR byte order, each row padded to a 4-byte boundary —
the three quirks that make BMP a good round-trip test despite being the
"simple" format.  Any image viewer can open the encoder's output.

Pure stdlib (struct), no external imaging libraries — the container has
none, and the point is that the engine's binary-column plumbing carries
REAL file bytes (see multimodal/binary_ops.py for the delta/RLE, DCT,
LZ77, LZW, prediction and ADPCM codec quadrants; BMP adds the
row-padding/bottom-up/channel-swap quadrant).
"""

from __future__ import annotations

import struct

BMP_CONTENT_TYPE = "image/bmp"

_FILE_HEADER = struct.Struct("<2sIHHI")
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def row_stride(width: int) -> int:
    """Padded byte width of one 24-bit row (4-byte aligned)."""
    return (3 * width + 3) // 4 * 4


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down RGB bytes (len == width*height*3) as a 24-bit BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    stride = row_stride(width)
    image_size = stride * height
    file_size = 14 + 40 + image_size
    out = bytearray()
    out += _FILE_HEADER.pack(b"BM", file_size, 0, 0, 54)
    out += _INFO_HEADER.pack(
        40,  # biSize
        width,
        height,  # positive height => bottom-up rows
        1,  # planes
        24,  # bpp
        0,  # BI_RGB (uncompressed)
        image_size,
        2835,  # 72 DPI in pixels/metre
        2835,
        0,
        0,
    )
    pad = b"\x00" * (stride - 3 * width)
    # bottom-up rows, BGR per pixel
    for r in range(height - 1, -1, -1):
        row = rgb[r * width * 3 : (r + 1) * width * 3]
        bgr = bytearray(len(row))
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        out += bytes(bgr) + pad
    return bytes(out)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit BI_RGB BMP -> (width, height, top-down RGB bytes).

    Validates the magic, header sizes, bit depth and compression mode, and
    tolerates trailing junk after the pixel array (per spec, readers use
    the data offset + dimensions, not the file length).
    """
    magic, file_size, _r1, _r2, offset = _FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    (
        bi_size,
        width,
        height,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _clr_used,
        _clr_imp,
    ) = _INFO_HEADER.unpack_from(payload, 14)
    if bi_size < 40:
        raise ValueError(f"unsupported header size {bi_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BI_RGB supported")
    bottom_up = height > 0
    height = abs(height)
    stride = row_stride(width)
    rgb = bytearray(width * height * 3)
    for i in range(height):
        src = offset + i * stride
        row = payload[src : src + 3 * width]
        r = (height - 1 - i) if bottom_up else i
        dst = r * width * 3
        rgb[dst + 0 : dst + 3 * width : 3] = row[2::3]
        rgb[dst + 1 : dst + 3 * width : 3] = row[1::3]
        rgb[dst + 2 : dst + 3 * width : 3] = row[0::3]
    return width, height, bytes(rgb)
