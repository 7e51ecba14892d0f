"""BMP codec unit tests (no Spark needed)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.bmp import (
    decode_bmp,
    encode_bmp,
    row_stride,
)


def test_row_stride_all_residues():
    # widths hitting every 3w mod 4 residue
    assert [row_stride(w) for w in (1, 2, 3, 4, 5)] == [4, 8, 12, 12, 16]


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (5, 4), (32, 14), (17, 9)])
def test_roundtrip_random_noise(w, h):
    rng = np.random.default_rng(w * 100 + h)
    rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    payload = encode_bmp(w, h, rgb)
    w2, h2, rgb2 = decode_bmp(payload)
    assert (w2, h2) == (w, h)
    assert rgb2 == rgb  # bit-exact through BGR swap + bottom-up + padding


def test_header_fields_and_size():
    w, h = 7, 3
    payload = encode_bmp(w, h, bytes(w * h * 3))
    assert payload[:2] == b"BM"
    file_size = struct.unpack_from("<I", payload, 2)[0]
    assert file_size == len(payload) == 54 + row_stride(w) * h
    offset = struct.unpack_from("<I", payload, 10)[0]
    assert offset == 54
    width, height = struct.unpack_from("<ii", payload, 18)
    assert (width, height) == (w, h)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    assert bpp == 24


def test_bottom_up_row_order():
    # 1x2 image: top pixel red, bottom pixel blue -> file stores bottom
    # row FIRST, in BGR order
    rgb = bytes([255, 0, 0, 0, 0, 255])
    payload = encode_bmp(1, 2, rgb)
    pixels = payload[54:]
    assert pixels[0:3] == bytes([255, 0, 0])  # blue pixel as BGR
    assert pixels[4:7] == bytes([0, 0, 255])  # red pixel as BGR (after pad)
    assert decode_bmp(payload)[2] == rgb


def test_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG" + bytes(60))
    # valid header but 8bpp
    good = bytearray(encode_bmp(2, 2, bytes(12)))
    struct.pack_into("<H", good, 28, 8)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(good))


def test_trailing_junk_tolerated():
    rgb = bytes(range(36))
    payload = encode_bmp(4, 3, rgb) + b"JUNKJUNK"
    assert decode_bmp(payload)[2] == rgb
