"""GIF87a codec: container structure, real-LZW properties (variable code
widths, CLEAR/EOI, KwKwK, 4096-entry dictionary reset), lossless
round-trip, and loud rejection seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _rng():
    return np.random.RandomState(23)


def test_container_structure():
    g = encode_gif(4, 3, bytes(12))
    assert g[:6] == b"GIF87a"
    w, h, packed, bg, ar = struct.unpack("<HHBBB", g[6:13])
    assert (w, h) == (4, 3)
    assert packed & 0x80 and (packed & 0x07) == 0x07  # 256-entry table
    # grayscale palette: entry i is (i, i, i)
    pal = g[13 : 13 + 768]
    assert pal[3 * 200 : 3 * 200 + 3] == bytes((200, 200, 200))
    assert g[13 + 768] == 0x2C  # image descriptor
    assert g[-1] == 0x3B  # trailer


@pytest.mark.parametrize(
    "w,h", [(1, 1), (7, 5), (32, 15), (255, 7), (300, 40)]
)
def test_lossless_roundtrip(w, h):
    px = _rng().randint(0, 256, w * h).astype(np.uint8).tobytes()
    assert decode_gif(encode_gif(w, h, px)) == (w, h, px)


def test_runs_compress_and_roundtrip():
    px = bytes([9]) * 5000  # one long run: LZW chains 9,99,999,...
    enc = encode_gif(100, 50, px)
    assert len(enc) < 13 + 768 + 300  # far below 5000 raw bytes
    assert decode_gif(enc)[2] == px


def test_kwkwk_case():
    # 'ababab...' pattern triggers the code==len(table) decoder branch
    px = bytes([1, 2] * 64 + [1, 1, 2, 1, 1])
    enc = _lzw_encode(px, 8)
    assert _lzw_decode(enc, 8, len(px)) == px


def test_dictionary_reset_at_4096():
    # high-entropy stream long enough to fill the 4096-entry table
    px = _rng().randint(0, 256, 30000).astype(np.uint8).tobytes()
    enc = _lzw_encode(px, 8)
    assert _lzw_decode(enc, 8, len(px)) == px


def test_sub_block_spanning():
    # LZW data > 255 bytes must span multiple sub-blocks
    px = _rng().randint(0, 256, 2000).astype(np.uint8).tobytes()
    g = encode_gif(100, 20, px)
    assert decode_gif(g) == (100, 20, px)


def test_gif89a_and_extension_blocks_are_skipped():
    g = bytearray(encode_gif(3, 2, bytes(6)))
    g[:6] = b"GIF89a"
    # inject a graphic-control-style extension before the image descriptor
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    idx = 13 + 768
    g2 = bytes(g[:idx]) + ext + bytes(g[idx:])
    assert decode_gif(g2) == (3, 2, bytes(6))


def test_rejections_are_loud():
    good = encode_gif(2, 2, bytes(4))
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOPE37" + good[6:])
    with pytest.raises(ValueError):
        encode_gif(2, 2, bytes(5))  # wrong buffer size
    with pytest.raises(ValueError, match="truncated|expected|beyond"):
        # truncate the LZW payload: drop the last sub-block byte
        decode_gif(good[:-4] + good[-2:])
    with pytest.raises(NotImplementedError):
        bad = bytearray(good)
        bad[13 + 768 + 9] |= 0x40  # set interlace flag
        decode_gif(bytes(bad))


def test_fixture_rule_matches_codec():
    from projeto_de_etl_com_api_do_meta_spark.multimodal.binary_ops import (
        gif_pixels_for_doc,
    )

    for doc_id in (5, 12, 33, 1234):
        w, h, px = gif_pixels_for_doc(doc_id)
        assert decode_gif(encode_gif(w, h, px.tobytes())) == (w, h, px.tobytes())
        assert w == 6 + doc_id % 27 and h == 4 + doc_id % 12
