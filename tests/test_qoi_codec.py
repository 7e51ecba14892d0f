"""QOI codec: spec structure (magic, header, end marker), all six chunk
ops, lossless round-trip (RGB + RGBA), and loud rejection seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.qoi import (
    QOI_END,
    QOI_MAGIC,
    decode_qoi,
    encode_qoi,
)


def _rng():
    return np.random.RandomState(7)


def test_header_and_end_marker():
    q = encode_qoi(4, 3, bytes(4 * 3 * 3), channels=3)
    assert q[:4] == QOI_MAGIC
    w, h, ch, cs = struct.unpack(">IIBB", q[4:14])
    assert (w, h, ch, cs) == (4, 3, 3, 0)
    assert q[-8:] == QOI_END


@pytest.mark.parametrize("w,h,ch", [(1, 1, 3), (3, 2, 3), (24, 16, 4), (31, 17, 3)])
def test_lossless_roundtrip(w, h, ch):
    px = _rng().randint(0, 256, size=h * w * ch).astype(np.uint8).tobytes()
    got = decode_qoi(encode_qoi(w, h, px, channels=ch))
    assert got == (w, h, ch, px)


def test_run_op_compresses_constant_image():
    # 100 equal pixels: header(14) + one LUMA literal (2B: (9,9,9) is a
    # dg=9 delta from the (0,0,0) start state) + ceil(99/62)=2 runs + end(8)
    px = bytes([9, 9, 9]) * 100
    enc = encode_qoi(100, 1, px, channels=3)
    assert len(enc) == 14 + 2 + 2 + 8
    assert decode_qoi(enc)[3] == px


def test_index_op_round_trips_alternating_colors():
    # two alternating colors: second occurrences hit the 64-slot index
    a, b = bytes([10, 20, 30]), bytes([200, 100, 50])
    px = (a + b) * 8
    enc = encode_qoi(16, 1, px, channels=3)
    assert decode_qoi(enc)[3] == px
    # alternating distinct pixels leave no room for runs; after the two
    # literals every pixel is one INDEX byte
    assert len(enc) < 14 + 2 * 4 + 14 * 2 + 8


def test_diff_and_luma_ops_round_trip():
    # small wrapping deltas exercise DIFF; mid deltas exercise LUMA
    vals = [(128, 128, 128)]
    for dr, dg, db in [(1, 1, 1), (-2, -2, -2), (10, 12, 9), (-20, -25, -28)]:
        r, g, b = vals[-1]
        vals.append(((r + dr) % 256, (g + dg) % 256, (b + db) % 256))
    px = b"".join(bytes(v) for v in vals)
    assert decode_qoi(encode_qoi(len(vals), 1, px, channels=3))[3] == px


def test_rgba_alpha_change_uses_rgba_literal():
    px = bytes([5, 6, 7, 255, 5, 6, 7, 128, 5, 6, 7, 128])
    enc = encode_qoi(3, 1, px, channels=4)
    got_w, got_h, got_ch, dec = decode_qoi(enc)
    assert (got_w, got_h, got_ch) == (3, 1, 4)
    assert dec == px
    assert b"\xff" in enc[14:-8]  # QOI_OP_RGBA literal present


def test_wrapping_deltas_at_byte_boundaries():
    px = bytes([255, 255, 255, 0, 0, 0, 255, 254, 253])  # wraps both ways
    assert decode_qoi(encode_qoi(3, 1, px, channels=3))[3] == px


def test_rejections_are_loud():
    good = encode_qoi(2, 2, bytes(12), channels=3)
    with pytest.raises(ValueError, match="magic"):
        decode_qoi(b"nope" + good[4:])
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(good[:-8] + b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated|overflows|trailing"):
        decode_qoi(good[:14] + good[-8:])  # pixels promised, none delivered
    with pytest.raises(ValueError):
        encode_qoi(2, 2, bytes(5), channels=3)  # wrong buffer size
    with pytest.raises(ValueError):
        encode_qoi(2, 2, bytes(8), channels=2)  # bad channel count


def test_fixture_rule_matches_codec():
    from projeto_de_etl_com_api_do_meta_spark.multimodal.binary_ops import (
        qoi_pixels_for_doc,
    )

    for doc_id in (0, 4, 11, 25, 1234):
        w, h, ch, px = qoi_pixels_for_doc(doc_id)
        got = decode_qoi(encode_qoi(w, h, px.tobytes(), channels=ch))
        assert got == (w, h, ch, px.tobytes())
        # rule invariants the oracle relies on
        assert w == 4 + doc_id % 29 and h == 3 + doc_id % 14
        assert ch == (4 if doc_id % 4 == 0 else 3)
