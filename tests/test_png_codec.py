"""PNG codec: spec structure (signature, chunk CRCs), lossless round-trip,
all five filter types, and the disclosed rejection seams."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.png import (
    decode_png,
    encode_png,
    png_filter_types,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _rng():
    return np.random.RandomState(11)


def test_signature_and_chunk_layout():
    p = encode_png(4, 3, bytes(4 * 3 * 3), channels=3)
    assert p[:8] == _SIG
    # walk chunks: IHDR first, IEND last, each CRC valid
    pos, names = 8, []
    while pos < len(p):
        (length,) = struct.unpack_from(">I", p, pos)
        ctype = p[pos + 4 : pos + 8]
        body = p[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", p, pos + 8 + length)
        assert zlib.crc32(ctype + body) & 0xFFFFFFFF == crc
        names.append(ctype)
        pos += 12 + length
    assert names[0] == b"IHDR" and names[-1] == b"IEND" and b"IDAT" in names


@pytest.mark.parametrize("w,h,ch", [(1, 1, 1), (3, 2, 3), (24, 16, 3), (31, 17, 1)])
def test_lossless_roundtrip(w, h, ch):
    px = _rng().randint(0, 256, size=h * w * ch).astype(np.uint8)
    got_w, got_h, out = decode_png(encode_png(w, h, px.tobytes(), channels=ch))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(out.reshape(-1), px)


def test_adaptive_encoder_uses_all_five_filters():
    seen = set()
    # horizontal ramp -> Sub, vertical ramp -> Up, noise -> None/Paeth mix
    grad_h = (np.arange(24)[None, :] * 10 % 256).astype(np.uint8).repeat(16, 0)
    grad_v = (np.arange(16)[:, None] * 10 % 256).astype(np.uint8).repeat(24, 1)
    noise = _rng().randint(0, 256, size=(16, 24)).astype(np.uint8)
    for img in (grad_h, grad_v, noise):
        p = encode_png(24, 16, img.tobytes(), channels=1)
        assert np.array_equal(decode_png(p)[2], img)
        seen.update(png_filter_types(p))
    assert seen == {0, 1, 2, 3, 4}, seen


def _manual_png(width, height, channels, scanlines, color=None, interlace=0,
                depth=8, split_idat=False):
    """Hand-assemble a PNG from raw (filter_byte + data) scanlines."""
    color = {1: 0, 3: 2, 4: 6}[channels] if color is None else color
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, interlace)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    raw = zlib.compress(b"".join(scanlines))
    if split_idat:
        mid = len(raw) // 2
        idats = chunk(b"IDAT", raw[:mid]) + chunk(b"IDAT", raw[mid:])
    else:
        idats = chunk(b"IDAT", raw)
    return _SIG + chunk(b"IHDR", ihdr) + idats + chunk(b"IEND", b"")


def test_each_filter_type_reconstructs_per_spec():
    """Hand-built 2-row streams, one per filter type, checked against
    hand-computed reconstructions (spec 9.2 recurrences)."""
    # 4 px greyscale rows; row0 always unfiltered [10, 20, 30, 40]
    r0 = bytes([0, 10, 20, 30, 40])
    cases = {
        # Sub: recon[i] = cur[i] + recon[i-1]
        1: (bytes([1, 5, 5, 5, 5]), [5, 10, 15, 20]),
        # Up: recon[i] = cur[i] + prev[i]
        2: (bytes([2, 1, 2, 3, 4]), [11, 22, 33, 44]),
        # Average: recon[i] = cur[i] + (left + up)//2
        3: (bytes([3, 6, 7, 8, 9]), [11, 22, 34, 46]),
        # Paeth: nearest of left/up/upleft to left+up-upleft — here pb
        # (=|p-up|) is smallest at every pixel, so the predictor is "up"
        4: (bytes([4, 2, 2, 2, 2]), [12, 22, 32, 42]),
    }
    for ftype, (row1, want) in cases.items():
        p = _manual_png(4, 2, 1, [r0, row1])
        _, _, out = decode_png(p)
        assert out[0].tolist() == [10, 20, 30, 40], ftype
        assert out[1].tolist() == want, ftype


def test_average_filter_floor_division_first_pixel():
    # first pixel of an Average row has left=0: pred = up // 2 (floor)
    r0 = bytes([0, 11, 0, 0, 0])
    r1 = bytes([3, 100, 0, 0, 0])
    _, _, out = decode_png(_manual_png(4, 2, 1, [r0, r1]))
    assert out[1, 0] == 100 + 11 // 2


def test_multiple_idat_chunks_concatenate():
    px = _rng().randint(0, 256, size=(5, 7)).astype(np.uint8)
    lines = [bytes([0]) + px[y].tobytes() for y in range(5)]
    _, _, out = decode_png(_manual_png(7, 5, 1, lines, split_idat=True))
    assert np.array_equal(out, px)


def test_rgba_color_type_6_decodes():
    px = _rng().randint(0, 256, size=(3, 4, 4)).astype(np.uint8)
    lines = [bytes([0]) + px[y].tobytes() for y in range(3)]
    _, _, out = decode_png(_manual_png(4, 3, 4, lines))
    assert out.shape == (3, 4, 4) and np.array_equal(out, px)


def test_crc_corruption_detected():
    p = bytearray(encode_png(8, 8, bytes(8 * 8 * 3), channels=3))
    idat_at = bytes(p).index(b"IDAT")
    p[idat_at + 6] ^= 0x40  # flip a bit inside the IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))


def test_rejections_are_loud():
    good = [bytes([0, 1, 2])]  # 2px greyscale row
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG!" + encode_png(1, 1, b"\x00", channels=1)[8:])
    with pytest.raises(ValueError, match="interlace"):
        decode_png(_manual_png(2, 1, 1, good, interlace=1))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_manual_png(2, 1, 1, good, depth=16))
    with pytest.raises(ValueError, match="color type"):
        decode_png(_manual_png(2, 1, 1, good, color=3))  # palette
    with pytest.raises(ValueError, match="filter type"):
        decode_png(_manual_png(2, 1, 1, [bytes([9, 1, 2])]))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(_manual_png(2, 2, 1, good))  # one scanline missing


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="channels"):
        encode_png(2, 2, bytes(8), channels=2)
    with pytest.raises(ValueError, match="does not match"):
        encode_png(2, 2, bytes(5), channels=1)
