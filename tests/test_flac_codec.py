"""FLAC-subset codec: stream structure (marker, STREAMINFO MD5, frame
CRC-8/CRC-16), bit-lossless round-trips, real compression on predictable
signals, decoder coverage beyond the encoder (partition orders, escape
codes), and the disclosed rejection seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded_number,
    decode_flac,
    encode_flac,
)


def _rng():
    return np.random.RandomState(7)


def test_stream_structure():
    p = encode_flac(np.arange(100, dtype=np.int16), 8000)
    assert p[:4] == b"fLaC"
    assert p[4] & 0x80  # STREAMINFO is the last metadata block
    assert p[4] & 0x7F == 0  # block type 0 = STREAMINFO
    (length,) = struct.unpack(">I", b"\x00" + p[5:8])
    assert length == 34
    # frame sync appears right after the metadata
    assert p[8 + 34] == 0xFF and (p[8 + 34 + 1] & 0xFC) == 0xF8


@pytest.mark.parametrize(
    "name,gen",
    [
        ("empty", lambda r: np.zeros(0, np.int16)),
        ("constant", lambda r: np.full(5000, -123, np.int16)),
        ("ramp", lambda r: (np.arange(9000) % 30000 - 15000).astype(np.int16)),
        ("noise", lambda r: r.randint(-32768, 32768, 10000).astype(np.int16)),
        ("extremes", lambda r: np.array([1, -1, 0, 32767, -32768], np.int16)),
        (
            "multi_frame",
            lambda r: r.randint(-1000, 1000, 3 * 4096 + 17).astype(np.int16),
        ),
    ],
)
def test_lossless_roundtrip(name, gen):
    x = gen(_rng())
    rate, y = decode_flac(encode_flac(x, 16000))
    assert rate == 16000
    assert np.array_equal(x, y), name


def test_actually_compresses_predictable_signals():
    sine = (10000 * np.sin(np.arange(8192) / 20)).astype(np.int16)
    p = encode_flac(sine, 8000)
    assert len(p) < 0.6 * sine.nbytes  # fixed predictor + Rice earns its keep
    const = np.full(8192, 42, np.int16)
    assert len(encode_flac(const, 8000)) < 100  # CONSTANT subframes


def test_crc_corruption_detected():
    x = _rng().randint(-500, 500, 2000).astype(np.int16)
    p = bytearray(encode_flac(x, 8000))
    p[-3] ^= 0x10  # flip a bit in the last frame's body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(p))


def test_streaminfo_md5_guards_losslessness():
    x = _rng().randint(-500, 500, 100).astype(np.int16)
    p = bytearray(encode_flac(x, 8000))
    p[8 + 18] ^= 0xFF  # corrupt the STREAMINFO MD5 field itself
    with pytest.raises(ValueError, match="MD5|CRC"):
        decode_flac(bytes(p))


def _manual_frame_stream(subframe_bits, bs, total):
    """Hand-assemble a 1-frame stream around hand-written subframe bits —
    lets tests cover decoder paths the encoder never emits."""
    info = _BitWriter()
    info.write(bs, 16)
    info.write(bs, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(8000, 20)
    info.write(0, 3)
    info.write(15, 5)
    info.write(total, 36)
    body = info.bytes() + b"\x00" * 16  # md5 patched after decode-side calc
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)
    hdr.write(0b0000, 4)
    hdr.write(0b0000, 4)
    hdr.write(0b100, 3)
    hdr.write(0, 1)
    head = hdr.bytes() + _utf8_coded_number(0) + struct.pack(">H", bs - 1)
    head += bytes([_crc8(head)])
    frame = head + subframe_bits
    frame += struct.pack(">H", _crc16(frame))
    return b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body + frame


def _patch_md5(stream, samples):
    import hashlib

    md5 = hashlib.md5(np.asarray(samples, "<i2").tobytes()).digest()
    return stream[: 8 + 18] + md5 + stream[8 + 34 :]


def test_decoder_handles_partition_order_and_escape():
    """Partition order 1 (two Rice partitions) and the escape code (raw
    5-bit-length residuals) — spec paths our encoder doesn't emit."""
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b001000, 6)  # FIXED order 0
    w.write(0, 1)
    w.write(0b00, 2)  # 4-bit Rice params
    w.write(1, 4)  # partition order 1 -> 2 partitions of 2
    # partition 1: k=0 (pure unary)
    w.write(0, 4)
    for v in (3, 4):  # zigzag of  2, 2  -> unary 4, 4? no: zigzag(2)=4
        pass
    # write residuals [1, -1] as zigzag [2, 1] with k=0
    for z in (2, 1):
        w.write_unary(z)
    # partition 2: escape code, 6 raw bits each, residuals [5, -5]
    w.write(0b1111, 4)
    w.write(6, 5)
    for v in (5, -5):
        w.write(v & 0x3F, 6)
    w.align()
    stream = _manual_frame_stream(w.bytes(), bs=4, total=4)
    stream = _patch_md5(stream, [1, -1, 5, -5])
    rate, y = decode_flac(stream)
    assert y.tolist() == [1, -1, 5, -5]


def test_decoder_fixed_orders_3_and_4():
    """Orders 3/4 exist in the spec; the encoder tops out at 2 — cover the
    restore recurrences by round-tripping residual streams by hand."""
    x = np.array([10, 20, 35, 50, 61, 70, 80, 95], dtype=np.int64)
    for order in (3, 4):
        res = np.diff(x, n=order)
        w = _BitWriter()
        w.write(0, 1)
        w.write(0b001000 | order, 6)
        w.write(0, 1)
        for s in x[:order]:
            w.write(int(s) & 0xFFFF, 16)
        w.write(0b00, 2)
        w.write(0, 4)
        w.write(0, 4)  # k = 0
        for e in res:
            z = int(e) * 2 if e >= 0 else -2 * int(e) - 1
            w.write_unary(z)
        w.align()
        stream = _manual_frame_stream(w.bytes(), bs=len(x), total=len(x))
        stream = _patch_md5(stream, x.astype(np.int16))
        _, y = decode_flac(stream)
        assert y.tolist() == x.tolist(), order


def test_rejections_are_loud():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFxxxx")
    with pytest.raises(ValueError, match="int16"):
        encode_flac(np.array([40000]), 8000)
    # LPC subframe type raises the disclosed seam
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b100000, 6)  # LPC order 1
    w.write(0, 1)
    w.align()
    stream = _manual_frame_stream(w.bytes(), bs=1, total=1)
    with pytest.raises(ValueError, match="LPC"):
        decode_flac(stream)


def test_utf8_coded_number_spec_vectors():
    assert _utf8_coded_number(0) == b"\x00"
    assert _utf8_coded_number(0x7F) == b"\x7f"
    # 2-byte form mirrors UTF-8: 0x80 -> 0xC2 0x80
    assert _utf8_coded_number(0x80) == b"\xc2\x80"
    assert _utf8_coded_number(0x7FF) == b"\xdf\xbf"
    assert _utf8_coded_number(0x800) == b"\xe0\xa0\x80"
