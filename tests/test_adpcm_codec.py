"""IMA ADPCM codec: container structure, state-machine properties
(step adaptation, clamps), closed-loop encoder==decoder reconstruction,
and loud rejection seams."""

from __future__ import annotations

import struct

import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    _decode_nibble,
    _encode_nibble,
    decode_ima,
    decode_wav_ima,
    encode_ima,
    encode_wav_ima,
)


def test_tables_are_spec():
    assert len(STEP_TABLE) == 89 and STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert INDEX_TABLE == (-1, -1, -1, -1, 2, 4, 6, 8)
    # step table is strictly increasing (the adaptation invariant)
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))


def test_closed_loop_encoder_tracks_decoder():
    """The encoder's predictor after each sample equals the decoder's
    reconstruction — the property that makes the SQL single-walk oracle
    verify BOTH halves."""
    pred_e, idx_e = 0, 0
    pred_d, idx_d = 0, 0
    for s in [100, 5000, -3000, 32767, -32768, 42, 0, 2000, -1, 17]:
        nb, pred_e, idx_e = _encode_nibble(s, pred_e, idx_e)
        recon, pred_d, idx_d = _decode_nibble(nb, pred_d, idx_d)
        assert (pred_e, idx_e) == (pred_d, idx_d)
        assert recon == pred_e


def test_predictor_and_index_clamps():
    # drive hard to the rails: repeated max-magnitude samples; once the
    # predictor converges, zero-magnitude nibbles walk the index back DOWN
    # (adaptation is symmetric), so the invariants are the clamps + rails
    pred, idx = 0, 0
    peak_idx = 0
    for _ in range(200):
        _, pred, idx = _encode_nibble(32767, pred, idx)
        peak_idx = max(peak_idx, idx)
        assert -32768 <= pred <= 32767 and 0 <= idx <= 88
    # the step ramps up hard during the chase (the predictor catches
    # 32767 around index ~80, before the table's 88 rail) then decays
    assert peak_idx >= 60 and abs(pred - 32767) <= STEP_TABLE[idx]
    for _ in range(200):
        _, pred, idx = _encode_nibble(-32768, pred, idx)
        assert -32768 <= pred <= 32767 and 0 <= idx <= 88
    assert abs(pred - -32768) <= STEP_TABLE[idx]


def test_steady_state_error_is_small():
    import math

    s = [int(2000 * math.sin(i / 10)) for i in range(200)]
    _, r = decode_wav_ima(encode_wav_ima(s))
    tail_err = max(abs(a - b) for a, b in zip(s[20:], r[20:]))
    assert tail_err <= 60  # once the step adapts, error ~ step/8


def test_wav_container_fields():
    wav = encode_wav_ima([0, 100, 200], sample_rate=16000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    i = wav.index(b"fmt ")
    tag, ch, rate = struct.unpack("<HHI", wav[i + 8 : i + 16])
    assert (tag, ch, rate) == (0x0011, 1, 16000)
    got_rate, rec = decode_wav_ima(wav)
    assert got_rate == 16000 and len(rec) == 3 and rec[0] == 0


def test_odd_sample_count_pads_low_nibble_first():
    enc = encode_ima([100, 200, 300], pred=0, index=0)
    assert len(enc) == 2  # 3 nibbles + 1 pad
    assert decode_ima(enc, 3, pred=0, index=0)  # pad nibble ignored


def test_rejections_are_loud():
    with pytest.raises(ValueError):
        encode_wav_ima([])
    good = encode_wav_ima([1, 2, 3])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_ima(b"nope" + good[4:])
    # wrong format tag
    bad = bytearray(good)
    i = bad.index(b"fmt ")
    bad[i + 8 : i + 10] = struct.pack("<H", 1)
    with pytest.raises(ValueError, match="IMA"):
        decode_wav_ima(bytes(bad))
    with pytest.raises(ValueError, match="decoded"):
        decode_ima(b"\x00", 5, pred=0, index=0)  # too few nibbles
