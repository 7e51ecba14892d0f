"""IMA (DVI4) ADPCM codec — pure-stdlib, WAV format 0x11 container.

IMA ADPCM is the classic 4-bit adaptive differential PCM codec (IMA
"Recommended Practices for Enhancing Digital Audio Compatibility", 1992;
WAV format tag 0x0011; RTP's DVI4).  It is LOSSY but a pure INTEGER
state machine — predictor + step-table index, nibble-driven updates —
so, unlike JPEG's float DCT, an external SQL engine can replay the
entire encode+decode walk exactly and pin every reconstructed sample.

Implemented surface:

* ``encode_ima`` / ``decode_ima``: the canonical nibble quantizer (sign
  bit + 3 magnitude bits against the 89-entry step table), encoder
  tracking the DECODER's reconstruction (textbook closed-loop form),
  predictor clamped to int16, index clamped to [0, 88].
* ``encode_wav_ima`` / ``decode_wav_ima``: a genuine RIFF/WAVE container
  with fmt tag 0x0011 and a single IMA block per file — the 4-byte
  block header carries (first sample, step index) per spec, then two
  samples per byte, low nibble first.

The 4:1 compression quadrant beside G.711's companding (8:5.33 log PCM):
ADPCM codes DIFFERENCES with an adaptive step, G.711 codes AMPLITUDES
with a fixed curve.
"""

from __future__ import annotations

import struct

ADPCM_CONTENT_TYPE = "audio/x-adpcm"

STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(v: int) -> int:
    return 0 if v < 0 else (88 if v > 88 else v)


def _encode_nibble(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one sample against (pred, index); returns
    (nibble, new_pred, new_index) with new_pred the DECODER reconstruction."""
    step = STEP_TABLE[index]
    diff = sample - pred
    sign = 8 if diff < 0 else 0
    ad = -diff if diff < 0 else diff
    n = 0
    if ad >= step:
        n |= 4
        ad -= step
    if ad >= step >> 1:
        n |= 2
        ad -= step >> 1
    if ad >= step >> 2:
        n |= 1
    nibble = sign | n
    diffq = (step >> 3) + (step if n & 4 else 0) + (
        (step >> 1) if n & 2 else 0
    ) + ((step >> 2) if n & 1 else 0)
    pred = _clamp16(pred - diffq if sign else pred + diffq)
    index = _clamp_idx(index + INDEX_TABLE[n])
    return nibble, pred, index


def _decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int, int]:
    step = STEP_TABLE[index]
    n = nibble & 7
    diffq = (step >> 3) + (step if n & 4 else 0) + (
        (step >> 1) if n & 2 else 0
    ) + ((step >> 2) if n & 1 else 0)
    pred = _clamp16(pred - diffq if nibble & 8 else pred + diffq)
    index = _clamp_idx(index + INDEX_TABLE[n])
    return pred, pred, index


def encode_ima(samples: list[int], pred: int, index: int = 0) -> bytes:
    """Encode int16 samples (closed-loop) starting from state (pred, index);
    two nibbles per byte, LOW nibble first (WAV 0x11 packing)."""
    nibbles = []
    for s in samples:
        nb, pred, index = _encode_nibble(int(s), pred, index)
        nibbles.append(nb)
    if len(nibbles) % 2:
        nibbles.append(0)
    return bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )


def decode_ima(
    data: bytes, n_samples: int, pred: int, index: int = 0
) -> list[int]:
    out = []
    for byte in data:
        for nb in (byte & 0x0F, byte >> 4):
            if len(out) == n_samples:
                break
            recon, pred, index = _decode_nibble(nb, pred, index)
            out.append(recon)
    if len(out) != n_samples:
        raise ValueError(f"decoded {len(out)} samples, expected {n_samples}")
    return out


def encode_wav_ima(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Single-block IMA-WAV (format 0x0011): the block header carries the
    verbatim first sample + initial step index 0, then the remaining
    samples as closed-loop nibbles."""
    if not samples:
        raise ValueError("need at least one sample")
    first = int(samples[0])
    payload = encode_ima([int(s) for s in samples[1:]], pred=first, index=0)
    block = struct.pack("<hBB", first, 0, 0) + payload
    block_align = len(block)
    n = len(samples)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate, sample_rate * block_align // max(n, 1),
        block_align, 4, 2, n,
    )
    data = block
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav_ima(data: bytes) -> tuple[int, list[int]]:
    """Decode a single-block IMA-WAV produced by encode_wav_ima; returns
    (sample_rate, samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, n_samples, block = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            tag, _ch, rate = struct.unpack("<HHI", body[:8])
            if tag != 0x0011:
                raise ValueError(f"not IMA ADPCM (format 0x{tag:04x})")
            (n_samples,) = struct.unpack("<H", body[16:18])
        elif cid == b"fact":
            (n_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            block = body
        pos += 8 + ln + (ln & 1)
    if rate is None or block is None or n_samples is None:
        raise ValueError("missing fmt/fact/data chunk")
    first, index, _rsv = struct.unpack("<hBB", block[:4])
    rest = decode_ima(block[4:], n_samples - 1, pred=first, index=index)
    return rate, [first] + rest
