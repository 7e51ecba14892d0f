"""ITU-T G.711 mu-law audio codec (pure numpy) + the format-7 RIFF/WAV
container — a REAL compressed-audio codec for the multimodal pipeline,
implemented from the public spec (ITU-T Recommendation G.711, the
telephony companding standard; same algorithm as CCITT's published
reference tables).

Unlike the JPEG codec's float DCT, mu-law companding is PURE INTEGER
arithmetic (segment/exponent + 4-bit mantissa with bias 0x84), so the
whole encode -> container -> parse -> decode round-trip is exactly
reproducible in SQL — the registry query's DuckDB oracle recomputes every
code byte and every decoded sample bit-for-bit from the document text.

Both directions operate at the 16-bit scale (clip 32635, bias 0x84,
segment ends through 0x7FFF) — the same convention as CPython's audioop —
so loud real-world mu-law audio (full code range, |sample| up to 32124)
survives decode -> re-encode bit-exactly.

MP3/H.264 remain disclosed NotImplementedError seams (binary_ops.py):
they need psychoacoustic models / entropy machinery far beyond spec-level
reimplementation; G.711 and baseline JPEG are the two codecs simple
enough to be REAL here.

Reference analog: none — the reference repo has no binary surface
(payloads are JSON rows, ``src/extract.py``); this exists for the
driver's multimodal north star.
"""

from __future__ import annotations

import struct

import numpy as np

MULAW_CONTENT_TYPE = "audio/basic"  # the traditional mu-law MIME type

_BIAS = 0x84  # 132
_CLIP = 32635  # max input magnitude at the 16-bit scale (32767 - 132 + ...)
# segment upper bounds for the BIASED magnitude (seg k covers <= 0xFF << k);
# the encoder and decoder BOTH work at the 16-bit scale (the G.711 tables
# left-shifted by 2, the form every PCM toolchain uses — bit-identical to
# CPython's audioop lin2ulaw/ulaw2lin), so the pair is one consistent scale
# and encode(decode(c)) == c for all codes except the -0 collapse 0x7F->0xFF.
_SEG_END = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """Linear 16-bit signed samples -> 8-bit mu-law codes (uint8).

    sign | 3-bit segment (exponent) | 4-bit mantissa, all ones-complemented
    per the spec so that silence (0) encodes as 0xFF.  Magnitudes clip at
    32635 so the biased magnitude stays <= 0x7FFF (segment 7 reachable,
    never exceeded).
    """
    x = samples.astype(np.int64)
    # drop the 2 LSBs first (floor shift), the 16->14-bit pre-quantization
    # every reference implementation applies — this is what makes the pair
    # bit-identical to audioop's lin2ulaw; decode outputs are multiples of
    # 4, so the round-trip invariant is unaffected
    x = (x >> 2) << 2
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # segment = floor(log2(mag)) - 7 for mag >= 0x100, else 0 — computed
    # via thresholds so it is integer-exact (mag is in [132, 32767])
    seg = np.zeros(len(x), dtype=np.int64)
    for k, end in enumerate(_SEG_END):
        seg = np.where(mag > end, k + 1, seg)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """8-bit mu-law codes -> linear samples (int16, 16-bit scale, max
    +-32124), the canonical reference form: t = (((c & 0xF) << 3) + 0x84)
    << seg, result = +-(t - 0x84).  With the matching 16-bit encoder above,
    encode(decode(c)) == c for all 256 codes except 0x7F (negative zero),
    which re-encodes to 0xFF (positive zero) — the spec's documented
    sign-of-zero collapse."""
    c = (~codes.astype(np.int64)) & 0xFF
    sign = c & 0x80
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + _BIAS) << seg) - _BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def encode_wav_mulaw(samples: np.ndarray, sample_rate: int) -> bytes:
    """Genuine RIFF/WAV with format code 7 (mu-law), 8 bits per sample."""
    codes = mulaw_encode(samples).tobytes()
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 18, 7, 1, sample_rate, sample_rate, 1, 8
    ) + struct.pack("<H", 0)  # cbSize = 0 (required for non-PCM formats)
    body = fmt + b"data" + struct.pack("<I", len(codes)) + codes
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav_mulaw(payload: bytes) -> tuple[int, np.ndarray]:
    """Chunk-walk a format-7 WAV and decode its mu-law data to linear
    samples; raises on non-mu-law formats (PCM belongs to codecs.py)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            if fmt_code != 7:
                raise ValueError(f"expected mu-law (7), got format {fmt_code}")
            if channels != 1:
                raise ValueError("mono only")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt / data chunk")
    return rate, mulaw_decode(np.frombuffer(data, dtype=np.uint8))
