"""FLAC codec subset (pure stdlib + numpy) — a REAL lossless compressed
audio format for the multimodal pipeline, implemented from the public spec
(RFC 9639 / the xiph.org FLAC format: fLaC marker, STREAMINFO metadata
block, frame sync + CRC-8 header + CRC-16 footer, CONSTANT / VERBATIM /
FIXED-predictor subframes, partitioned Rice residual coding).

FLAC is the audio sibling of PNG (png.py): everything is integer
arithmetic — fixed linear predictors over int samples, zigzag Rice codes,
CRC polynomials — so encode -> decode is BIT-LOSSLESS and the registry
query's oracle can pin decoded sample sums exactly from the generation
rule, the same contract class as the PNG pixel-sum oracle.

Scope (the honesty bar of jpeg.py / g711.py / png.py):

* encoder: mono, 16-bit, fixed block size 4096; per-block best FIXED
  predictor order 0-2 by minimum absolute residual sum, single Rice
  partition (partition order 0 — legal per spec), Rice parameter from the
  mean residual magnitude, CONSTANT subframe for flat blocks, STREAMINFO
  carries the spec's MD5 of the raw little-endian samples.
* decoder: parses the marker and ALL metadata blocks, verifies frame
  CRC-8 and CRC-16, decodes CONSTANT / VERBATIM / FIXED orders 0-4 with
  ANY partition order and the Rice escape code — i.e. it reads more of
  the format than the encoder emits, like the JPEG/PNG decoders.
  LPC subframes, stereo decorrelation, and wasted bits raise ValueError —
  disclosed seams, not silent wrong answers.

Reference analog: none — the reference repo has no binary surface; this
exists for the driver's multimodal north star.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_CONTENT_TYPE = "audio/flac"

_BLOCK = 4096  # fixed block size (frames except the last are this long)


# -- bit I/O -------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bit offset within current byte (0 = MSB next)

    def read(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            byte = self.data[self.pos]
            out = (out << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


# -- CRCs (spec polynomials) -----------------------------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


# -- fixed predictors (spec 9.2.2: orders 0-4) -----------------------------------

def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(res: np.ndarray, warmup: np.ndarray, order: int) -> np.ndarray:
    """Invert order-k differencing given the k warmup samples."""
    out = warmup.astype(np.int64).tolist()
    if order == 0:
        return res.astype(np.int64)
    for e in res.astype(np.int64):
        if order == 1:
            v = e + out[-1]
        elif order == 2:
            v = e + 2 * out[-1] - out[-2]
        elif order == 3:
            v = e + 3 * out[-1] - 3 * out[-2] + out[-3]
        else:
            v = e + 4 * out[-1] - 6 * out[-2] + 4 * out[-3] - out[-4]
        out.append(v)
    return np.array(out, dtype=np.int64)


# -- encoder ------------------------------------------------------------------


def _utf8_coded_number(n: int) -> bytes:
    """The frame header's UTF-8-style coded number (spec 9.1.5): a t-byte
    form carries 6*(t-1) + (7-t) payload bits, lead byte = t ones, a zero,
    then the high payload bits — exactly the UTF-8 scheme extended past
    4 bytes."""
    if n < 0x80:
        return bytes([n])
    t = 2
    while n >= (1 << (6 * (t - 1) + 7 - t)):
        t += 1
    cont = t - 1
    lead_mask = (0xFF << (8 - t)) & 0xFF
    out = [lead_mask | (n >> (6 * cont))]
    for i in range(cont - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_param(res: np.ndarray) -> int:
    mean = int(np.abs(res).mean() + 1) if len(res) else 1
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_subframe(w: _BitWriter, x: np.ndarray) -> None:
    """Best of CONSTANT / FIXED order 0-2 for one block of int16 samples."""
    w.write(0, 1)  # zero pad bit
    if len(x) and (x == x[0]).all():
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(x[0]) & 0xFFFF, 16)
        return
    best_order, best_cost = 0, None
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        cost = int(np.abs(_fixed_residual(x, order)).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    w.write(0b001000 | order, 6)  # FIXED, order
    w.write(0, 1)  # no wasted bits
    for s in x[:order]:  # warmup samples, raw bps bits
        w.write(int(s) & 0xFFFF, 16)
    res = _fixed_residual(x, order)
    w.write(0b00, 2)  # residual coding method 0: 4-bit Rice params
    w.write(0, 4)  # partition order 0: one partition
    k = _rice_param(res)
    w.write(k, 4)
    for e in res:
        z = int(e) * 2 if e >= 0 else -2 * int(e) - 1  # zigzag
        w.write_unary(z >> k)
        if k:
            w.write(z & ((1 << k) - 1), k)


def encode_flac(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a FLAC stream (fixed 4096 block)."""
    x = np.asarray(samples, dtype=np.int64)
    if len(x) and (x.max() > 32767 or x.min() < -32768):
        raise ValueError("samples must fit int16")
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    n = len(x)
    # STREAMINFO: min/max block, min/max frame (0=unknown), rate(20),
    # chan-1(3), bps-1(5), total(36), md5(128)
    bw = _BitWriter()
    last_block = min(_BLOCK, n) if n else _BLOCK
    bw.write(last_block if n <= _BLOCK else _BLOCK, 16)  # min blocksize
    bw.write(_BLOCK if n > _BLOCK else last_block, 16)  # max blocksize
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(0, 3)  # mono
    bw.write(15, 5)  # 16 bps
    bw.write(n, 36)
    info = bw.bytes() + md5
    header = b"fLaC" + bytes([0x80, 0, 0, len(info)]) + info  # last-block flag

    frames = bytearray()
    # a FLAC frame must carry >= 1 sample; an empty stream is header-only
    for fi, start in enumerate(range(0, n, _BLOCK)):
        blk = x[start : start + _BLOCK]
        bs = len(blk)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize stream
        hdr.write(0b0111, 4)  # blocksize: 16-bit field follows (bs-1)
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # channel assignment: mono
        hdr.write(0b100, 3)  # sample size: 16 bps
        hdr.write(0, 1)  # reserved
        head = hdr.bytes() + _utf8_coded_number(fi) + struct.pack(">H", bs - 1)
        head += bytes([_crc8(head)])
        body = _BitWriter()
        _write_subframe(body, blk)
        body.align()
        frame = head + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
    return header + bytes(frames)


# -- decoder ------------------------------------------------------------------


def _read_coded_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x40
    while first & mask:
        nbytes += 1
        mask >>= 1
    val = first & (mask - 1)
    for _ in range(nbytes):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation byte")
        val = (val << 6) | (cont & 0x3F)
    return val


def _read_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("subframe pad bit set")
    stype = r.read(6)
    if r.read(1) != 0:
        raise ValueError("wasted bits not supported")

    def signed(v: int, bits: int) -> int:
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    if stype == 0b000000:  # CONSTANT
        v = signed(r.read(bps), bps)
        return np.full(bs, v, dtype=np.int64)
    if stype == 0b000001:  # VERBATIM
        return np.array([signed(r.read(bps), bps) for _ in range(bs)], dtype=np.int64)
    if 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype & 0x07
        warm = np.array(
            [signed(r.read(bps), bps) for _ in range(order)], dtype=np.int64
        )
        method = r.read(2)
        if method not in (0, 1):
            raise ValueError("reserved residual coding method")
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        porder = r.read(4)
        nparts = 1 << porder
        if bs % nparts:
            raise ValueError("block size not divisible by partition count")
        res: list[int] = []
        for p in range(nparts):
            count = (bs >> porder) - (order if p == 0 else 0)
            k = r.read(pbits)
            if k == escape:  # escape: raw nbits residuals
                nbits = r.read(5)
                for _ in range(count):
                    res.append(signed(r.read(nbits), nbits) if nbits else 0)
            else:
                for _ in range(count):
                    q = r.read_unary()
                    z = (q << k) | (r.read(k) if k else 0)
                    res.append((z >> 1) ^ -(z & 1))  # un-zigzag
        return _fixed_restore(np.array(res, dtype=np.int64), warm, order)
    if stype & 0b100000:
        raise ValueError("LPC subframes not supported (fixed-predictor subset)")
    raise ValueError(f"reserved subframe type {stype:#08b}")


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit FLAC stream -> (sample_rate, int16 samples).
    Verifies the marker, STREAMINFO MD5, every frame's CRC-8 and CRC-16."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos, rate, total, seen_info = 4, None, None, False
    while pos < len(payload):
        hdr = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        btype = hdr & 0x7F
        if btype == 0:  # STREAMINFO
            r = _BitReader(body)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            if r.read(3) != 0:
                raise ValueError("mono only")
            if r.read(5) != 15:
                raise ValueError("16 bps only")
            total = r.read(36)
            md5_expect = body[18:34]
            seen_info = True
        pos += 4 + length
        if hdr & 0x80:  # last metadata block
            break
    if not seen_info or rate is None:
        raise ValueError("missing STREAMINFO")

    out: list[np.ndarray] = []
    got = 0
    while got < (total or 0) and pos < len(payload):
        frame_start = pos
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        r.read(1)
        r.read(1)
        bs_bits = r.read(4)
        sr_bits = r.read(4)
        chan = r.read(4)
        if chan != 0:
            raise ValueError("mono only")
        ss = r.read(3)
        if ss != 0b100:
            raise ValueError("16 bps only")
        r.read(1)
        _fnum = _read_coded_number(r)
        if bs_bits == 0b0110:
            bs = r.read(8) + 1
        elif bs_bits == 0b0111:
            bs = r.read(16) + 1
        elif bs_bits == 0b0001:
            bs = 192
        elif 0b0010 <= bs_bits <= 0b0101:
            bs = 576 << (bs_bits - 2)
        elif 0b1000 <= bs_bits <= 0b1111:
            bs = 256 << (bs_bits - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_bits not in (0b0000,):
            raise ValueError("sample rate must come from STREAMINFO here")
        r.align()
        head = payload[frame_start : r.pos]
        if payload[r.pos] != _crc8(head):
            raise ValueError("frame header CRC-8 mismatch")
        r.pos += 1  # consume the CRC-8 byte
        samples = _read_subframe(r, bs, 16)
        r.align()
        (crc_expect,) = struct.unpack_from(">H", payload, r.pos)
        if _crc16(payload[frame_start : r.pos]) != crc_expect:
            raise ValueError("frame CRC-16 mismatch")
        pos = r.pos + 2
        out.append(samples)
        got += bs
    x = np.concatenate(out).astype(np.int64) if out else np.zeros(0, dtype=np.int64)
    if total is not None and len(x) != total:
        raise ValueError("decoded sample count != STREAMINFO total")
    if (len(x) and (x.max() > 32767 or x.min() < -32768)):
        raise ValueError("decoded samples out of int16 range")
    x16 = x.astype(np.int16)
    if seen_info and hashlib.md5(x16.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("STREAMINFO MD5 mismatch (lossless contract broken)")
    return rate, x16
