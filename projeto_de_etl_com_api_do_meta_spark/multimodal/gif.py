"""GIF87a codec — pure-stdlib, real LZW.

GIF (CompuServe GIF87a, the format every browser still decodes) is the
repo's dictionary-coding quadrant: PNG covers LZ77+Huffman (via zlib),
QOI covers index/delta/RLE, JPEG covers transform coding, FLAC covers
prediction+Rice — GIF adds genuine LZW with variable-width codes, the
clear/EOI control codes, and the 4096-entry dictionary reset protocol.

Implemented surface (both directions):

* header ``GIF87a``, logical screen descriptor, 256-entry global color
  table (grayscale palette: index i -> (i, i, i)),
* image descriptor (0x2C) at origin, no interlace, no local table,
* LZW image data: min-code-size byte + 255-byte sub-blocks; encoder
  emits CLEAR when the dictionary fills (spec-standard reset), decoder
  handles the KwKwK case and code-width growth at 2^n boundaries,
* trailer 0x3B.

8-bit grayscale pixels round-trip losslessly (index == gray value), so a
DuckDB oracle can recompute decoded pixel sums exactly from the
generation rule, just like the PNG/QOI contracts.
"""

from __future__ import annotations

import struct

GIF_CONTENT_TYPE = "image/gif"

_MAGIC = b"GIF87a"


class _BitWriter:
    """LSB-first bit packer (GIF packs LZW codes little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    if not indices:
        bw.write(eoi, width)
        return bw.flush()
    prefix = bytes([indices[0]])
    for b in indices[1:]:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        bw.write(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            # dictionary full: spec-standard CLEAR + reset
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    bw.write(table[prefix], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
            if len(table) == (1 << width) and width < 12:
                width += 1
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if len(out) > n_expected:
            raise ValueError("LZW output overflows pixel count")
        prev = entry
    if len(out) != n_expected:
        raise ValueError(f"decoded {len(out)} pixels, expected {n_expected}")
    return bytes(out)


def encode_gif(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, one byte each) as a real
    GIF87a file with a 256-gray global palette and LZW image data."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height}"
        )
    out = bytearray()
    out += _MAGIC
    # logical screen descriptor: global table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):  # grayscale global color table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(pixels, 8)
    for off in range(0, len(lzw), 255):  # 255-byte sub-blocks
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode a GIF87a/89a grayscale-paletted file produced by encode_gif
    (single image, global table); returns (width, height, pixels) where
    each pixel is the palette's red channel (== gray value)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file (bad magic)")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        palette = data[pos : pos + 3 * n_colors]
        pos += 3 * n_colors
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-blocks (skip)
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                raise ValueError("GIF truncated inside an extension block")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _x, _y, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if ipacked & 0x80:  # local color table
            n_local = 2 << (ipacked & 0x07)
            palette = data[pos : pos + 3 * n_local]
            pos += 3 * n_local
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("GIF truncated inside image data")
            ln = data[pos]
            if ln == 0:
                pos += 1
                break
            if pos + 1 + ln > len(data):
                raise ValueError("GIF truncated inside a sub-block")
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if palette is None:
            raise ValueError("GIF image has no color table")
        indices = _lzw_decode(bytes(lzw), min_code_size, w * h)
        # map through the palette's red channel (grayscale contract)
        return w, h, bytes(palette[3 * i] for i in indices)
    raise ValueError("GIF ended without image data")
