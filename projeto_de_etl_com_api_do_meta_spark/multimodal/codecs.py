"""Real multimodal codecs, stdlib+numpy only — no pillow/ffmpeg required.

Three genuine, widely-supported container formats that are simple enough to
encode AND decode bit-exactly with the standard library:

* **PPM** (netpbm ``P6``): the canonical uncompressed RGB image format;
  readable by pillow/ImageMagick/GIMP.  Header: ``P6\\n<w> <h>\\n255\\n``
  then ``w*h*3`` raw bytes.
* **WAV** (RIFF PCM): canonical uncompressed audio; 44-byte RIFF header +
  little-endian PCM samples.  We write/read 16-bit mono.
* **Y4M** (YUV4MPEG2): the canonical raw-video interchange format (mplayer/
  ffmpeg native).  Plain-text stream header, then ``FRAME\\n`` + raw planes
  per frame.  We use the ``C444`` colorspace (3 full planes per frame).

These replace the round-1 fake decode kernels with real parsers: the bytes
in the binary column are real files (you can write one to disk and open it
in any media tool), and the feature extractors actually parse headers and
sample data.  The fake kernels remain for the legacy ``*/fake`` content
types.  Reference analog: the reference has no multimodal surface at all
(its payloads are JSON rows, ``src/extract.py``); this extends the engine
per the driver's north-star mandate.
"""

from __future__ import annotations

import struct

import numpy as np

# -- PPM (P6) -----------------------------------------------------------------

PPM_CONTENT_TYPE = "image/x-portable-pixmap"


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes (len == width*height*3) as a binary PPM file."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM: returns (width, height, pixels[h, w, 3] uint8).

    Real parser: validates magic, skips comment lines, reads the maxval
    field, and slices exactly w*h*3 sample bytes.
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval tokens; '#' starts a comment line
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    n = width * height * 3
    data = payload[pos : pos + n]
    if len(data) != n:
        raise ValueError(f"truncated PPM: want {n} sample bytes, got {len(data)}")
    return width, height, np.frombuffer(data, dtype=np.uint8).reshape(
        height, width, 3
    )


def resize_ppm_nearest(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize: decode, index-map, re-encode."""
    w0, h0, px = decode_ppm(payload)
    ys = (np.arange(height) * h0) // height
    xs = (np.arange(width) * w0) // width
    out = px[ys][:, xs]
    return encode_ppm(width, height, out.tobytes())


# -- WAV (RIFF PCM16 mono) ----------------------------------------------------

WAV_CONTENT_TYPE = "audio/x-wav"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a RIFF/WAVE PCM file."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE file: returns (sample_rate, int16 mono samples).

    Real parser: walks RIFF chunks (so extra chunks like LIST are skipped),
    validates PCM format code, and reads the fmt/data chunks.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1:
                raise ValueError(f"only PCM supported, got format {fmt_code}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt / data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"only 16-bit mono supported, got {bits}-bit x{channels}")
    return rate, np.frombuffer(data, dtype="<i2")


# -- Y4M (YUV4MPEG2, C444) ----------------------------------------------------

Y4M_CONTENT_TYPE = "video/x-yuv4mpeg"


def encode_y4m(
    frames: list[bytes], width: int, height: int, fps: int
) -> bytes:
    """Encode raw C444 frames (each len == 3*width*height: Y,U,V planes)
    as a YUV4MPEG2 stream."""
    plane = width * height
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (width, height, fps)]
    for f in frames:
        if len(f) != 3 * plane:
            raise ValueError(f"frame must be {3 * plane} bytes, got {len(f)}")
        out.append(b"FRAME\n")
        out.append(f)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse a YUV4MPEG2 stream: returns (width, height, fps, frames).

    Real parser: reads the parameter header (W/H/F/C tags), then walks
    FRAME markers slicing fixed-size C444 planes.
    """
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = fps = None
    colorspace = b"C420"  # y4m default when no C tag
    for tag in header[1:]:
        if tag[:1] == b"W":
            width = int(tag[1:])
        elif tag[:1] == b"H":
            height = int(tag[1:])
        elif tag[:1] == b"F":
            fps = int(tag[1:].split(b":")[0])
        elif tag[:1] == b"C":
            colorspace = tag
    if colorspace != b"C444":
        raise ValueError(f"only C444 supported, got {colorspace.decode()}")
    if width is None or height is None or fps is None:
        raise ValueError("missing W/H/F header tag")
    frame_size = 3 * width * height
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        frames.append(payload[fnl + 1 : fnl + 1 + frame_size])
        pos = fnl + 1 + frame_size
    return width, height, fps, frames
