"""Real-codec roundtrips (PPM / WAV / Y4M, stdlib+numpy) and the Spark
pipelines that encode real files into binary columns and parse them back."""

from __future__ import annotations

import numpy as np
import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.binary_ops import (
    attach_ppm_image,
    attach_wav_audio,
    attach_y4m_video,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_video_frames,
)
from projeto_de_etl_com_api_do_meta_spark.multimodal.codecs import (
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_ppm,
    encode_wav,
    encode_y4m,
    resize_ppm_nearest,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello multimodal world"), (2, "spark native analytics engine")],
        "doc_id long, text string",
    )


# -- pure codec roundtrips ----------------------------------------------------


def test_ppm_roundtrip_and_comment_handling():
    rgb = bytes(range(256)) * 3  # 16x16x3
    blob = encode_ppm(16, 16, rgb)
    w, h, px = decode_ppm(blob)
    assert (w, h, px.shape) == (16, 16, (16, 16, 3))
    assert px.tobytes() == rgb
    # parser must skip comment lines like any netpbm reader
    commented = b"P6\n# a comment\n16 16\n255\n" + rgb
    assert decode_ppm(commented)[2].tobytes() == rgb
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def test_ppm_resize_nearest_identity_and_downscale():
    rgb = bytes(range(192))  # 8x8x3
    blob = encode_ppm(8, 8, rgb)
    same = resize_ppm_nearest(blob, 8, 8)
    assert decode_ppm(same)[2].tobytes() == rgb
    w, h, px = decode_ppm(resize_ppm_nearest(blob, 4, 2))
    assert (w, h) == (4, 2)
    # nearest-neighbor: every output pixel exists in the source
    src = decode_ppm(blob)[2].reshape(-1, 3)
    for p in px.reshape(-1, 3):
        assert any((p == s).all() for s in src)


def test_wav_roundtrip_and_chunk_walking():
    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    blob = encode_wav(samples, 8000)
    rate, back = decode_wav(blob)
    assert rate == 8000
    assert (back == samples).all()
    # insert an extra LIST chunk between fmt and data: parser must skip it
    extra = blob[:36] + b"LIST\x04\x00\x00\x00INFO" + blob[36:]
    rate2, back2 = decode_wav(extra)
    assert rate2 == 8000 and (back2 == samples).all()
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + bytes(40))


def test_y4m_roundtrip():
    frames = [bytes([i]) * 48 for i in range(5)]  # 4x4 C444
    blob = encode_y4m(frames, 4, 4, 25)
    w, h, fps, back = decode_y4m(blob)
    assert (w, h, fps) == (4, 4, 25)
    assert back == frames
    assert blob.startswith(b"YUV4MPEG2 W4 H4 F25:1")
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF....")


# -- Spark pipelines over real files ------------------------------------------


def test_ppm_pipeline_features_match_payload(spark):
    attached = attach_ppm_image(_docs(spark))
    rows = {r.doc_id: r for r in attached.collect()}
    # the binary column holds genuine PPM files
    w, h, px = decode_ppm(bytes(rows[1].image_bytes))
    feats = {r.doc_id: r for r in extract_image_features(attached).collect()}
    assert (feats[1].width, feats[1].height) == (w, h)
    assert feats[1].channels == 3
    assert feats[1].mean_intensity == pytest.approx(float(px.mean()))


def test_ppm_pipeline_resize(spark):
    out = resize_images(attach_ppm_image(_docs(spark)), width=4, height=4)
    for r in out.collect():
        w, h, px = decode_ppm(bytes(r.image_bytes))
        assert (w, h) == (4, 4) and px.shape == (4, 4, 3)


def test_wav_pipeline_features(spark):
    feats = {
        r.doc_id: r
        for r in extract_audio_features(attach_wav_audio(_docs(spark))).collect()
    }
    n = len("hello multimodal world")
    assert feats[1].n_bytes == n  # sample count
    assert feats[1].sample_rate == 16000
    assert feats[1].duration_ms == n * 1000 // 16000
    assert feats[1].rms > 0


def test_y4m_pipeline_frame_sampling(spark):
    out = sample_video_frames(attach_y4m_video(_docs(spark)), every_nth=2)
    rows = [r for r in out.collect() if r.doc_id == 1]
    # doc 1 -> 3 + 1 % 6 = 4 frames -> sampled idx 0, 2
    assert [r.frame_idx for r in rows] == [0, 2]
    assert all(r.ts_ms == r.frame_idx * 100 for r in rows)  # fps 10
    assert all(len(bytes(r.frame_bytes)) == 3 * 16 * 16 for r in rows)


# -- G.711 mu-law (r8): the real compressed-audio codec -------------------------


def test_g711_spec_vectors_and_properties():
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.multimodal.g711 import (
        mulaw_decode,
        mulaw_encode,
    )

    # silence encodes to 0xFF (all-ones complement), the spec's anchor
    assert mulaw_encode(np.array([0]))[0] == 0xFF
    # encode(decode(c)) == c for ALL 256 codes except the -0 collapse
    # 0x7F -> 0xFF — the encoder and decoder are one consistent 16-bit
    # scale, so every segment-7 code (loud samples up to +-32124) is
    # reachable and survives decode -> re-encode bit-exactly
    all_codes = np.arange(256, dtype=np.uint8)
    redec = mulaw_encode(mulaw_decode(all_codes).astype(np.int64))
    assert (
        (redec == all_codes) | ((all_codes == 0x7F) & (redec == 0xFF))
    ).all()
    # extremes at the 16-bit scale: code 0 is the loudest negative
    assert mulaw_decode(np.array([0], dtype=np.uint8))[0] == -32124
    assert mulaw_encode(np.array([-32124]))[0] == 0
    assert mulaw_encode(np.array([32767]))[0] == 0x80  # clips at 32635
    x = np.arange(-32768, 32768, dtype=np.int64)
    c = mulaw_encode(x)
    d = mulaw_decode(c)
    c2 = mulaw_encode(d.astype(np.int64))
    # idempotence up to the signed-zero duality (0x7F and 0xFF both
    # decode to 0 — canonical mu-law)
    assert ((c2 == c) | ((c == 0x7F) & (c2 == 0xFF))).all()
    # quantization error bounded by the largest segment step (2^12 at
    # segment 7, 16-bit scale), plus the clip region above 32635
    in_range = np.abs(x) <= 32635
    assert np.abs(x[in_range] - d[in_range]).max() <= 4096
    # decode is monotone over positive-code magnitudes
    pos = mulaw_decode(np.array([(~i) & 0xFF for i in range(128)], dtype="uint8"))
    assert (np.diff(pos) >= 0).all()
    # sign symmetry: decode(negative code) == -decode(positive code)
    neg = mulaw_decode(
        np.array([(~(0x80 | i)) & 0xFF for i in range(128)], dtype="uint8")
    )
    assert (neg == -pos).all()


def test_g711_matches_audioop_bit_for_bit():
    """Cross-implementation anchor: the pair is bit-identical to CPython's
    audioop (lin2ulaw over the full 16-bit domain, ulaw2lin over all 256
    codes).  Gated: audioop was removed in Python 3.13."""
    import numpy as np
    import pytest

    audioop = pytest.importorskip("audioop")
    from projeto_de_etl_com_api_do_meta_spark.multimodal.g711 import (
        mulaw_decode,
        mulaw_encode,
    )

    x = np.arange(-32768, 32768, dtype=np.int64)
    ref = np.frombuffer(
        audioop.lin2ulaw(x.astype("<i2").tobytes(), 2), dtype=np.uint8
    )
    assert (mulaw_encode(x) == ref).all()
    codes = np.arange(256, dtype=np.uint8)
    refd = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2")
    assert (mulaw_decode(codes) == refd).all()


def test_g711_wav_container_roundtrip():
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.multimodal.g711 import (
        decode_wav_mulaw,
        encode_wav_mulaw,
        mulaw_decode,
        mulaw_encode,
    )

    x = (np.arange(300) * 37 % 8000 - 4000).astype(np.int16)
    payload = encode_wav_mulaw(x, 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    # fmt chunk declares format code 7 (mu-law)
    import struct

    fmt_at = payload.index(b"fmt ")
    (fmt_code,) = struct.unpack_from("<H", payload, fmt_at + 8)
    assert fmt_code == 7
    rate, back = decode_wav_mulaw(payload)
    assert rate == 8000
    assert (back == mulaw_decode(mulaw_encode(x.astype(np.int64)))).all()


def test_g711_rejects_pcm_wav():
    import numpy as np
    import pytest

    from projeto_de_etl_com_api_do_meta_spark.multimodal.codecs import encode_wav
    from projeto_de_etl_com_api_do_meta_spark.multimodal.g711 import (
        decode_wav_mulaw,
    )

    pcm = encode_wav(np.zeros(16, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="mu-law"):
        decode_wav_mulaw(pcm)
