"""The multimodal signatures' CLAIMS, tested directly: the image
average-hash must survive a resize (that is what makes it perceptual)
and the audio fingerprint must survive uniform gain (that is why it
keys on energy deltas, not levels)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from configdrivendatapipeline_spark.llm import multimodal


def _ppm_from_array(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _wav_from_pcm(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _hash_payloads(spark, payloads: list[tuple[int, bytes]], fn):
    df = spark.createDataFrame(
        pd.DataFrame(payloads, columns=["doc_id", "payload"]),
        "doc_id BIGINT, payload BINARY",
    )
    return {r["doc_id"]: r for r in fn(df).collect()}


def test_phash_survives_nearest_upscale(spark):
    """Upscaling an image 2x (nearest-neighbor) must not change its
    average-hash — the resize robustness the signature exists for."""
    base = multimodal.decode_ppm(multimodal.ppm_bytes(7, 12, 10))
    up = base.repeat(2, axis=0).repeat(2, axis=1)
    got = _hash_payloads(
        spark,
        [(1, _ppm_from_array(base)), (2, _ppm_from_array(up))],
        multimodal.ppm_ahash,
    )
    assert got[1]["phash_hi"] == got[2]["phash_hi"]
    assert got[1]["phash_lo"] == got[2]["phash_lo"]


def test_audio_fingerprint_survives_gain(spark):
    """Doubling every sample (uniform gain) preserves every
    energy-delta comparison, so the fingerprint must be identical."""
    i = np.arange(800, dtype=np.int64)
    pcm = ((i * 13 + 7) % 4096) - 2048
    got = _hash_payloads(
        spark,
        [(1, _wav_from_pcm(pcm)), (2, _wav_from_pcm(pcm * 2))],
        multimodal.wav_fingerprint,
    )
    assert got[1]["afp"] == got[2]["afp"]
    assert got[1]["n_frames"] == got[2]["n_frames"] == 5


def test_modality_router_classifies_and_survives_junk(spark):
    from pyspark.sql import functions as F

    from configdrivendatapipeline_spark.llm import multimodal as mm

    ids = spark.createDataFrame([(i,) for i in range(60)], ["doc_id"])
    routed = mm.route_modality(mm.attach_mixed_payload(ids)).collect()
    got = {r["doc_id"]: (r["modality"], r["n_bytes"]) for r in routed}
    for i in range(60):
        if i % 29 == 0:
            want = "unknown"
        else:
            want = {0: "image", 1: "audio", 2: "video"}[i % 3]
        assert got[i][0] == want, i
        # router's byte count equals the actual generated payload size
        if want == "image":
            buf = mm.ppm_bytes(i, 8 + i % 9, 8 + i % 7)
        elif want == "audio":
            buf = mm.wav_bytes(i, 800 + (i % 5) * 160)
        elif want == "video":
            buf = mm.y4m_bytes(i, 4 + i % 3, 4 + i % 2, 3 + i % 4)
        else:
            buf = b"JUNK" + bytes((i * 17 + k) % 256 for k in range(16))
        assert got[i][1] == len(buf), i
    # routed image payloads genuinely decode
    img = mm.decode_ppm(mm.ppm_bytes(3, 8 + 3 % 9, 8 + 3 % 7))
    assert img.shape == (8 + 3 % 7, 8 + 3 % 9, 3)


def test_degenerate_payloads_fail_loud_not_zerodiv(spark):
    """Structurally valid but empty media payloads (zero samples /
    zero pixel area) raise the module's established ValueError, not a
    ZeroDivisionError three lines into the feature math."""
    import pytest

    from configdrivendatapipeline_spark.llm import multimodal as mm

    empty_wav = mm.wav_bytes(0, 0)
    wav_df = spark.createDataFrame([(0, bytearray(empty_wav))], ["doc_id", "payload"])
    with pytest.raises(Exception, match="zero samples"):
        mm.decode_wav_features(wav_df).collect()

    zero_ppm = b"P6\n0 5\n255\n"
    ppm_df = spark.createDataFrame([(0, bytearray(zero_ppm))], ["doc_id", "payload"])
    with pytest.raises(Exception, match="zero pixel area"):
        mm.decode_ppm_features(ppm_df).collect()
    with pytest.raises(Exception, match="zero pixel area"):
        mm.ppm_ahash(ppm_df).collect()


def test_resize_clamps_to_one_pixel(spark):
    """Extreme aspect ratios clamp the short target dimension to 1 on
    BOTH the plan side and the pixel kernel (w=4, h=32 at max_side 6
    used to compute tw=0 and divide by zero)."""
    from configdrivendatapipeline_spark.llm import multimodal as mm
    from pyspark.sql import functions as F

    meta = spark.createDataFrame(
        [(0, 1, 600), (1, 600, 1)], ["doc_id", "width", "height"]
    )
    plan = {r["doc_id"]: (r["target_w"], r["target_h"]) for r in mm.resize_plan(meta, max_side=256).collect()}
    assert plan[0] == (1, 256) and plan[1] == (256, 1)

    skinny = mm.ppm_bytes(0, 4, 32)
    df = spark.createDataFrame([(0, bytearray(skinny))], ["doc_id", "payload"])
    row = mm.resize_ppm_features(df, max_side=6).collect()[0]
    assert (row["target_w"], row["target_h"]) == (1, 6)
    assert row["r_mean_micro"] >= 0


def test_wav_fingerprint_truncates_at_63_delta_bits(spark):
    """Audio longer than 64 frames fingerprints the FIRST 63 deltas
    (a signed BIGINT's non-negative capacity) instead of shifting
    int64 past bit 62 — shifts past 63 are C-undefined and alias late
    frames onto early bits, and bit 63 flips the sign. n_frames still
    reports the true count."""
    from configdrivendatapipeline_spark.llm import multimodal as mm

    long_wav = mm.wav_bytes(3, 160 * 70)  # 70 frames
    df = spark.createDataFrame([(3, bytearray(long_wav))], ["doc_id", "payload"])
    row = mm.wav_fingerprint(df, frame_len=160).collect()[0]
    assert row["n_frames"] == 70
    assert 0 <= row["afp"] < 2**63  # packed from 63 bits, sign intact


def test_route_modality_requires_wave_form_tag(spark):
    """RIFF is a container family: a WebP payload ('RIFF'+size+'WEBP')
    must route to 'unknown', not crash the audio decode branch."""
    from configdrivendatapipeline_spark.llm import multimodal as mm

    webp = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 junkjunk"
    wav = mm.wav_bytes(1, 160)
    df = spark.createDataFrame(
        [(0, bytearray(webp)), (1, bytearray(wav))], ["doc_id", "payload"]
    )
    got = {r["doc_id"]: r["modality"] for r in mm.route_modality(df).collect()}
    assert got == {0: "unknown", 1: "audio"}
