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
