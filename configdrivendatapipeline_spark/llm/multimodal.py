"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
mapInPandas.

The decode kernels themselves are STUBBED (no image/audio libraries
in this container — see ``DecodeUnavailable``): what is real, tested,
and scale-designed here is everything Spark-side — the schema
contract, the binary column handling, the Arrow batch shapes, the
partitioning, and the frame-sampling plan. Swapping the stub body
for PIL/torchaudio is a one-function change that touches no plan.

Scale notes: binary payloads ride the normal columnar path (parquet
BYTE_ARRAY); mapInPandas streams Arrow batches so a 100 MB image
never materializes per-row Python objects; metadata predicates
(width/duration filters) push down BEFORE decode so the expensive
kernel only sees surviving rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths: the media libraries are not
    installed in this environment. The deterministic fake path keeps
    the Spark plumbing testable end-to-end."""


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture an opaque binary 'media' column + typed metadata
    from the documents fixture (the harness has no real media files).
    Layout mirrors a real ingest: (payload binary, media_type string,
    width int, height int, n_frames int)."""
    return (
        df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))
        .withColumn(
            "media_type",
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
            ),
        )
        .withColumn("width", (F.pmod(F.col("doc_id") * 37, F.lit(1280)) + 16).cast("int"))
        .withColumn("height", (F.pmod(F.col("doc_id") * 53, F.lit(720)) + 16).cast("int"))
        .withColumn("n_frames", (F.pmod(F.col("doc_id") * 7, F.lit(240)) + 1).cast("int"))
    )


_DECODE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload_bytes BIGINT, "
    "first_byte INT, feat_mean DOUBLE"
)


def decode_features(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched 'decode + featurize' over the binary column.

    ``use_real_decoder=True`` raises :class:`DecodeUnavailable` (no
    PIL/ffmpeg here); the default deterministic fake derives features
    from the raw bytes so the whole pipeline — batching, schema,
    postprocessing — runs and verifies.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                raise DecodeUnavailable(
                    "real image/audio decode requires PIL/torchaudio; "
                    "install and implement here — plan/schema unchanged"
                )
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": payload.map(len).astype("int64"),
                    "first_byte": payload.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    # deterministic fake feature: mean byte value in
                    # half-up micro-units via exact integer arithmetic —
                    # python round() is half-EVEN and loses ties against
                    # the oracle's half-up (observed at sf0.1: mean
                    # exactly x.xxx5625).
                    "feat_mean": payload.map(
                        lambda b: (
                            ((sum(b) * 2_000_000 + len(b)) // (2 * len(b)))
                            / 1_000_000
                            if len(b)
                            else 0.0
                        )
                    ).astype("float64"),
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        kernel, schema=_DECODE_SCHEMA
    )


def sample_frames(df: DataFrame, every_k: int = 24) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index.

    Pure plan-side explode of a sequence — the actual frame extraction
    would happen in a downstream decode kernel; sampling BEFORE decode
    is the 100 TB move (decode k× less data).
    """
    return df.filter(F.col("media_type") == "video").select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata computation (aspect-preserving fit): the pure-
    SQL half of a resize kernel — target dims computed in-plan, the
    pixel work stays in the (stubbed) decode kernel."""
    scale_num = F.lit(max_side)
    long_side = F.greatest("width", "height")
    new_w = F.floor(F.col("width") * scale_num / long_side).cast("int")
    new_h = F.floor(F.col("height") * scale_num / long_side).cast("int")
    return df.select(
        "doc_id",
        "width",
        "height",
        F.when(long_side <= max_side, F.col("width")).otherwise(new_w).alias("target_w"),
        F.when(long_side <= max_side, F.col("height")).otherwise(new_h).alias("target_h"),
    )
