"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas stages.

The container has no image/audio codecs, so the actual decode is STUBBED
(per the build contract): `_decode_image_real` raises NotImplementedError
unless PIL is importable; the default path uses a deterministic fake
decoder (splitmix64 of the payload bytes -> synthetic stats) so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested end-to-end.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

IMAGE_META_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_frames int, payload binary"
)


def synth_media(docs: DataFrame, payload_bytes: int = 64) -> DataFrame:
    """Attach a deterministic opaque binary payload + typed metadata to
    each document — the multimodal table shape (binary column + metadata
    struct) without external data."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 24).cast("int").alias("height"),
        (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
        F.sha2(F.col("doc_id").cast("string"), 256).cast("binary").alias("payload"),
    )


def _decode_image_real(payload: bytes):  # pragma: no cover
    if not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL, which is not available in this "
            "container; the deterministic fake decoder is used instead"
        )
    raise NotImplementedError("PIL decode path not wired in this environment")


def _fake_decode_stats(payloads) -> np.ndarray:
    """Deterministic 'pixel stats' from payload bytes — stands in for the
    decoded-image mean/std until a codec is available. No rounding
    needed for cross-engine parity: with 64 byte values every
    intermediate (integer sums, /64 dyadic mean, deviations with
    denominator 64, squares with denominator 4096, their sum) is
    exactly representable in float64 regardless of summation order, so
    the std is bit-identical in numpy and the DuckDB oracle."""
    out = np.empty((len(payloads), 2), dtype=np.float64)
    for i, p in enumerate(payloads):
        arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
        out[i, 0] = arr.mean() if len(arr) else 0.0
        out[i, 1] = float(arr.std()) if len(arr) else 0.0
    return out


def extract_media_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """decode -> feature-extract stage. Output: per-item feature vector
    (mean/std stats + normalized dims). Arrow-batched; one python call
    per batch, numpy inside."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if use_real_codec:
                _decode_image_real(b"")  # raises NotImplementedError without PIL
            stats = _fake_decode_stats(pdf["payload"].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feat_mean": stats[:, 0],
                    "feat_std": stats[:, 1],
                    "aspect": pdf["width"].astype("float64") / pdf["height"].astype("float64"),
                }
            )

    return media.mapInPandas(
        run,
        schema="doc_id long, media_type string, feat_mean double, feat_std double, aspect double",
    )


def sample_frames(media: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    frame index (pure Catalyst sequence/explode — the decode of each
    frame would slot into a downstream mapInPandas)."""
    vids = media.filter(F.col("media_type") == "video/mp4")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
        "payload",
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize bookkeeping (target dims preserving aspect) — Catalyst
    arithmetic; the pixel work is the stubbed decode stage."""
    scale = F.least(
        F.lit(float(max_side)) / F.col("width"), F.lit(float(max_side)) / F.col("height"), F.lit(1.0)
    )
    return media.select(
        "doc_id",
        "media_type",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )
