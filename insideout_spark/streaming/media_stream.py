"""Streaming media decode: the real byte-level decoders
(plans/multimodal.jpeg_features / png_features / image_features /
audio_features) are stateless Arrow-batched mapInPandas stages, so
they drop straight into Structured Streaming — new payload files land,
each micro-batch decodes incrementally, append sink, checkpointed
resume. This is the production shape for multimodal ingest at corpus
scale: decode work is embarrassingly parallel per file drop and needs
no state store at all (contrast the stateful dedup/session streams).

Reference analog: the reference's batch index server has no streaming
ingest; this extends SURVEY.md §2.9's streaming family to the
multimodal columns the same way stream_pip extends the stab join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = "doc_id long, media_type string, payload binary"


def stream_media(
    spark: SparkSession, path_glob: str, max_files: int = 1
) -> DataFrame:
    """File-source stream of opaque media payloads."""
    return (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path_glob)
    )


def run_decode_stream(
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    features_fn,
):
    """Run one flush of `features_fn` (any stateless decode stage from
    plans/multimodal — jpeg_features, png_features, image_features,
    audio_features) over the stream with availableNow semantics:
    process everything currently in the source, then stop. Re-running
    with the same checkpoint resumes where the last flush ended (new
    files only) — the batch-checkpoint contract, streaming-side."""
    q = (
        features_fn(media)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q


def write_media_drop(df: DataFrame, in_dir: str, name: str) -> None:
    """Helper: land one batch of media rows as a new source file."""
    df.coalesce(1).write.parquet(os.path.join(in_dir, name))
