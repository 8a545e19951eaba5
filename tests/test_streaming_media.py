"""Streaming media decode: the REAL JPEG/PNG decoders run as stateless
streaming stages — two file drops, checkpointed resume between them,
and the appended output matches the batch decode row-for-row."""

import os

from pyspark.sql import functions as F

from insideout_spark.plans import multimodal as mm
from insideout_spark.streaming.media_stream import (
    run_decode_stream,
    stream_media,
    write_media_drop,
)


def _rows(spark, feats_df):
    return {tuple(r) for r in feats_df.collect()}


def test_streaming_jpeg_decode_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    docs1 = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    docs2 = spark.createDataFrame([(i,) for i in range(40, 70)], "doc_id long")
    write_media_drop(mm.synth_jpeg_media(docs1), in_dir, "d1")

    q = run_decode_stream(
        stream_media(spark, in_dir + "/*"), out_dir, ck_dir, mm.jpeg_features
    )
    q.awaitTermination(180)
    got1 = _rows(spark, spark.read.parquet(out_dir))
    want1 = _rows(spark, mm.jpeg_features(mm.synth_jpeg_media(docs1)))
    assert got1 == want1 and len(got1) == 40

    # second drop: resume from checkpoint decodes ONLY the new file
    write_media_drop(mm.synth_jpeg_media(docs2), in_dir, "d2")
    q = run_decode_stream(
        stream_media(spark, in_dir + "/*"), out_dir, ck_dir, mm.jpeg_features
    )
    q.awaitTermination(180)
    got2 = _rows(spark, spark.read.parquet(out_dir))
    want_all = want1 | _rows(spark, mm.jpeg_features(mm.synth_jpeg_media(docs2)))
    assert got2 == want_all and len(got2) == 70  # no re-emits, no gaps


def test_streaming_mp4_demux_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    write_media_drop(mm.synth_mp4_media(docs), in_dir, "d1")
    q = run_decode_stream(
        stream_media(spark, in_dir + "/*"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        mm.video_demux_features,
    )
    q.awaitTermination(180)
    got = _rows(spark, spark.read.parquet(str(tmp_path / "out")))
    want = _rows(spark, mm.video_demux_features(mm.synth_mp4_media(docs)))
    assert got == want and len(got) == 20


def test_streaming_png_decode_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    write_media_drop(mm.synth_png_media(docs), in_dir, "d1")
    q = run_decode_stream(
        stream_media(spark, in_dir + "/*"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        mm.png_features,
    )
    q.awaitTermination(180)
    got = _rows(spark, spark.read.parquet(str(tmp_path / "out")))
    want = _rows(spark, mm.png_features(mm.synth_png_media(docs)))
    assert got == want and len(got) == 25
