"""Watermarked windowed tile counts on a stream: emitted windows must
equal the batch aggregation once the watermark passes them."""

import datetime as dt

from pyspark.sql import functions as F

from insideout_spark.functions.udfs import grid_cell_expr
from insideout_spark.sources import pages as src_pages
from insideout_spark.streaming.stream_pip import stream_pages
from insideout_spark.streaming.tile_counts import run_tile_count_stream


def _batch_counts(spark, pages):
    pts = src_pages.extract_points(pages)
    # re-attach warc_ts (extract_points keeps url only)
    pts = pts.join(pages.select("url", "warc_ts"), "url")
    cells = pts.withColumn("grid_cell", grid_cell_expr("lat", "lng", 7))
    return (
        cells.groupBy(F.window("warc_ts", "10 minutes").alias("w"), "grid_cell")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"), "grid_cell", "n_pages"
        )
    )


def test_windowed_tile_counts_with_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    # phase 1: one hour of pages (warc_ts = epoch + i seconds)
    pages = src_pages.synth_pages(spark, 3600, partitions=4)
    pages.write.parquet(in_dir)
    q = run_tile_count_stream(
        stream_pages(spark, in_dir, max_files=2), out_dir, ck_dir,
        window="10 minutes", watermark="5 minutes",
    )
    q.awaitTermination(180)

    # phase 2: a far-future page advances the watermark past every
    # phase-1 window so append mode flushes them all
    future = spark.createDataFrame(
        [(
            "https://example.org/zz",
            dt.datetime(2024, 1, 2, 0, 0, 0),
            b"<html><body>x geo:47.0000000,2.0000000</body></html>",
            "x geo:47.0000000,2.0000000",
            "fr",
        )],
        src_pages.PAGES_SCHEMA,
    )
    future.write.mode("append").parquet(in_dir)
    q2 = run_tile_count_stream(
        stream_pages(spark, in_dir, max_files=2), out_dir, ck_dir,
        window="10 minutes", watermark="5 minutes",
    )
    q2.awaitTermination(180)

    got = {
        (r["window_start"], r["grid_cell"]): r["n_pages"]
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["window_start"], r["grid_cell"]): r["n_pages"]
        for r in _batch_counts(spark, pages).collect()
    }
    # every phase-1 window emitted exactly once with the right count
    for k, v in want.items():
        assert got.get(k) == v, k
