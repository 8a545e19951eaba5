"""Stateful streaming exact dedup (applyInPandasWithState): duplicates
are dropped within AND across micro-batches; state carries over."""

import os

from pyspark.sql import functions as F

from insideout_spark.streaming.dedup_stream import run_dedup_stream
from insideout_spark.streaming.stream_pip import stream_pages


def test_streaming_dedup_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    rows1 = [
        ("https://a.example/1", "alpha text"),
        ("https://a.example/2", "beta text"),
        ("https://a.example/3", "alpha text"),  # in-batch dup of /1
    ]
    rows2 = [
        ("https://b.example/4", "beta text"),  # cross-batch dup of /2
        ("https://b.example/5", "gamma text"),  # new
    ]

    def write_drop(rows, name):
        df = spark.createDataFrame(
            [(u, None, None, t, "en") for u, t in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        df.coalesce(1).write.parquet(os.path.join(in_dir, name))

    # phase 1: first file only
    write_drop(rows1, "d1")
    q = run_dedup_stream(
        stream_pages(spark, in_dir + "/*", max_files=1), out_dir, ck_dir
    )
    q.awaitTermination(120)

    got1 = {
        r["text_md5"]: (r["url"], r["n_seen_before"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got1) == 2  # alpha (min url /1), beta
    assert all(n == 0 for _, n in got1.values())
    assert {u for u, _ in got1.values()} == {
        "https://a.example/1", "https://a.example/2",
    }

    # phase 2: second drop; resume from checkpoint — beta is state-known
    write_drop(rows2, "d2")
    q = run_dedup_stream(
        stream_pages(spark, in_dir + "/*", max_files=1), out_dir, ck_dir
    )
    q.awaitTermination(120)

    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 3  # alpha, beta, gamma — beta NOT re-emitted
    gamma = got2.filter(F.col("url") == "https://b.example/5").collect()
    assert len(gamma) == 1 and gamma[0]["n_seen_before"] == 0
    # the duplicate of beta never appears
    assert got2.filter(F.col("url") == "https://b.example/4").count() == 0
