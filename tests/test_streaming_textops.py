"""Streaming parity for the stateless text operators: chunk_windows
(pure Catalyst) and winnow_fingerprints (mapInPandas) applied to a
file-source STREAM produce exactly the batch results after the flush —
the §2.9 pattern (append mode, no watermark needed: both are
row-local)."""

import os

from insideout_spark.plans.webtext import chunk_windows, winnow_fingerprints


def _drop(spark, in_dir, name, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(os.path.join(in_dir, name))


def test_streaming_chunk_and_winnow_match_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rows1 = [(1, " ".join(f"w{i}" for i in range(150))), (2, "short doc here")]
    rows2 = [(3, " ".join(f"v{i % 7}" for i in range(80))), (4, None)]
    _drop(spark, in_dir, "d1", rows1)
    _drop(spark, in_dir, "d2", rows2)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    batch = spark.read.schema("doc_id long, text string").parquet(in_dir + "/*")

    for op, out_name in ((chunk_windows, "chunks"), (winnow_fingerprints, "fps")):
        out_dir = str(tmp_path / out_name)
        ck_dir = str(tmp_path / (out_name + "_ck"))
        q = (
            op(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), out_name
        got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
        want = sorted(map(tuple, op(batch).collect()))
        assert got == want and len(want) > 0, out_name
