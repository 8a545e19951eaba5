"""Streaming incremental near-dup dedup (foreachBatch over
webtext.dedup_incremental): batches admit against the corpus signature
table AND everything kept by earlier batches; the table grows."""

import os

from insideout_spark.streaming.incremental_dedup import (
    init_corpus_signatures,
    read_corpus_signatures,
    run_incremental_dedup_stream,
)

SCHEMA = "doc_id long, text string"
BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _write(spark, in_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        os.path.join(in_dir, name)
    )


def test_incremental_dedup_stream_grows_corpus(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    sig_path = str(tmp_path / "sigs")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    corpus = spark.createDataFrame(
        [
            (1, BASE),
            (2, "completely different corpus text about spark and shuffles"),
        ],
        SCHEMA,
    )
    init_corpus_signatures(corpus, sig_path)

    # phase 1: doc 101 near-dups corpus doc 1 -> dropped; 102 is new
    _write(
        spark, in_dir, "d1",
        [
            (101, BASE.replace("today", "tonight")),
            (102, "novel ingest content with no match anywhere at all"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir + "/*")
    q = run_incremental_dedup_stream(
        stream, sig_path, out_dir, ck_dir, threshold=0.5
    )
    q.awaitTermination(180)

    got1 = {
        r["doc_id"]: (r["dup_of"], r["keep"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir).collect()
    }
    assert got1[101] == (1, False)
    assert got1[102] == (None, True)
    # corpus table grew by the ONE admitted doc
    sigs = read_corpus_signatures(spark, sig_path)
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == {
        1, 2, 102,
    }

    # phase 2 (checkpoint resume): doc 201 duplicates batch-1-ADMITTED
    # doc 102 (not the original corpus) -> must be dropped against the
    # GROWN table; 202 is new
    _write(
        spark, in_dir, "d2",
        [
            (201, "novel ingest content with no match anywhere at all"),
            (202, "yet another fresh document matching nothing else here"),
        ],
    )
    stream2 = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir + "/*")
    q = run_incremental_dedup_stream(
        stream2, sig_path, out_dir, ck_dir, threshold=0.5
    )
    q.awaitTermination(180)

    got2 = {
        r["doc_id"]: (r["dup_of"], r["keep"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir).collect()
    }
    assert got2[201] == (102, False)
    assert got2[202] == (None, True)
    sigs2 = read_corpus_signatures(spark, sig_path)
    assert {r["doc_id"] for r in sigs2.select("doc_id").collect()} == {
        1, 2, 102, 202,
    }
