"""Streaming incremental NEAR-dup dedup: admit each micro-batch
against the persisted corpus signature table and grow that table with
the signatures of admitted docs — the production ingest loop on top of
webtext.dedup_incremental (batch k dedups against corpus ∪ everything
kept from batches < k, plus within itself).

Architecture: foreachBatch, the Structured Streaming idiom for reusing
a batch operator that needs multi-pass joins (the banded LSH join +
within-batch self-join cannot be expressed as a single stateless
stream-static join, and per-key state is the wrong shape — candidate
generation is pairwise). Exactly-once: every side write is keyed by
batch_id with mode("overwrite") (directory-per-batch), so a retried
batch overwrites its own partial output instead of double-appending;
the signature table is a directory of per-batch subdirs read with
recursiveFileLookup (the initial corpus lives in <sig>/base/).

At 100 TB the signature table is the same persisted artifact
save_signatures maintains; each ingest batch pays one signature pass
over ITSELF plus one (band,bh)-keyed join against the table — corpus
text is never rescanned. (The reference has no streaming — SURVEY.md
§2.9; this is the north-rule streaming surface.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..plans.webtext import dedup_incremental, minhash_signatures


def init_corpus_signatures(
    corpus_docs: DataFrame, sig_path: str, text_col: str = "text"
) -> None:
    """Seed the growing signature table with the existing corpus."""
    minhash_signatures(corpus_docs, text_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(sig_path, "base"))


def read_corpus_signatures(spark, sig_path: str) -> DataFrame:
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(sig_path)
    )


def run_incremental_dedup_stream(
    docs_stream: DataFrame,
    sig_path: str,
    out_dir: str,
    ck_dir: str,
    text_col: str = "text",
    threshold: float = 0.5,
):
    """availableNow runner: per micro-batch, write (doc_id, dup_of,
    keep) verdicts to out_dir/batch-<id>/ and append admitted docs'
    signatures to the corpus table at sig_path/batch-<id>/."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        corpus_sigs = read_corpus_signatures(spark, sig_path)
        verdict = dedup_incremental(
            batch_df, corpus_sigs, text_col=text_col, threshold=threshold
        ).persist()
        verdict.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch-{batch_id}")
        )
        kept = batch_df.join(
            verdict.filter("keep").select("doc_id"), "doc_id"
        )
        minhash_signatures(kept, text_col).write.mode("overwrite").parquet(
            os.path.join(sig_path, f"batch-{batch_id}")
        )
        verdict.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
