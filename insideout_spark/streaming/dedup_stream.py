"""Streaming exact dedup with custom state (applyInPandasWithState).

The batch engine dedups with a hash groupBy (plans/webtext.py); on a
continuous ingest the same semantics need per-key state that survives
micro-batches: the FIRST page with a given text hash passes through,
every later duplicate (same batch or any later batch) is dropped. The
state per key is one counter — O(distinct texts), the minimum any
exact streaming dedup can hold. (The reference has no streaming at
all — SURVEY.md §2.9; this is a north-rule/prompt addition: custom
stateful operators via applyInPandasWithState.)

At 100 TB scale the state store is RocksDB
(spark.sql.streaming.stateStore.providerClass) and the md5 key space
shards evenly across executors — no skew: each key's state is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def dedup_stream(
    pages: DataFrame, text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """Streaming DataFrame -> (text_md5, url, n_seen_before) with one
    output row per DISTINCT text (its first occurrence; ties within a
    micro-batch break on min url). n_seen_before is 0 for a key never
    seen in any earlier micro-batch."""
    keyed = pages.select(
        F.md5(F.col(text_col)).alias("text_md5"), F.col(url_col).alias("url")
    ).groupBy("text_md5")

    def fn(key, pdfs, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        first_n = n
        # min url over the WHOLE micro-batch: a key's rows may span
        # several Arrow chunks, and the smallest url can arrive in a
        # later chunk
        first_url = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = pdf["url"].min()
            if first_url is None or m < first_url:
                first_url = m
            n += len(pdf)
        state.update((int(n),))
        if first_n == 0 and first_url is not None:
            yield pd.DataFrame(
                {
                    "text_md5": [key[0]],
                    "url": [first_url],
                    "n_seen_before": [first_n],
                }
            )

    return keyed.applyInPandasWithState(
        fn,
        outputStructType="text_md5 string, url string, n_seen_before long",
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(pages_stream: DataFrame, out_dir: str, ck_dir: str):
    """availableNow runner writing the deduped first-occurrences to
    parquet with exactly-once checkpointing."""
    res = dedup_stream(pages_stream)
    return (
        res.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
