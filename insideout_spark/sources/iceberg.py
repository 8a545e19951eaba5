"""Pages-table source with Iceberg support gated behind availability.

The production input (BASELINE.json input_hint) is an Iceberg table of
Common-Crawl-style pages. This container ships no Iceberg runtime jars,
so `read_pages` prefers an Iceberg catalog table when the session can
resolve one and falls back to parquet paths — the rest of the engine is
source-agnostic DataFrames either way. On a real cluster, partition
pruning on `warc_ts` / url-hash buckets comes for free from the
declarative filters (SURVEY.md §2.1 'Iceberg pages source')."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, source: str, since_ts=None) -> DataFrame:
    """`source` is an Iceberg table name (catalog.db.table) or a parquet
    path. Optional `since_ts` pushes a warc_ts partition-pruning filter
    down to the scan."""
    if "/" not in source and iceberg_available(spark):
        df = spark.read.table(source)
    else:
        df = spark.read.parquet(source)
    if since_ts is not None:
        df = df.filter(F.col("warc_ts") >= F.lit(since_ts))
    return df
