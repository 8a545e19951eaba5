"""Scan hygiene: filters and projections must reach the parquet reader
(PushedFilters / ReadSchema) — the 'push down and prune' scale contract."""

import datetime as dt
import os

from pyspark.sql import functions as F

from insideout_spark.sources import pages as src_pages
from insideout_spark.sources.iceberg import iceberg_available, read_pages


def test_pages_filter_pushdown(spark, tmp_path):
    path = str(tmp_path / "pages_pq")
    src_pages.synth_pages(spark, 2000, partitions=4).write.parquet(path)

    since = dt.datetime(2024, 1, 1, 0, 10, 0)
    df = read_pages(spark, path, since_ts=since)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "warc_ts" in plan.split("PushedFilters")[1][:200]
    # and the filter is correct
    assert df.count() == 2000 - 600


def test_column_pruning_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "pages_pq2")
    src_pages.synth_pages(spark, 500, partitions=2).write.parquet(path)
    df = spark.read.parquet(path).select("url", "lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ReadSchema must carry only the projected columns — html (the big
    # binary column) must not be read for a 2-column projection
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "url" in rs and "lang" in rs
    assert "html" not in rs and "text" not in rs


def test_iceberg_gate_reports_absent(spark):
    assert not iceberg_available(spark)  # no Iceberg jars in this container
