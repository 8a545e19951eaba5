"""Round-6: where does minhash_lsh_pairs spend its FIRST run?
Sub-stage walls in a fresh session, then a repeat in-session."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from insideout_spark.plans import webtext as wt
from insideout_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

spark = get_spark("r06-minhash-prof", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
entry_mod._prepare(spark)

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s -> {out}", flush=True)
    return out


for rep in (1, 2):
    print(f"--- rep {rep} ---", flush=True)
    t("docs.count", lambda: docs.count())
    sigs = wt.minhash_signatures(docs)
    t("signatures.count", lambda: sigs.count())
    sigs2 = wt._register_sig_cache(wt.minhash_signatures(docs), True)
    t("sig cache fill (count)", lambda: sigs2.count())
    t("sigs.toPandas", lambda: len(sigs2.select("doc_id", "sig").toPandas()))
    bands = wt._sig_bands(sigs2, with_ord=True)
    t("bands.count", lambda: bands.count())
    grouped = bands.groupBy("band", "bh").agg(F.count("*").alias("n"))
    t("bucket-count agg", lambda: grouped.count())
    t(
        "full minhash_lsh_pairs",
        lambda: wt.minhash_lsh_pairs(docs, threshold=0.35).count(),
    )
spark.stop()
