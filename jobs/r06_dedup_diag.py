"""Round-6 diagnostic: where does the minhash->CC dedup family spend
its time at sf1.0? Times each stage in isolation (noop-style counts)
and instruments connected_components rounds."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from insideout_spark.plans import components as comp
from insideout_spark.plans import webtext as wt
from insideout_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

spark = get_spark("r06-dedup-diag", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
entry_mod._prepare(spark)

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s -> {out}", flush=True)
    return out

# 1. signature pass alone
sigs = wt.minhash_signatures(docs)
t("sig_pass(count)", lambda: sigs.count())

# 2. minhash_lsh_pairs cold (sig cache path)
t("minhash_lsh_pairs cold", lambda: wt.minhash_lsh_pairs(docs, threshold=0.35).count())
# again warm-plan
t("minhash_lsh_pairs 2nd", lambda: wt.minhash_lsh_pairs(docs, threshold=0.35).count())

# 3. band/bucket stats
sigs2 = wt.minhash_signatures(docs).cache()
sigs2.count()
bands = wt._sig_bands(sigs2)
stats = bands.groupBy("band", "bh").agg(F.count("*").alias("n"))
t("bucket stats", lambda: stats.agg(
    F.count("*"), F.max("n"), F.sum(F.when(F.col("n") > 1024, 1).otherwise(0)),
    F.sum(F.when(F.col("n") > 1, (F.col("n")*(F.col("n")-1)/2).cast("long")).otherwise(0)),
).collect())

# 4. pair count + distinct nodes
pairs = wt.minhash_lsh_pairs(docs, threshold=0.35, signatures=sigs2)
n_pairs = t("pairs count", lambda: pairs.count())
pairs_c = pairs.localCheckpoint(eager=True)
t("n nodes", lambda: pairs_c.select(F.col("doc_a").alias("n")).unionByName(
    pairs_c.select(F.col("doc_b").alias("n"))).distinct().count())

# 5. CC rounds instrumentation: patch the loop by monkey timing
orig_cc = comp.connected_components
t0 = time.time()
cc = orig_cc(pairs_c)
n_cc = cc.count()
print(f"CC total from checkpointed pairs: {time.time()-t0:.2f}s rows={n_cc}", flush=True)

# manual instrumented loop replica
edges = pairs_c.select(F.col("doc_a").cast("long").alias("src"), F.col("doc_b").cast("long").alias("dst"))
edges = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
edges = edges.localCheckpoint(eager=True)
print(f"edges: {edges.count()}", flush=True)
labels = edges.select(F.col("src").alias("node")).distinct().withColumn("lab", F.col("node"))
for it in range(50):
    t0 = time.time()
    prop = edges.join(labels.select(F.col("node").alias("src"), "lab"), "src").select(
        F.col("dst").alias("node"), "lab")
    m = labels.unionByName(prop).groupBy("node").agg(F.min("lab").alias("lab"))
    jump = m.select(F.col("node").alias("__ln"), F.col("lab").alias("__ll"))
    new = (m.join(jump, m["lab"] == jump["__ln"], "left")
           .select("node", F.least(F.col("lab"), F.coalesce("__ll", "lab")).alias("lab"))
           .localCheckpoint(eager=False))
    changed = (new.join(labels.select("node", F.col("lab").alias("__old")), "node")
               .filter(F.col("lab") != F.col("__old")).count())
    labels = new
    print(f"round {it}: {time.time()-t0:.2f}s changed={changed}", flush=True)
    if changed == 0:
        break

spark.stop()
