"""Time the driver-side pair generation pieces at sf1."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import __spark_entry__ as entry_mod
from insideout_spark.plans import webtext as wt
from insideout_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("r06-pairgen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
entry_mod._prepare(spark)

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
t0 = time.time()
sigs = wt._register_sig_cache(wt.minhash_signatures(docs), True)
print(f"sig cache fill: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
spdf = sigs.select("doc_id", "sig").toPandas()
print(f"toPandas: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
ids = spdf["doc_id"].to_numpy(dtype=np.int64)
smat = np.array(spdf["sig"].tolist(), dtype=np.int64)
o = np.argsort(ids)
ids, smat = ids[o], smat[o]
print(f"matrix build: {time.time()-t0:.2f}s", flush=True)
for rep in range(2):
    t0 = time.time()
    a, b, est = wt._banded_pairs_numpy(ids, smat, 1024, 0.35)
    print(f"_banded_pairs_numpy: {time.time()-t0:.2f}s -> {len(a)} pairs", flush=True)
import pandas as pd

for rep in range(2):
    t0 = time.time()
    out = spark.createDataFrame(
        pd.DataFrame({"doc_a": a, "doc_b": b, "est_jaccard": est}),
        schema="doc_a long, doc_b long, est_jaccard double",
    )
    print(f"createDataFrame: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    n = out.count()
    print(f"count: {time.time()-t0:.2f}s -> {n}", flush=True)
spark.stop()
