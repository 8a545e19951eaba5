"""Rep-by-rep decomposition of the dedup family at sf1 — where does
the degradation across repetitions come from?"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import __spark_entry__ as entry_mod
from insideout_spark.plans import components as comp
from insideout_spark.plans import webtext as wt
from insideout_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("r06-family", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
entry_mod._prepare(spark)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return out


for rep in range(3):
    print(f"--- rep {rep} ---", flush=True)
    sigs = t("sig cache fill", lambda: wt._register_sig_cache(wt.minhash_signatures(docs), True))
    spdf = t("toPandas", lambda: sigs.select("doc_id", "sig").toPandas())
    ids = spdf["doc_id"].to_numpy(dtype=np.int64)
    smat = np.array(spdf["sig"].tolist(), dtype=np.int64)
    o = np.argsort(ids)
    ids, smat = ids[o], smat[o]
    a, b, est = t("banded_pairs_numpy", lambda: wt._banded_pairs_numpy(ids, smat, 1024, 0.35))
    nodes, cc = t("cc_numpy", lambda: comp._cc_numpy(a, b))
    import pandas as pd

    out = t("createDataFrame pairs", lambda: spark.createDataFrame(
        pd.DataFrame({"doc_a": a, "doc_b": b, "est_jaccard": est}),
        schema="doc_a long, doc_b long, est_jaccard double",
    ))
    t("pairs.count", lambda: out.count())
    ccdf = t("createDataFrame cc", lambda: spark.createDataFrame(
        pd.DataFrame({"node": nodes, "component_id": cc})))
    t("cc.count", lambda: ccdf.count())
spark.stop()
