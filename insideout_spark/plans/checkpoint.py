"""Per-partition lineage + metrics checkpoints for resumable batch runs
(north rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY.md §2.9 — batch checkpointing, no Structured Streaming
needed).

The unit of work is a deterministic hash bucket of the input key
(pmod(xxhash64(key), n_buckets)). Each bucket's output is written to a
deterministic path and committed by atomically renaming a lineage JSON
into `_lineage/`. A rerun skips committed buckets — idempotent,
at-least-once per bucket, exactly-once per committed bucket.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_DIR = "_lineage"


def bucket_col(key_cols, n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


def lineage_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, LINEAGE_DIR, f"bucket={bucket}.json")


def read_lineage(out_dir: str) -> dict[int, dict]:
    d = os.path.join(out_dir, LINEAGE_DIR)
    out = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if name.startswith("bucket=") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[int(rec["bucket"])] = rec
    return out


def _commit_lineage(out_dir: str, rec: dict) -> None:
    d = os.path.join(out_dir, LINEAGE_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, lineage_path(out_dir, rec["bucket"]))  # atomic commit


def run_checkpointed(
    spark: SparkSession,
    make_bucket_df,
    n_buckets: int,
    out_dir: str,
    job_name: str = "job",
    fail_on_bucket: int | None = None,
) -> dict:
    """Run `make_bucket_df(bucket) -> DataFrame` for every uncommitted
    bucket, writing parquet to `{out_dir}/bucket={b}` and committing a
    lineage record (rows, wall seconds, job name) after a successful
    write. `fail_on_bucket` injects a failure for resume tests.

    Returns {"processed": [...], "skipped": [...]}. On a cluster the
    buckets of one run execute as successive Spark jobs sharing the
    session; each is internally fully parallel (the bucket count bounds
    re-work on failure, not parallelism).
    """
    done = read_lineage(out_dir)
    processed, skipped = [], []
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            continue
        if fail_on_bucket is not None and b == fail_on_bucket:
            raise RuntimeError(f"injected failure at bucket {b}")
        t0 = time.time()
        df = make_bucket_df(b)
        path = os.path.join(out_dir, f"bucket={b}")
        df.write.mode("overwrite").parquet(path)
        rows = spark.read.parquet(path).count()
        _commit_lineage(
            out_dir,
            {
                "bucket": b,
                "job": job_name,
                "rows": int(rows),
                "wall_s": round(time.time() - t0, 3),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            },
        )
        processed.append(b)
    return {"processed": processed, "skipped": skipped}


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    committed = sorted(read_lineage(out_dir))
    paths = [os.path.join(out_dir, f"bucket={b}") for b in committed]
    return spark.read.parquet(*paths)
