"""Connected components over near-duplicate pair graphs — the step
that turns pairwise dedup output (minhash_lsh_pairs /
embedding_near_dup_pairs / ngram_jaccard_pairs) into CLUSTER ids so a
pipeline can keep one representative per duplicate cluster. No
reference equivalent (the reference is a point-stab engine); this is
the standard large-scale dedup closer (the MinHash-LSH papers'
"connected components of the candidate graph").

Algorithm: iterative min-label propagation WITH pointer jumping. Each
round every node takes the min label among itself and its neighbors,
then composes the label mapping with itself (lab := lab[lab]), so
reach doubles per round and a length-L chain converges in O(log L)
rounds — long drift chains are real in near-dup graphs (templated
pages mutating gradually). Converges to label == min(node id in
component). Each round is two joins + one map-combinable min
aggregation over the LABEL frame; the pair graph is tiny relative to
the corpus (pairs only exist for near-dups), so at 100 TB this runs
on the dedup output, never the raw docs.

The DuckDB oracle (components_sql in __spark_entry__.py) computes the
same fixpoint with WITH RECURSIVE — the fixpoint is engine-independent
(pure integer min over reachable ids), so the driver's value-hash gate
applies to an ITERATIVE operator too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# persisted per-iteration label frames of past calls; superseded on the
# next call or released explicitly (same contract as plans/knn.py)
_LABEL_CACHES: list = []


def release_component_caches() -> None:
    while _LABEL_CACHES:
        _LABEL_CACHES.pop().unpersist()


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
    auto_release: bool = True,
) -> DataFrame:
    """(node, component_id) for every node appearing in `pairs`;
    component_id = min node id in the component. Deterministic,
    engine-independent fixpoint."""
    if auto_release:
        release_component_caches()
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # localCheckpoint TRUNCATES the logical plan, not just caches it:
    # every iteration references its inputs twice (union + propagation
    # join), so with plain persist the ANALYZED plan doubles per round
    # on top of the full upstream pair-pipeline lineage — exponential
    # Catalyst work that OOMs the driver after ~10 rounds. Cutting
    # lineage each round keeps plans O(1). (Checkpoint blocks are freed
    # by the ContextCleaner when the frames are garbage-collected.)
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(int(max_iters)):
        # step 1: neighbor min — every node takes the min label among
        # itself and its direct neighbors
        prop = edges.join(
            labels.select(F.col("node").alias("src"), "lab"), "src"
        ).select(F.col("dst").alias("node"), "lab")
        m = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        # step 2: pointer jumping — compose the label mapping with
        # itself (lab := lab[lab]), so reach doubles per round and a
        # length-L chain converges in O(log L) rounds instead of O(L)
        # (real near-dup graphs contain long drift chains)
        jump = m.select(F.col("node").alias("__ln"), F.col("lab").alias("__ll"))
        new = (
            m.join(jump, m["lab"] == jump["__ln"], "left")
            .select("node", F.least(F.col("lab"), F.coalesce("__ll", "lab")).alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.select("node", F.col("lab").alias("__old")), "node")
            .filter(F.col("lab") != F.col("__old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds — "
            "pathological long-path graph; use a star-contraction variant"
        )
    return labels.select("node", F.col("lab").alias("component_id"))


def dedup_cluster_representatives(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """One row per duplicate cluster: (component_id == representative
    doc, n_members). Downstream 'keep one per cluster' = anti-join docs
    against members where node != component_id."""
    cc = connected_components(pairs, a_col, b_col, auto_release=False)
    return cc.groupBy("component_id").agg(F.count("*").cast("long").alias("n_members"))
