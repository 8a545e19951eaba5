"""Link-graph operators over the document corpus: integer PageRank.

The corpus carries no explicit link column, so the edge set is
SYNTHESIZED deterministically from doc_id (the synth_url /
pii_augmented_text pattern): node u links to (u*u + 31j) mod N for
j in 1..3 — quadratic residues give a skewed in-degree distribution
while keeping out-degree exactly 3 (no dangling-mass handling needed).
N is the corpus size, computed IN-PLAN (broadcast count), never
driver-side.

PageRank runs in EXACT integer arithmetic (the IVF/BM25 discipline —
no float sum ever crosses the engine boundary): ranks are fixed-point
integers at SCALE = 10^9, each iteration is

    rank' = (15 * SCALE) div 100  +  (85 * sum(rank_in div 3)) div 100

with div = floor division on non-negative values, identical in Spark
(`div`) and DuckDB (`//`). Three unrolled iterations; the oracle
(webtext_sql.pagerank_sql) unrolls the same CTE chain.

Overflow headroom: sum of all ranks <= N * SCALE, and 85 * that must
stay under 2^63 -> N <= ~10^8 at SCALE 10^9. For a 100 TB corpus (~up
to 10^11 docs) drop SCALE to 10^6 (still 6 significant digits) or move
the two multiplies to decimal(38,0)/HUGEINT as bm25_topk does; the
iteration structure is unchanged.

Scale shape: each iteration is ONE shuffle (join rank on edge src +
re-aggregate on dst); edges are derived per-row from doc_id, never
materialized to storage. Iterations here are fixed at 3, so no
checkpoint/stats-barrier is needed (the CC lesson in
plans/components.py applies past ~8 chained iterations).

Reference parity anchor: the reference has no graph operators; this is
part of the training-data-pipeline family (link-graph features for
crawl curation), same first-class gating as the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000
PR_ITERS = 3
_OUT_DEG = 3


def synth_edges(docs: DataFrame) -> DataFrame:
    """(src, dst) edge frame: u -> (u*u + 31j) mod N, j in 1..3.
    N rides along as a broadcast single-row aggregate."""
    n = docs.agg(F.count("*").alias("__n"))
    return (
        docs.select(F.col("doc_id").alias("src"))
        .crossJoin(F.broadcast(n))
        .select(
            "src",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
            "__n",
        )
        .select(
            "src",
            F.pmod(F.col("src") * F.col("src") + F.col("j") * 31, F.col("__n"))
            .cast("long")
            .alias("dst"),
        )
    )


def pagerank(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer PageRank over the synthesized link graph (see module
    docstring). Returns (doc_id, in_deg, rank_q) — rank_q is the
    fixed-point rank after `iters` iterations, bit-identical to the
    unrolled DuckDB oracle."""
    nodes = docs.select("doc_id")
    edges = synth_edges(docs)
    base = F.lit((15 * PR_SCALE) // 100).cast("long")
    rank = nodes.select("doc_id", F.lit(PR_SCALE).cast("long").alias("rank_q"))
    for _ in range(iters):
        inc = (
            edges.join(rank, edges.src == rank.doc_id)
            .select("dst", F.expr(f"rank_q div {_OUT_DEG}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        rank = nodes.join(inc, nodes.doc_id == inc.dst, "left").select(
            "doc_id",
            (base + F.expr("85 * coalesce(s, 0L) div 100")).alias("rank_q"),
        )
    in_deg = (
        synth_edges(docs)
        .groupBy("dst")
        .agg(F.count("*").alias("in_deg"))
    )
    return (
        rank.join(in_deg, rank.doc_id == in_deg.dst, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias("in_deg"),
            F.col("rank_q").cast("long"),
        )
    )
