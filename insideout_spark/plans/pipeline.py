"""End-to-end training-data pipeline composition.

The engine's operators compose into the canonical web-corpus curation
flow — this module wires them into one DataFrame->DataFrame function so
a user of the reference (one stab query at a time over gRPC) can run
the whole corpus-scale equivalent in a single Spark job:

    pages
      -> exact dedup           (md5 groups, keep lowest doc id)
      -> near-dup removal      (MinHash-LSH pairs, drop the higher id)
      -> language filter       (declared lang or stopword guess)
      -> coordinate extraction (deterministic, byte-identical per url)
      -> dual-cover stab join  (geocode against the polygon layer)
      -> tile assignment       (S2 + grid)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.pages import extract_points
from .index_build import IndexBundle
from .pip_join import pip_join
from .tiles import assign_tiles
from .webtext import lang_guess, minhash_lsh_pairs


def curate_pages(
    pages: DataFrame,
    langs: tuple[str, ...] = ("fr", "en"),
    near_dup_threshold: float = 0.85,
) -> DataFrame:
    """Dedup + language-filter the pages corpus. Returns surviving pages
    with their original columns."""
    # exact dedup: keep the lowest-url representative of identical text
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("url")
    pages = (
        pages.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # near-dup removal: LSH pairs on a doc_id surrogate, drop the higher
    docs = pages.select(F.xxhash64("url").alias("doc_id"), "text")
    pairs = minhash_lsh_pairs(docs, threshold=near_dup_threshold)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    pages = pages.join(
        losers, F.xxhash64(pages["url"]) == losers["doc_id"], "left_anti"
    )
    # language filter: declared lang when present, else stopword guess
    guessed = lang_guess(
        pages.select(F.xxhash64("url").alias("doc_id"), "text")
    ).select("doc_id", "lang_guess")
    pages = pages.join(
        guessed, F.xxhash64(pages["url"]) == guessed["doc_id"], "left"
    ).drop("doc_id")
    keep = F.col("lang").isin(list(langs)) | F.col("lang_guess").isin(list(langs))
    return pages.filter(keep).drop("lang_guess")


def geocode_pipeline(
    pages: DataFrame,
    index: IndexBundle,
    langs: tuple[str, ...] = ("fr", "en"),
    s2_level: int = 10,
    grid_res: int = 7,
) -> DataFrame:
    """curate -> extract -> stab join -> tile assign. One job, one
    output table: (url, lat, lng, feature_id, loop_pos, is_sure_hit,
    properties, admin_level, s2_cell_l{L}, grid_cell_r{R})."""
    curated = curate_pages(pages, langs=langs)
    points = extract_points(curated)
    hits = pip_join(points, index, id_cols=("url",))
    return assign_tiles(hits, s2_level=s2_level, grid_res=grid_res)


def _kept_docs_arrow(docs: DataFrame) -> DataFrame:
    """(doc_id, text) of documents passing the curation keep decision —
    an exact Python twin of `_quality_parts` r1-r4 plus the repetition
    cap, evaluated per Arrow batch:

      r1: 5 <= n <= 100000                 (n = len(split(trim ' ', ' +')))
      r2: 2000*n <= 1000*sum(len) <= 12000*n
      r3: max token length <= 60
      r4: 1000*#single-char <= 200*n
      rep: 2*max-multiplicity(ws_tokens) <= len(ws_tokens)

    All-integer arithmetic and both tokenizations (space-split over
    space-trimmed text; whitespace-class split dropping empties) mirror
    the Catalyst/oracle expressions symbol for symbol; Spark's
    length() counts code points exactly like Python len()."""
    import re
    from collections import Counter

    import numpy as np

    from .util import ensure_parallel
    from .webtext import _texts

    sp = re.compile(" +")
    ws = re.compile("[ \t\r\n]+")

    def run(batches):
        for pdf in batches:
            keep = []
            for t in _texts(pdf["text"]):
                tq = sp.split(t.strip(" "))
                n = len(tq)
                ok = 5 <= n <= 100000
                if ok:
                    total = sum(map(len, tq))
                    ok = 2000 * n <= 1000 * total <= 12000 * n
                if ok:
                    ok = max(map(len, tq)) <= 60
                if ok:
                    ok = 1000 * sum(1 for x in tq if len(x) == 1) <= 200 * n
                if ok:
                    tw = [x for x in ws.split(t) if x]
                    m = max(Counter(tw).values(), default=0)
                    ok = 2 * m <= len(tw)
                keep.append(ok)
            yield pdf.loc[np.array(keep, dtype=bool), ["doc_id", "text"]]

    return ensure_parallel(docs.select("doc_id", "text"), "doc_id").mapInPandas(
        run, schema="doc_id long, text string"
    )


def curate_text_pipeline(
    docs: DataFrame, budget_tokens: int = 512, n_buckets: int = 8
) -> DataFrame:
    """The LLM-corpus curation closer, composed from the engine's own
    operators in one plan: Gopher quality rules AND a repetition cap
    (most-common token <= 50% of tokens) select the kept set; the kept
    documents get a leakage-safe hash split and a sequence-packing
    assignment. Output: (doc_id, split, bucket, pack_seq, pack_offset)
    for kept docs only — the manifest a training-data loader consumes.

    Plan shape: the three per-doc stages (quality, repetition, split)
    are zero-shuffle Catalyst; packing adds its one bucket shuffle; the
    id-equi-joins co-partition. The DuckDB oracle chains the SAME
    mirrored subqueries over a `kept` CTE — composition is gated
    end-to-end, not just each stage alone."""
    from .webtext import pack_assign, split_cols

    # keep decision in ONE Arrow-batched Python pass (r06): the fused
    # Catalyst filter (quality parts + the sort_array/aggregate
    # repetition fold) measured ~4 s of the 4.3 s query at sf1 — per-row
    # lambda-expression evaluation, not shuffle. _kept_docs_arrow is an
    # exact integer twin (same tokenizations, same x1000 threshold
    # arithmetic, same max-multiplicity) pinned by
    # test_curation_kept_set_matches_catalyst.
    kept = _kept_docs_arrow(docs)
    pk = pack_assign(kept, budget_tokens, n_buckets)
    # split is a pure function of doc_id (split_cols), so it projects
    # straight onto the packing output — no join, and the kept subplan
    # (the expensive double tokenization) executes exactly once
    _, split = split_cols(F.col("doc_id"))
    return pk.select(
        "doc_id", split.alias("split"), "bucket", "pack_seq", "pack_offset"
    )
