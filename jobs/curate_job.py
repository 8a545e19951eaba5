"""spark-submit entrypoint: the full training-data curation + geocoding
pipeline (dedup -> near-dup -> language filter -> stab join -> tiles).

    spark-submit --py-files dist/insideout_spark.zip jobs/curate_job.py \
        --polygons tests/golden/houat.geojson --pages-n 100000 \
        --out /tmp/curated [--langs fr en]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from insideout_spark.plans.index_build import build_index
from insideout_spark.plans.pipeline import geocode_pipeline
from insideout_spark.session import get_spark
from insideout_spark.sources import pages as src_pages
from insideout_spark.sources.polygons import load_geojson_loops


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--polygons", required=True)
    ap.add_argument("--pages", help="parquet path of pages")
    ap.add_argument("--pages-n", type=int, default=100_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", nargs="+", default=["fr", "en"])
    args = ap.parse_args(argv)

    spark = get_spark("curate-job")
    index = build_index(spark, load_geojson_loops(args.polygons))
    pages = spark.read.parquet(args.pages) if args.pages else src_pages.synth_pages(
        spark, args.pages_n
    )
    out = geocode_pipeline(pages, index, langs=tuple(args.langs))
    out.withColumn("properties", F.to_json("properties")).write.mode(
        "overwrite"
    ).parquet(args.out)
    print(f"wrote {spark.read.parquet(args.out).count()} rows to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
