"""spark-submit entrypoint: S2 + grid tile assignment of pages.

    spark-submit --py-files dist/insideout_spark.zip jobs/tile_assign_job.py \
        --pages-n 1000000 --out /tmp/tiles --s2-level 10 --grid-res 7
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from insideout_spark.plans.tiles import assign_tiles
from insideout_spark.session import get_spark
from insideout_spark.sources import pages as src_pages


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="parquet path with (url, text) columns")
    ap.add_argument("--pages-n", type=int, default=100_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--s2-level", type=int, default=10)
    ap.add_argument("--grid-res", type=int, default=7)
    args = ap.parse_args(argv)

    spark = get_spark("tile-assign-job")
    pages = spark.read.parquet(args.pages) if args.pages else src_pages.synth_pages(spark, args.pages_n)
    points = src_pages.extract_points(pages)
    tiled = assign_tiles(points, s2_level=args.s2_level, grid_res=args.grid_res, with_token=True)
    tiled.write.mode("overwrite").parquet(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
