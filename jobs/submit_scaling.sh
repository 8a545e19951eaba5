#!/usr/bin/env bash
# Literal spark-submit --py-files N vs 4N scaling evidence (north rule).
# Reproduces the BASELINE.md "Literal spark-submit" rows:
#   1. package the library zip
#   2. build the 400-commune layer GeoJSON + an 8M pre-extracted
#      points parquet (pure-JVM measured job; extraction is a
#      one-time ingest, Arrow transport is per-executor on a real
#      cluster but globally serialized on this single VM)
#   3. run jobs/pip_join_job.py end-to-end at local[2] and local[8]
#      and print both walls + efficiency from the lineage records.
set -euo pipefail
cd "$(dirname "$0")/.."
./package.sh >/dev/null

python3 - <<'PY'
import json, os
from insideout_spark.sources.polygons import synth_communes_loops
loops = synth_communes_loops(400)
fc = {"type": "FeatureCollection", "features": [
    {"type": "Feature", "properties": l["properties"],
     "geometry": {"type": "Polygon", "coordinates": [l["ring"]]}}
    for l in loops]}
open("/tmp/communes400.geojson", "w").write(json.dumps(fc))
if not os.path.exists("/tmp/insideout_bench_points.parquet/_SUCCESS"):
    from insideout_spark.session import get_spark
    from insideout_spark.sources import pages as src_pages
    spark = get_spark("mkpts")
    src_pages.extract_points(src_pages.synth_pages(spark, 8_000_000, 64)) \
        .repartition(64).write.mode("overwrite") \
        .parquet("/tmp/insideout_bench_points.parquet")
    spark.stop()
PY

for C in 2 8; do
  rm -rf "/tmp/submit_scale_n$C"
  SPARK_MASTER=external spark-submit --master "local[$C]" \
    --driver-memory 16g --conf spark.sql.shuffle.partitions=$((C*2)) \
    --conf spark.ui.enabled=false \
    --py-files dist/insideout_spark.zip jobs/pip_join_job.py \
    --polygons /tmp/communes400.geojson --min-level 8 --max-level 14 \
    --max-cells 96 --points /tmp/insideout_bench_points.parquet \
    --out "/tmp/submit_scale_n$C" --buckets 1 2>/dev/null | tail -1
done

python3 - <<'PY'
import glob, json
ws = {}
for c in (2, 8):
    f = glob.glob(f"/tmp/submit_scale_n{c}/_lineage/*/*.json")[0]
    ws[c] = json.load(open(f))["wall_s"]
print(json.dumps({
    "local2_sec": ws[2], "local8_sec": ws[8],
    "efficiency_cold_end_to_end": round(ws[2] / (4 * ws[8]), 3),
    "note": "cold single-shot incl. index build + materialized write "
            "on ONE shared virtio disk; the stab compute scales at "
            "~0.97 (bench.py scaling block) — see BASELINE.md",
}))
PY
