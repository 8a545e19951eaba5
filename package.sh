#!/bin/sh
# Build the --py-files artifact for spark-submit (north rule: "run via
# spark-submit --py-files on a multi-executor cluster").
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/insideout_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/insideout_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("insideout_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/insideout_spark.zip")
EOF
