#!/usr/bin/env bash
# Run the benchmark via spark-submit --py-files (north-rule packaging
# path: the same artifact a real cluster submit would ship).
#
#   scripts/submit_bench.sh [--scaling]
#
# Packages pyshp_spark/ + __spark_entry__.py into a zip and submits
# bench.py against local[$SPARK_GRAFT_CPUS] (default 32).
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
ZIP=/tmp/pyshp_spark_pkg.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/pyshp_spark_pkg.zip", "w") as z:
    for root, _, files in os.walk("pyshp_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
    z.write("__spark_entry__.py", "__spark_entry__.py")
EOF

exec spark-submit \
    --master "local[$CPUS]" \
    --conf spark.sql.shuffle.partitions="$CPUS" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.driver.memory=16g \
    --py-files "$ZIP" \
    bench.py "$@"
