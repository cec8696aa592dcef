#!/usr/bin/env bash
# Package cli_spark as a --py-files zip and run the KG pipeline via
# spark-submit (north rule: "the whole job runs via spark-submit
# --py-files"). On a real cluster swap --master for yarn/k8s and add
# executor sizing; everything else is unchanged.
#
# Usage: scripts/submit_pipeline.sh [--n-files N] [--workdir DIR] [extra CLI args]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="$REPO/build"
ZIP="$BUILD/cli_spark.zip"

mkdir -p "$BUILD"
# -FS keeps the zip in sync with the tree (adds/updates/deletes)
(cd "$REPO" && python - <<'EOF'
import os, zipfile
zf = zipfile.ZipFile("build/cli_spark.zip", "w", zipfile.ZIP_DEFLATED)
for root, _dirs, files in os.walk("cli_spark"):
    if "__pycache__" in root:
        continue
    for f in files:
        if f.endswith(".py"):
            p = os.path.join(root, f)
            zf.write(p, p)
zf.close()
print("wrote build/cli_spark.zip", os.path.getsize("build/cli_spark.zip"), "bytes")
EOF
)

MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-16}]}"

exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-8g}" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.local.dir="${SPARK_GRAFT_LOCAL_DIR:-/dev/shm/spark-local}" \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/scripts/run_job.py" pipeline "$@"
