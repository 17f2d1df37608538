#!/usr/bin/env bash
# Packaging evidence for the north rule's `spark-submit --py-files`
# requirement: zip the engine package, submit a replay job that imports
# ONLY from the zip, verify the final table state in-job.
#
# Usage: tools/package_and_submit.sh [master]   (default local[8])
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
WORK="$(mktemp -d /tmp/pkg_submit.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

# build the deployable zip (package only — no tests, no repo files)
(cd "$REPO" && python - "$WORK/data_pipeline_spark.zip" <<'PY'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("data_pipeline_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("zipped", out)
PY
)

# copy the job OUT of the repo so a stray checkout on sys.path can't
# mask a broken zip
cp "$REPO/tools/submit_replay_job.py" "$WORK/job.py"

SUBMIT="$(command -v spark-submit || echo /opt/spark/bin/spark-submit)"
cd "$WORK"
set +e
"$SUBMIT" \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --py-files "$WORK/data_pipeline_spark.zip" \
  "$WORK/job.py" >"$WORK/out.log" 2>&1
rc=$?
set -e
grep -E "SUBMIT_REPLAY|Error|Exception" "$WORK/out.log" | head -5 || true
if [ $rc -ne 0 ] || ! grep -q "SUBMIT_REPLAY_OK" "$WORK/out.log"; then
  echo "PACKAGE_SUBMIT_FAIL (rc=$rc)"; tail -30 "$WORK/out.log"; exit 1
fi
echo "PACKAGE_SUBMIT_OK"
