#!/usr/bin/env bash
# Build the --py-files artifact for clusters WITHOUT a shared
# filesystem/image (the compose deploy mounts the repo instead, and
# session.py's spark.executorEnv.PYTHONPATH covers that case).
# Usage: deploy/package_pyfiles.sh [out.zip]
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist/data_platform_copilot_spark.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
# stdlib zip via python: no zip(1) dependency in minimal images
python - "$out" <<'PY'
import sys, zipfile
from pathlib import Path
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in Path("data_platform_copilot_spark").rglob("*.py"):
        z.write(p, p)
    # package data (e.g. the PSL snapshot). Only the DRIVER resolves
    # it today (registered_domain bakes InSet literals into the plan),
    # but the artifact must stay import-complete for executor-side
    # code that gains data files later.
    for p in Path("data_platform_copilot_spark").rglob("*.dat"):
        z.write(p, p)
    z.write("__spark_entry__.py")
print(f"wrote {out}")
PY
echo "submit with: spark-submit --py-files $out ..."
