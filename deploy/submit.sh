#!/usr/bin/env sh
# Batch-flow submit wrapper — the role the reference's prefect-worker
# container plays (infrastructure/Dockerfile.prefect-worker +
# flows/): an orchestrator (cron/Airflow/Prefect) calls this with a
# module to run, e.g.
#   deploy/submit.sh data_platform_copilot_spark.pipelines
set -e

MASTER="${SPARK_MASTER:-spark://spark-master:7077}"
PROPS="$(dirname "$0")/spark-defaults-cluster.conf"
MODULE="${1:?usage: submit.sh <python -m module> [args...]}"
shift

exec spark-submit \
  --master "$MASTER" \
  --deploy-mode client \
  --properties-file "$PROPS" \
  --py-files "$(dirname "$0")/../dist/data_platform_copilot_spark.zip" \
  -- "$(python -c "import importlib.util as u; print(u.find_spec('$MODULE').origin)")" "$@"
