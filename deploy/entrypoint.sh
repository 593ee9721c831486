#!/usr/bin/env sh
set -e

# =============================================================================
# data_platform_copilot_spark container configuration
# (parity: reference entrypoint.sh — same env-var surface, with the
#  DuckDB-file knobs replaced by Spark/warehouse knobs)
# =============================================================================

# Server
export HOST="${HOST:-0.0.0.0}"
export PORT="${PORT:-8000}"
export WORKERS="${WORKERS:-1}"

# Spark execution substrate (replaces DB_FILE_NAME/DB_DIR)
export SPARK_MASTER="${SPARK_MASTER:-local[*]}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"
export SPARK_GRAFT_DRIVER_MEM="${SPARK_GRAFT_DRIVER_MEM:-8g}"
# Cluster masters default to the throughput profile (AQE on); these
# make the choice explicit/overridable per deployment.
export SPARK_GRAFT_AQE="${SPARK_GRAFT_AQE:-}"
export SPARK_GRAFT_SHUFFLE_PARTITIONS="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-}"
export SPARK_GRAFT_CONTROL_ROOT="${SPARK_GRAFT_CONTROL_ROOT:-/data/control}"

# SQL gateway
export ROW_LIMIT="${ROW_LIMIT:-200}"
export QUERY_TIMEOUT_MS="${QUERY_TIMEOUT_MS:-8000}"

# LLM (unchanged from the reference surface)
export LLM_PROVIDER="${LLM_PROVIDER:-stub}"
export LLM_MODEL="${LLM_MODEL:-gpt-4o-mini}"
export OPENAI_API_KEY="${OPENAI_API_KEY:-}"
export OPENROUTER_API_KEY="${OPENROUTER_API_KEY:-}"
export OLLAMA_BASE_URL="${OLLAMA_BASE_URL:-http://localhost:11434}"

# Logging
export LOG_LEVEL="${LOG_LEVEL:-INFO}"

exec "$@"
