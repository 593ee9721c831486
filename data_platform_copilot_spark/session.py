"""SparkSession lifecycle for the engine.

The reference opens a fresh DuckDB connection per request with
per-connection resource caps (``SET threads TO 2; SET
memory_limit='512MB'`` — reference src/sql_runner.py:56-57,
src/database/db_connector.py). On Spark the idiomatic equivalent is
ONE long-lived session (`getOrCreate`) with cluster-level resource
management; per-query isolation comes from job groups (used by the
gateway's timeout watchdog) rather than per-connection caps.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting
  replace hand-tuned partition counts when data volume varies 1000x.
- ``spark.sql.shuffle.partitions`` here is a local-mode default;
  a cluster deployment overrides it (or relies on AQE coalescing
  from a high initial value).
- Arrow enabled: every driver<->pandas hop (previews, DQ reports)
  is a columnar batch transfer, not per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import settings

# Env vars outrank the settings file (operator overrides at launch);
# the settings tree supplies the validated defaults.
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(settings.spark.cpus))


def get_spark(app_name: str = "data_platform_copilot_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    UTC session timezone is load-bearing: the correctness oracle
    (DuckDB) uses naive-UTC timestamps, and the reference warehouse
    stores UTC (reference src/database/models.py:48-49).
    """
    master = master or settings.spark.master or f"local[{DEFAULT_CPUS}]"
    n_shuffle = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        settings.spark.shuffle_partitions or DEFAULT_CPUS))
    builder = (
        SparkSession.builder
        .appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Post-shuffle coalescing strategy. parallelismFirst=true (the
        # Spark default) sizes reduce stages to keep default parallelism
        # (still collapsing kilobyte shuffles, since the 1 MB
        # minPartitionSize floor applies); =false targets
        # advisoryPartitionSizeInBytes off runtime map stats. A/B at
        # sf0.1 local[32]: =false serializes the heaviest reduce stage
        # (multi_join_topk 0.63s -> 0.95s) with no offsetting win on the
        # small-shuffle queries, so parallelism-first is the local
        # default; a cluster deployment that wants strict 64 MB
        # size-based coalescing flips SPARK_GRAFT_PARALLELISM_FIRST.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
        # Advisory target for AQE (coalescing when parallelismFirst is
        # flipped off, plus skew-join splitting). 8 MB keeps heavy local
        # stages parallel; clusters override via SPARK_GRAFT_ADVISORY_MB
        # (64 is the Spark default).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(int(os.environ.get("SPARK_GRAFT_ADVISORY_MB", "8"))
                    * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
        # default; read as long and rebuild micros in the source layer
        # (sources/registry.py), matching DuckDB's nanos->micros truncation.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                               settings.spark.driver_memory))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
