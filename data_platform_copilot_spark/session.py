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
        # Size-based post-shuffle coalescing (the Spark-docs-recommended
        # setting): target advisoryPartitionSizeInBytes (64 MB) instead
        # of preserving parallelism. At 100 TB this right-sizes every
        # reduce stage off the runtime map statistics; locally it
        # collapses kilobyte shuffles to one task, dropping ~30 no-op
        # task schedules per stage (measured 5.2s -> 4.0s on the
        # headline bench at sf0.1).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
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
