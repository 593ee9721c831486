"""SparkSession lifecycle for the engine.

The reference opens a fresh DuckDB connection per request with
per-connection resource caps (``SET threads TO 2; SET
memory_limit='512MB'`` — reference src/sql_runner.py:56-57,
src/database/db_connector.py). On Spark the idiomatic equivalent is
ONE long-lived session (`getOrCreate`) with cluster-level resource
management; per-query isolation comes from job groups (used by the
gateway's timeout watchdog) rather than per-connection caps.

Scale notes (100 TB / 1000 executors):
- AQE on for cluster masters: runtime shuffle-partition coalescing +
  skew-join splitting replace hand-tuned partition counts when data
  volume varies 1000x. Local masters default AQE off (measured: its
  per-stage job barriers cost ~100ms each on warm MB-scale data with
  nothing for runtime stats to discover); SPARK_GRAFT_AQE overrides.
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
    # Precedence: explicit arg > SPARK_GRAFT_MASTER env (lets every
    # tool — bench, check_correctness, probes — run unchanged against
    # a spark:// standalone master) > settings > local[cpus].
    master = (master or os.environ.get("SPARK_GRAFT_MASTER")
              or settings.spark.master or f"local[{DEFAULT_CPUS}]")
    is_local = master.startswith("local")
    # Local default: ~cpus/3 reduce tasks, floor 8. On warm cached
    # MB-GB data in one JVM, reduce stages are latency-bound, not
    # throughput-bound: task-launch overhead scales with task count
    # while per-task work is microseconds. Measured on the sf0.1
    # headline pack at local[32]: 12 partitions ≈ 8 < 16 < 32 (total
    # 2.4-2.8s vs 4.2-4.9s at 32). Cluster masters keep the
    # high-initial-count + AQE-coalesce strategy (docstring above).
    local_shuffle_default = max(8, int(DEFAULT_CPUS) // 3)
    n_shuffle = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        settings.spark.shuffle_partitions
        or (local_shuffle_default if is_local else int(DEFAULT_CPUS))))
    # AQE default is master-conditional. On a cluster, runtime stats
    # (unknown input sizes, skew, partition coalescing) pay for AQE's
    # per-stage materialization barriers many times over — it stays
    # ON. In local single-JVM mode over warm cached MB-scale data the
    # trade inverts: each AQE stage materialization is a separate job
    # (~100ms scheduling latency here) while runtime re-planning has
    # nothing to discover — measured 4.9s -> 2.8s total on the sf0.1
    # headline pack. Env-overridable either way (SPARK_GRAFT_AQE).
    aqe = os.environ.get("SPARK_GRAFT_AQE",
                         "false" if is_local else "true")
    # Non-local masters: executor-side Python workers must import this
    # package (Arrow-stage closures reference operator modules by
    # name), so put the repo root on their PYTHONPATH. Covers
    # same-filesystem standalone (this box, deploy/compose.yaml, which
    # mounts the repo into every container); a multi-node deployment
    # without a shared image instead ships a wheel via --py-files.
    # Found by the r8 cluster-mode oracle run: every mapInPandas codec
    # entry failed with ModuleNotFoundError on the worker without it.
    from pathlib import Path
    pkg_root = str(Path(__file__).resolve().parents[1])
    builder = (
        SparkSession.builder
        .appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", aqe)
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
    # SPARK_GRAFT_PYFILES=<zip[,zip...]> switches executor imports
    # from the shared-filesystem PYTHONPATH mount to the shipped
    # artifact (deploy/package_pyfiles.sh) — the path a multi-node
    # cluster without a shared image uses. addPyFile distributes the
    # zip and prepends it to every executor Python worker's sys.path,
    # the same mechanism as spark-submit --py-files.
    pyfiles = os.environ.get("SPARK_GRAFT_PYFILES")
    if not is_local:
        builder = (builder
                   # Straggler mitigation: at fleet scale one slow
                   # disk/node per stage is the norm, not the
                   # exception; speculation re-launches the slowest
                   # tasks (quantile 0.75, multiplier 1.5 defaults)
                   # on other executors and takes the first finisher.
                   # Local mode skips it — every "straggler" there
                   # shares the same CPUs, so a copy only adds load.
                   .config("spark.speculation", "true")
                   # Standalone's 1g executor default is a trap: a
                   # 32-core executor runs 32 concurrent tasks in one
                   # 1 GiB heap and dies with exit 52 (JVM OOM) on
                   # the first wide shuffle (r13: the chaos probe hit
                   # exactly this). 4g fits every topology the repo's
                   # recipes boot (the 4g smoke worker exactly; the
                   # 24g bench worker with room to spare) — real
                   # deployments size via SPARK_GRAFT_EXECUTOR_MEM.
                   .config("spark.executor.memory",
                           os.environ.get("SPARK_GRAFT_EXECUTOR_MEM",
                                          "4g")))
        if not pyfiles:
            existing = os.environ.get("PYTHONPATH", "")
            builder = builder.config(
                "spark.executorEnv.PYTHONPATH",
                pkg_root + (os.pathsep + existing if existing else ""))
    spark = builder.getOrCreate()
    if pyfiles:
        # tolerate trailing commas / spaces in the env value — a
        # stray '' would crash addPyFile at every entrypoint
        for p in (s.strip() for s in pyfiles.split(",")):
            if p:
                spark.sparkContext.addPyFile(p)
    spark.sparkContext.setLogLevel("WARN")
    return spark
