"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": "..."}

Each query is executed with the noop sink (full compute, no driver
materialization cost) after a small warmup that absorbs JVM/codegen
startup. BENCH_QUERIES is the headline subset — heavy-shuffle and
operator-representative entries, not the whole pack.
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
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "sessionization_gaps",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.session import get_spark

    spark = get_spark("bench")

    # Warmup: touch every table + run the flagship once (JIT/codegen).
    from data_platform_copilot_spark.sources import TESTDATA_TABLES, load_table
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    QUERIES["flagship_revenue_by_nation"](spark, sf_dir).collect()

    names = [n for n in BENCH_QUERIES if n in QUERIES]
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
