"""Concurrent-workload probe: N headline queries submitted at once
from N driver threads against the shared SparkSession vs the same
set run sequentially. A single short query cannot saturate 32 cores
(stage barriers + small shuffles leave slots idle), so a healthy
scheduler should overlap independent queries and the wall-clock
ratio sequential/concurrent should land well above 1 — the
multi-tenant story a warehouse engine needs beyond single-query
latency. Jobs interleave under local-mode FIFO because each stage
only holds the slots it can use; a production cluster would add
spark.scheduler.mode=FAIR pools per tenant (see deploy/).

Usage: python tools/concurrency_probe.py [sf_dir] [n_threads]
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_platform_copilot_spark.queries import QUERIES  # noqa: E402
from data_platform_copilot_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_revenue_by_nation", "multi_join_topk",
    "cohort_retention_weekly", "tpch_q1_pricing_summary",
    "window_rank_topk_per_group", "dq_profile_events_value",
    "text_quality_score", "sessionization_gaps",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else len(HEADLINE)
    spark = get_spark("concurrency_probe")
    names = (HEADLINE * ((n + len(HEADLINE) - 1) // len(HEADLINE)))[:n]

    def run(name: str) -> None:
        (QUERIES[name](spark, sf_dir)
         .write.format("noop").mode("overwrite").save())

    for name in set(names):  # warm: plans compiled, files listed
        run(name)

    t0 = time.time()
    for name in names:
        run(name)
    seq = time.time() - t0

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=n) as ex:
        list(ex.map(run, names))
    conc = time.time() - t0

    print(f"queries={n} sequential={seq:.3f}s concurrent={conc:.3f}s "
          f"overlap_speedup={seq / conc:.2f}x")


if __name__ == "__main__":
    main()
