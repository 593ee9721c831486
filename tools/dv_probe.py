"""Deletion-vector (merge-on-read) vs copy-on-write measurement.

Builds a date-partitioned versioned table from the events table at
the given sf dir (the r9 partition-scoped-merge setup), applies the
same small upsert batch under both strategies, and reports:

- bytes written by the merge (write amplification), CoW vs MoR;
- full-scan read latency on the clean table, after the CoW merge,
  after 1 and 5 stacked MoR vectors, and after compact() folds them
  (read amplification).

Usage: python tools/dv_probe.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def dir_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def table_bytes(root: Path) -> int:
    return sum(dir_bytes(d) for d in root.glob("data-*")) + \
        sum(dir_bytes(d) for d in root.glob("delete-*"))


def scan_time(spark, root, runs: int = 3) -> float:
    from data_platform_copilot_spark.sources.versioned import read_version
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        read_version(spark, root).groupBy().agg(
            {"value": "sum", "event_id": "count"}).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.session import get_spark
    from data_platform_copilot_spark.sources.registry import load_table
    from data_platform_copilot_spark.sources.versioned import (
        compact, merge_version, write_version)

    spark = get_spark("dv-probe")
    ev = (load_table(spark, sf_dir, "events")
          .withColumn("day", F.to_date("ts").cast("string")))
    base = tempfile.mkdtemp(prefix="dv_probe_")
    results: dict[str, dict] = {}
    try:
        for strategy in ("cow", "mor"):
            root = Path(base) / strategy
            write_version(ev, root, partition_by=["day"])
            v0_bytes = table_bytes(root)
            t_clean = scan_time(spark, root)
            one_day = ev.select("day").orderBy("day").limit(1).collect()[0][0]
            updates = (ev.where(F.col("day") == one_day).limit(200)
                       .withColumn("value", F.col("value") * 0 + 1.0))
            before = table_bytes(root)
            t0 = time.perf_counter()
            merge_version(spark, root, updates, "event_id",
                          strategy=strategy)
            merge_s = time.perf_counter() - t0
            written = table_bytes(root) - before
            t_after1 = scan_time(spark, root)
            rec = {"table_bytes": v0_bytes, "merge_bytes": written,
                   "merge_pct": 100.0 * written / v0_bytes,
                   "merge_s": merge_s, "scan_clean_s": t_clean,
                   "scan_after_1_s": t_after1}
            if strategy == "mor":
                for _ in range(4):  # stack to 5 vectors total
                    merge_version(spark, root, updates, "event_id",
                                  strategy="mor")
                rec["scan_after_5_s"] = scan_time(spark, root)
                compact(spark, root)
                rec["scan_after_compact_s"] = scan_time(spark, root)
            results[strategy] = rec
        for s, r in results.items():
            print(s, {k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in r.items()})
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
