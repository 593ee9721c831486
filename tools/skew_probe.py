"""Whale-key probe for user-partitioned windows (r13 verdict #1).

Builds two K x sf0.1 events fixtures with IDENTICAL row counts:

- ``uniform``: K id-shifted copies of sf0.1 events (the scaling_probe
  recipe) — ~K*1500 users, ~67 rows each;
- ``whale``: the same rows with ~10% of them remapped to user 0 —
  one bot user owning a tenth of the corpus, the shape AQE cannot
  split for a window partition.

Then times every user-window registry entry warm on both fixtures and
prints per-entry JSON with the whale/uniform ratio. The one-window
sessionization serializes the whale into a single task (ratio >> 1);
the two-phase plan (operators/sessionize.py) should hold ~flat.

Usage: python tools/skew_probe.py [K] [entries...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BASE = "/root/testdata/sf0.1"

ENTRIES = [
    "sessionization_gaps",
    "sessionization_two_phase",
    "event_transition_matrix",
    "ewma_value_per_user",
    "ewma_value_two_phase",
    "attribution_last_touch",
    "attribution_two_phase",
    "session_depth_histogram",
    "session_depth_two_phase",
]


def build(spark, k: int, out: Path) -> None:
    from pyspark.sql import functions as F
    src = spark.read.parquet(f"{BASE}/events.parquet")
    n_users = src.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = src.agg(F.max("event_id")).collect()[0][0] + 1
    copies = []
    for c in range(k):
        copies.append(src.withColumn("user_id",
                                     F.col("user_id") + c * n_users)
                      .withColumn("event_id",
                                  F.col("event_id") + c * n_events))
    full = copies[0]
    for cp in copies[1:]:
        full = full.unionByName(cp)
    full = full.cache()
    full.write.mode("overwrite").parquet(
        str(out / "uniform" / "events.parquet"))
    # ~10% of rows -> user 0, deterministically by event_id
    whale = full.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), 10) == 0, F.lit(0))
        .otherwise(F.col("user_id")))
    whale.write.mode("overwrite").parquet(
        str(out / "whale" / "events.parquet"))
    full.unpersist()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    names = sys.argv[2:] or ENTRIES
    out = Path(f"/tmp/spark_graft_skew_k{k}")
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.session import get_spark
    spark = get_spark("skew-probe")
    if not (out / "whale" / "events.parquet").exists():
        build(spark, k, out)
    rows = spark.read.parquet(
        str(out / "whale" / "events.parquet"))
    top = (rows.groupBy("user_id").count()
           .orderBy("count", ascending=False).first())
    total = rows.count()
    print(json.dumps({"k": k, "rows": total,
                      "whale_user": top["user_id"],
                      "whale_rows": top["count"],
                      "whale_share": round(top["count"] / total, 4)}),
          flush=True)
    for name in names:
        q = QUERIES[name]
        t = {}
        for variant in ("uniform", "whale"):
            sf_dir = str(out / variant)
            q(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()  # warm
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                runs.append(time.perf_counter() - t0)
            t[variant] = min(runs)
        print(json.dumps({
            "entry": name,
            "uniform_s": round(t["uniform"], 3),
            "whale_s": round(t["whale"], 3),
            "ratio": round(t["whale"] / t["uniform"], 2)}), flush=True)


if __name__ == "__main__":
    main()
