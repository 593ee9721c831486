"""Whale-key probe for skew-prone window entries (r13 verdict #1).

Builds uniform/whale fixture pairs with IDENTICAL row counts, K x
sf0.1 (K id-shifted copies — the scaling_probe recipe):

- ``events``: whale = ~10% of rows remapped to user 0 (the bot-user
  shape for partitionBy(user_id) windows);
- ``customer``: whale = every even c_custkey remapped to the
  BUILDING market segment (~60% of rows in one segment — the
  few-huge-groups shape for partitionBy(c_mktsegment) windows);
- ``documents``: whale = ~90% of rows remapped to lang 'en' (the
  dominant-language shape for partitionBy(lang) windows).

Then times the listed registry entries warm on both fixtures and
prints per-entry JSON with the whale/uniform ratio. The one-window
plans serialize the whale into a single task (ratio grows with K);
the two-phase twins should hold ~flat — AQE cannot split a window
partition, so the twins are the only structural fix.

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
    "transition_matrix_two_phase",
    "ewma_value_per_user",
    "ewma_value_two_phase",
    "attribution_last_touch",
    "attribution_two_phase",
    "session_depth_histogram",
    "session_depth_two_phase",
    "window_rank_topk_per_group",
    "topk_per_group_two_phase",
    "window_distribution_funcs",
    "distribution_funcs_two_phase",
    "ccnet_perplexity_buckets",
    "ccnet_buckets_two_phase",
]


def _kcopies(spark, table: str, k: int, id_cols: list[str]):
    """K id-shifted copies of a sf0.1 table (disjoint id ranges)."""
    from pyspark.sql import functions as F
    src = spark.read.parquet(f"{BASE}/{table}.parquet")
    spans = {c: src.agg(F.max(c)).collect()[0][0] + 1 for c in id_cols}
    copies = []
    for c in range(k):
        cp = src
        for col, span in spans.items():
            cp = cp.withColumn(col, F.col(col) + c * span)
        copies.append(cp)
    full = copies[0]
    for cp in copies[1:]:
        full = full.unionByName(cp)
    return full


def build(spark, k: int, out: Path) -> None:
    from pyspark.sql import functions as F

    # events: ~10% of rows -> user 0, deterministically by event_id
    full = _kcopies(spark, "events", k, ["user_id", "event_id"]).cache()
    full.write.mode("overwrite").parquet(
        str(out / "uniform" / "events.parquet"))
    (full.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), 10) == 0, F.lit(0))
        .otherwise(F.col("user_id")))
     .write.mode("overwrite").parquet(
        str(out / "whale" / "events.parquet")))
    full.unpersist()

    # customer: every even custkey -> BUILDING (~60% one segment)
    cust = _kcopies(spark, "customer", k, ["c_custkey"]).cache()
    cust.write.mode("overwrite").parquet(
        str(out / "uniform" / "customer.parquet"))
    (cust.withColumn(
        "c_mktsegment",
        F.when(F.pmod(F.col("c_custkey"), 2) == 0, F.lit("BUILDING"))
        .otherwise(F.col("c_mktsegment")))
     .write.mode("overwrite").parquet(
        str(out / "whale" / "customer.parquet")))
    cust.unpersist()

    # documents: ~90% of rows -> lang 'en'
    docs = _kcopies(spark, "documents", k, ["doc_id"]).cache()
    docs.write.mode("overwrite").parquet(
        str(out / "uniform" / "documents.parquet"))
    (docs.withColumn(
        "lang",
        F.when(F.pmod(F.col("doc_id"), 10) < 9, F.lit("en"))
        .otherwise(F.col("lang")))
     .write.mode("overwrite").parquet(
        str(out / "whale" / "documents.parquet")))
    docs.unpersist()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    names = sys.argv[2:] or ENTRIES
    out = Path(f"/tmp/spark_graft_skew_k{k}")
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.session import get_spark
    spark = get_spark("skew-probe")
    if not all((out / "whale" / t).exists()
               for t in ("events.parquet", "customer.parquet",
                         "documents.parquet")):
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
