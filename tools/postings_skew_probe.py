"""Skewed-postings probe for the prefix-filter similarity join
(OPTIMIZATION_r14.md "Not yet optimized" #1).

`dedup_prefix_filter_pairs` sorts each document's postings in a
per-id window (rarity rank) and carries each set as one
`collect_list` array through the verify. Uniform corpora measure the
window as noise; this probe builds the two data-dependent shapes
that could change that and times the DECLARED entry on each:

- ``whaledoc``: one document owns the concatenated text of W
  ordinary documents (~W x 43 shingles in ONE id) while the W donor
  rows keep unique stub texts — same row count, roughly the same
  posting volume. Stresses the single window task, the whale's
  collect_list array, and the candidate fan-out of a huge prefix.
- ``hotshingle``: every document's text is prefixed with the same
  three tokens, so one shingle appears in EVERY document. Rarest-
  first prefixing keeps it out of the candidate join; what it
  stresses is the df-lookup join (`sh.join(freq, "shingle")`), where
  the hot key's postings land in one shuffle task.

Fixtures are K caesar-shifted copies of sf0.1 documents (per-copy
letter rotation keeps shingle universes DISJOINT across copies —
id-shifted copies alone would make every cross-copy doc pair a
Jaccard-1.0 duplicate and blow up the pair output quadratically).

Usage: python tools/postings_skew_probe.py [K] [W]
"""

from __future__ import annotations

import json
import string
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BASE = "/root/testdata/sf0.1"
ENTRY = "dedup_prefix_filter_pairs"


def _caesar_copies(spark, k: int):
    """K doc_id-shifted, letter-rotated copies of documents."""
    from pyspark.sql import functions as F
    src = spark.read.parquet(f"{BASE}/documents.parquet")
    span = src.agg(F.max("doc_id")).collect()[0][0] + 1
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    copies = []
    for c in range(k):
        rot = c % 26
        cp = (src.withColumn("doc_id", F.col("doc_id") + c * span)
              .withColumn("text", F.translate(
                  "text",
                  lower + upper,
                  lower[rot:] + lower[:rot] + upper[rot:] + upper[:rot])))
        copies.append(cp)
    full = copies[0]
    for cp in copies[1:]:
        full = full.unionByName(cp)
    return full


def build(spark, k: int, w: int, out: Path) -> None:
    from pyspark.sql import functions as F

    full = _caesar_copies(spark, k).cache()
    full.write.mode("overwrite").parquet(
        str(out / "uniform" / "documents.parquet"))

    # whaledoc: docs 1..W donate their text to doc 0 (copy 0 only);
    # donors keep unique stubs so they form no pairs of their own.
    donors = (full.where(F.col("doc_id").between(0, w - 1))
              .coalesce(1).sortWithinPartitions("doc_id")
              .agg(F.concat_ws(" ", F.collect_list("text"))
                   .alias("whale_text")))
    (full.crossJoin(F.broadcast(donors))
     .withColumn(
         "text",
         F.when(F.col("doc_id") == 0, F.col("whale_text"))
         .when(F.col("doc_id").between(1, w - 1),
               F.concat_ws(" ", F.lit("stub"),
                           F.col("doc_id").cast("string")))
         .otherwise(F.col("text")))
     .drop("whale_text")
     .write.mode("overwrite").parquet(
        str(out / "whaledoc" / "documents.parquet")))

    # hotshingle: one 3-gram shared by every document.
    (full.withColumn("text", F.concat(F.lit("zzq zzw zze "), F.col("text")))
     .write.mode("overwrite").parquet(
        str(out / "hotshingle" / "documents.parquet")))
    full.unpersist()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    out = Path(f"/tmp/spark_graft_postings_k{k}_w{w}")
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.session import get_spark
    spark = get_spark("postings-skew-probe")
    variants = ("uniform", "whaledoc", "hotshingle")
    if not all((out / v / "documents.parquet").exists() for v in variants):
        build(spark, k, w, out)

    from pyspark.sql import functions as F
    from data_platform_copilot_spark.operators.dedup import shingles
    q = QUERIES[ENTRY]
    report = {"k": k, "w": w}
    for v in variants:
        sh = shingles(spark.read.parquet(str(out / v / "documents.parquet")),
                      "doc_id", "text", n=3)
        top = (sh.groupBy("id").count()
               .agg(F.max("count"), F.count(F.lit(1)), F.sum("count"))
               .collect()[0])
        report[v] = {"max_set": top[0], "docs": top[1], "postings": top[2]}
    print(json.dumps(report), flush=True)

    pairs = {}
    for v in variants:  # warm + output sanity
        pairs[v] = q(spark, str(out / v)).count()
    # interleaved rounds: box drift hits every variant equally
    runs: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(5):
        for v in variants:
            spark.sparkContext.setJobDescription(f"postings-skew {v}")
            t0 = time.perf_counter()
            q(spark, str(out / v)).write.format("noop").mode(
                "overwrite").save()
            runs[v].append(time.perf_counter() - t0)
    for v in variants:
        print(json.dumps({"variant": v, "pairs": pairs[v],
                          "min_s": round(min(runs[v]), 3),
                          "runs": [round(r, 3) for r in runs[v]]}),
              flush=True)


if __name__ == "__main__":
    main()
