"""Per-GB decomposition of the Python-DataSource read tax (r13
verdict #4).

The r13 BASELINE records format("versioned") reading warm in ~0.74 s
vs ~0.2-0.38 s native at sf0.1 — but at that size the reading is
fixed-overhead-dominated (session, plan, Python worker spin-up), so
it says nothing about the ASYMPTOTIC tax a 100 TB scan would pay.
This probe separates the two: build the same versioned table at
K in {1, 10, 30} x 1M rows (constant ~24 MB dirs, like a real ingest
log), time warm full scans through both read paths, then fit
t = fixed + marginal * K by least squares. ``marginal`` is the
per-unit (per-GB) cost that survives scale-up; ``fixed`` is the
constant both paths amortize to zero.

Read paths:
- native: read_version() — JVM parquet scan over the manifest's dirs;
- datasource: spark.read.format("versioned") — the Python batch
  DataSource (Catalyst pushFilters, Arrow batches through a Python
  worker).

Scan = full-frame noop write (all columns pulled through the reader).

Usage: python tools/ds_throughput_probe.py [ks...]  (default 1 10 30)
Prints one JSON line per (path, K) and a summary line with the fitted
fixed/marginal costs, marginal MB/s per path, and the per-GB tax
ratio (datasource marginal / native marginal).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WIDTH = 1_000_000  # rows per K unit == rows per data dir


def build(spark, root: Path, k: int) -> None:
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources import versioned as V
    for i in range(k):
        df = (spark.range(i * WIDTH, (i + 1) * WIDTH)
              .select(F.col("id"),
                      (F.col("id") % 997).alias("v"),
                      (F.col("id") * 0.5).cast("double").alias("x"),
                      F.md5(F.col("id").cast("string"))
                      .substr(1, 16).alias("s")))
        V.write_version(df, root, "append" if i else "overwrite")


def data_mb(root: Path) -> float:
    return sum(f.stat().st_size
               for d in root.glob("data-*")
               for f in d.rglob("*.parquet")) / 1e6


def warm_scan_s(make, runs: int = 3) -> float:
    make().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        make().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def fit(ks: list[int], ts: list[float]) -> tuple[float, float]:
    """Least-squares t = fixed + marginal * k."""
    n = len(ks)
    mk = sum(ks) / n
    mt = sum(ts) / n
    m = (sum((k - mk) * (t - mt) for k, t in zip(ks, ts))
         / sum((k - mk) ** 2 for k in ks))
    return mt - m * mk, m


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    import tempfile

    from data_platform_copilot_spark.session import get_spark
    from data_platform_copilot_spark.sources import versioned as V
    from data_platform_copilot_spark.sources.batch_source import (
        register_batch_source)

    spark = get_spark("ds-throughput-probe")
    register_batch_source(spark)
    base = Path(tempfile.mkdtemp(prefix="ds_throughput_"))
    times: dict[str, list[float]] = {"native": [], "datasource": []}
    mbs: list[float] = []
    for k in ks:
        root = base / f"k{k}"
        build(spark, root, k)
        mb = data_mb(root)
        mbs.append(mb)
        native = lambda: V.read_version(spark, root)     # noqa: E731
        dsrc = lambda: (spark.read.format("versioned")   # noqa: E731
                        .option("path", str(root)).load())
        n_rows = native().count()
        assert n_rows == k * WIDTH and dsrc().count() == n_rows
        for name, fn in (("native", native), ("datasource", dsrc)):
            t = warm_scan_s(fn)
            times[name].append(t)
            print(json.dumps({"path": name, "k": k,
                              "rows": k * WIDTH,
                              "data_mb": round(mb, 1),
                              "warm_scan_s": round(t, 3)}), flush=True)
    if len(set(ks)) < 2:
        print(json.dumps({"note": "need >= 2 distinct Ks for the "
                                  "fixed/marginal fit; per-K lines "
                                  "above are still valid"}))
        return
    mb_per_k = (mbs[-1] - mbs[0]) / (ks[-1] - ks[0])
    summary = {"mb_per_k": round(mb_per_k, 1)}
    marg = {}
    for name in ("native", "datasource"):
        fixed, m = fit(ks, times[name])
        marg[name] = m
        summary[name] = {
            "fixed_s": round(fixed, 3),
            "marginal_s_per_k": round(m, 4),
            "marginal_mb_s": round(mb_per_k / m, 1),
            "marginal_gb_s_extrapolated": round(mb_per_k / m / 1000, 3),
        }
    summary["per_gb_tax_ratio"] = round(
        marg["datasource"] / marg["native"], 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
