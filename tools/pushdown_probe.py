"""Auto-pushdown probe at x10 (r11, extended r12): the r10 zone-map
probe shape — a 1M-row, 24-append ingest log — driven through every
pruning entry point. Measures dirs scanned + warm time for (a)
pre-r11 behavior (no manifest pruning), (b) manual ``skip=``, (c)
plain ``.where`` via the r11 auto-derivation, and — r12 — (d) a
projection CHAIN (``select().where()``, verdict item 2) and (e) the
SQL SURFACE through the gateway rewrite (registered table + WHERE,
verdict item 1). Checks all five return identical rows and that
d/e scan the same pruned dir set as the manual skip list.

Usage: python tools/pushdown_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def dirs_of(df) -> int:
    return len({f.split("/data-")[1].split("/")[0]
                for f in df.inputFiles()})


def warm_time(make, runs: int = 5) -> float:
    make().collect()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        make().collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.session import get_spark
    from data_platform_copilot_spark.sources import versioned as V

    spark = get_spark("pushdown-probe")
    import tempfile
    tdir = Path(tempfile.mkdtemp(prefix="pushdown_probe_")) / "log"
    n, appends = 1_000_000, 24
    width = n // appends
    for i in range(appends):
        df = (spark.range(i * width, (i + 1) * width)
              .select(F.col("id"),
                      (F.col("id") % 7).alias("v"),
                      (F.col("id") * 3).alias("x")))
        V.write_version(df, tdir, "append" if i else "overwrite")
    lo = (appends - 1) * width  # one-dir tail predicate
    pred = [("id", ">=", lo)]

    from data_platform_copilot_spark.gateway.time_travel import (
        register_versioned_table, rewrite_as_of)
    register_versioned_table(spark, "probe_log", tdir)

    unpruned = lambda: V._read_version_at(          # noqa: E731
        spark, tdir, V.latest_version(tdir), None) \
        .where(F.col("id") >= lo)
    manual = lambda: V.read_version(spark, tdir, skip=pred)  # noqa: E731
    auto = lambda: V.read_version(spark, tdir) \
        .where(F.col("id") >= lo)                    # noqa: E731
    chained = lambda: V.read_version(spark, tdir) \
        .select("id", "x").where(F.col("id") >= lo) \
        .select("id")                                # noqa: E731
    sql_stmt = f"SELECT id FROM probe_log WHERE id >= {lo}"
    surface = lambda: spark.sql(                     # noqa: E731
        rewrite_as_of(spark, sql_stmt))

    paths = (("unpruned", unpruned), ("manual", manual),
             ("auto", auto), ("chained", chained),
             ("sql_surface", surface))
    rows = {k: sorted(r["id"] for r in fn().collect())
            for k, fn in paths}
    assert all(v == rows["unpruned"] for v in rows.values())
    assert len(rows["auto"]) == width
    print(f"rows: {width} identical across all five paths")
    for k, fn in paths:
        print(f"{k:11s} dirs={dirs_of(fn()):2d} "
              f"warm={warm_time(fn):.3f}s")
    assert dirs_of(chained()) == dirs_of(manual())
    assert dirs_of(surface()) == dirs_of(manual())

    # r13 path (f): the batch Python DataSource — Catalyst pushes the
    # filter into pushFilters; pruning is proven at the reader level
    # (a Python DS scan exposes no inputFiles) plus row identity and
    # warm timing end to end.
    from pyspark.sql.datasource import GreaterThanOrEqual

    from data_platform_copilot_spark.sources.batch_source import (
        VersionedBatchReader, register_batch_source)
    register_batch_source(spark)
    dsrc = lambda: (spark.read.format("versioned")       # noqa: E731
                    .option("path", str(tdir)).load()
                    .where(F.col("id") >= lo).select("id"))
    assert sorted(r["id"] for r in dsrc().collect()) == rows["unpruned"]
    rdr = VersionedBatchReader(None, {"path": str(tdir)})
    list(rdr.pushFilters([GreaterThanOrEqual(("id",), lo)]))
    planned = {Path(s.path).parent.name for s in rdr.plan_files()}
    print(f"datasource  dirs={len(planned):2d} "
          f"warm={warm_time(dsrc):.3f}s (reader-planned dirs)")
    assert len(planned) == dirs_of(manual())


if __name__ == "__main__":
    main()
