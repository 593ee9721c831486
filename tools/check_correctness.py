"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at a given sf dir, then compares row count, column names, and
an order-insensitive value hash (values normalized: floats rounded,
timestamps stringified, rows sorted by their string form).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = []
    for rec in df.itertuples(index=False):
        row = []
        for v in rec:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{round(v, 6):.6f}")
            elif isinstance(v, pd.Timestamp):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from data_platform_copilot_spark.queries import (EXTRA_ORACLE,
                                                     register_oracle_udfs)

    if vanilla:
        # Harness-variance armor: the DRIVER runs queries() on ITS
        # session, not ours — a vanilla SparkSession (AQE on by
        # Spark default, no UTC pin, default parallelism, none of
        # session.py's tuning). Every entry must hash-match the
        # oracle here too, or it silently depends on our session
        # profile. (Only the nanos flag is set: without it Spark
        # REFUSES to read the testdata's TIMESTAMP(NANOS) parquet at
        # all — a capability, not a tuning choice.)
        # driver memory is provisioning, not tuning: the Spark
        # default 1g OOMs ~180 queries into a 244-query process and
        # every later call cascades (seen: OutOfMemoryError in a
        # shuffle write at stage ~3200). Everything SEMANTIC stays
        # at Spark defaults: AQE on, 200 shuffle partitions, no UTC
        # pin, no Arrow flag, no broadcast-threshold change.
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("correctness-check-vanilla")
                 .config("spark.driver.memory", "8g")
                 .config("spark.sql.legacy.parquet.nanosAsLong", "true")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
    else:
        from data_platform_copilot_spark.session import get_spark
        spark = get_spark("correctness-check")
    con = duckdb.connect()
    register_oracle_udfs(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    # UDF-dependent value oracles run here but never ship to the
    # driver's vanilla-SQL harness (queries/core.EXTRA_ORACLE).
    oracles = {**EXTRA_ORACLE, **entrymod.oracle_sql()}
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            s_rows, o_rows = normalize(sdf), normalize(odf)
            if s_rows != o_rows:
                diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    ran = len(only & set(queries)) if only else len(queries)
    print(f"\n{ran - len(failures)}/{ran} passed"
          + (f" (subset of {len(queries)}: {sorted(only)})" if only else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
