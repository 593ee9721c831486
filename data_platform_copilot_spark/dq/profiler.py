"""A6 — column profiler (reference src/dq.py:39-79).

Per column: dtype / count / nulls / distinct; numeric columns add
min/max/mean/std(population)/p50/p95; timestamp columns add min/max
ISO strings; string columns add length min/max/p95; every column
adds a top-5 value histogram.

Spark-first shape: ALL scalar statistics for ALL columns compute in
ONE ``df.agg(...)`` pass (a single scan + partial aggregation), not
a per-column loop like the pandas reference. Top-5 histograms batch
into one stacked job per distinct column TYPE (explode to
(column, value) rows -> one groupBy + per-column window top-k), so
the job count is bounded by the handful of types in any schema, not
the column count — at 100 columns x 100 TB the per-column-loop
formulation would be 100 full scans. Map-side partial aggregation
means the stacked shuffle still carries only distinct (column,
value) pairs.

``exact=False`` switches distinct counts to HyperLogLog++ and
percentiles to percentile_approx — the 100 TB configuration.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def _is_timestamp(dt: T.DataType) -> bool:
    return isinstance(dt, (T.TimestampType, T.DateType))


def profile_df(df: DataFrame, max_top: int = 5,
               exact: bool = True) -> dict[str, dict[str, Any]]:
    """Profile every column of ``df`` (reference profile_df parity)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for field in df.schema.fields:
        c, name = F.col(field.name), field.name
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{name}__nulls"))
        if exact:
            aggs.append(F.countDistinct(c).alias(f"{name}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"{name}__distinct"))
        if _is_numeric(field.dataType):
            aggs += [
                F.min(c).alias(f"{name}__min"),
                F.max(c).alias(f"{name}__max"),
                F.mean(c).alias(f"{name}__mean"),
                F.stddev_pop(c).alias(f"{name}__std"),  # ddof=0, reference src/dq.py:55
            ]
            if exact:
                aggs.append(F.expr(
                    f"percentile({name}, array(0.5, 0.95))").alias(f"{name}__pcts"))
            else:
                aggs.append(F.percentile_approx(
                    c, [0.5, 0.95], 10000).alias(f"{name}__pcts"))
        elif _is_timestamp(field.dataType):
            aggs += [F.min(c).alias(f"{name}__min"), F.max(c).alias(f"{name}__max")]
        elif isinstance(field.dataType, T.StringType):
            ln = F.length(c)
            aggs += [
                F.min(ln).alias(f"{name}__len_min"),
                F.max(ln).alias(f"{name}__len_max"),
            ]
            if exact:
                aggs.append(F.expr(
                    f"percentile(length({name}), 0.95)").alias(f"{name}__len_p95"))
            else:
                aggs.append(F.percentile_approx(
                    ln, 0.95, 10000).alias(f"{name}__len_p95"))

    stats = df.agg(*aggs).collect()[0].asDict()
    total = stats["__total"]

    out: dict[str, dict[str, Any]] = {}
    for field in df.schema.fields:
        name = field.name
        col_prof: dict[str, Any] = {
            "dtype": field.dataType.simpleString(),
            "count": total,
            "nulls": int(stats[f"{name}__nulls"] or 0),
            "distinct": int(stats[f"{name}__distinct"] or 0),
        }
        if _is_numeric(field.dataType):
            pcts = stats.get(f"{name}__pcts") or [None, None]
            col_prof.update({
                "min": stats.get(f"{name}__min"),
                "max": stats.get(f"{name}__max"),
                "mean": stats.get(f"{name}__mean"),
                "std": stats.get(f"{name}__std"),
                "p50": pcts[0],
                "p95": pcts[1],
            })
        elif _is_timestamp(field.dataType):
            mn, mx = stats.get(f"{name}__min"), stats.get(f"{name}__max")
            col_prof.update({
                "min": mn.isoformat() if mn is not None else None,
                "max": mx.isoformat() if mx is not None else None,
            })
        elif isinstance(field.dataType, T.StringType):
            col_prof.update({
                "len_min": stats.get(f"{name}__len_min"),
                "len_max": stats.get(f"{name}__len_max"),
                "len_p95": stats.get(f"{name}__len_p95"),
            })
        out[name] = col_prof

    # Top-k histograms: deterministic tie-break on the value itself.
    # One stacked job per distinct column type (same-typed columns
    # share an exploded (column, value) frame — heterogeneous types
    # can't share one array, but the type count is O(1) for any
    # schema width).
    from collections import defaultdict

    from pyspark.sql import Window as W

    by_type: dict[str, list[str]] = defaultdict(list)
    for field in df.schema.fields:
        by_type[field.dataType.simpleString()].append(field.name)

    for names in by_type.values():
        stacked = df.select(F.explode(F.array(*[
            F.struct(F.lit(n).alias("__col"), F.col(n).alias("__val"))
            for n in names])).alias("s")).select("s.__col", "s.__val")
        w = (W.partitionBy("__col")
             .orderBy(F.desc("__cnt"), F.col("__val").cast("string")))
        top = (stacked.where(F.col("__val").isNotNull())
               .groupBy("__col", "__val").agg(F.count("*").alias("__cnt"))
               .withColumn("__rk", F.row_number().over(w))
               .where(F.col("__rk") <= max_top)
               .collect())
        for n in names:
            out[n]["top_values"] = []
        for r in sorted(top, key=lambda r: (r["__col"], r["__rk"])):
            out[r["__col"]]["top_values"].append(
                {"value": r["__val"], "count": r["__cnt"]})
    return out
