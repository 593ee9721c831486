"""As-of join — Spark lacks a native one (SURVEY.md §2.C).

Union-tag-window implementation: interleave both sides on the time
axis per key, carry the most recent right-side payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window,
then keep only left rows. Semantics match DuckDB's
``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts`` (backward
direction, equality included — right rows sort before left rows at
identical timestamps).

Scale: ONE shuffle on the key (the window partition). This beats the
pd.merge_asof-in-applyInPandas alternative (which materializes each
group in Python memory) and the bucketize+equi-join trick (which
needs a second pass for lookbacks crossing bucket boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame,
                       by: str, left_ts: str, right_ts: str,
                       right_cols: list[str]) -> DataFrame:
    """Left rows + most recent right row (right_ts <= left_ts) per key.

    ``right_cols`` are the right-side payload columns to carry; they
    are emitted with their own names (must not clash with left's).
    """
    l_tagged = left.withColumn("__ts", F.col(left_ts)) \
                   .withColumn("__side", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(
            dict(right.dtypes)[c]))
    r_tagged = (right
                .withColumn("__ts", F.col(right_ts))
                .withColumn("__side", F.lit(0)))
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(
                dict(left.dtypes)[c]))

    cols = [by, "__ts", "__side", *right_cols,
            *[c for c in left.columns if c not in {by, *right_cols}]]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    w = (W.partitionBy(by).orderBy("__ts", "__side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            c, F.last(F.when(F.col("__side") == 0, F.col(c)), True).over(w))
    return (carried.where(F.col("__side") == 1)
            .drop("__ts", "__side"))
