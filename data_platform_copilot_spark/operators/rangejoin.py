"""Range join — value-to-interval matching (SURVEY.md §2.C: absent
from the reference; DuckDB executes it natively via IEJoin).

Two strategies:
- ``broadcast``: when the interval side is small (a banding dim),
  broadcast it and let Spark's BroadcastNestedLoopJoin evaluate the
  range predicate — no shuffle of the fact side at all.
- ``bucketize``: the scale path when BOTH sides are large. Intervals
  are exploded to the fixed-width buckets they overlap; facts map to
  their bucket; the join becomes an equi-join on bucket_id + a
  residual range filter. Shuffle keys are uniform by construction
  (bucket width controls fan-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(facts: DataFrame, value_col: str,
               intervals: DataFrame, lo_col: str, hi_col: str,
               method: str = "broadcast",
               bucket_width: float | None = None) -> DataFrame:
    """Rows of ``facts`` joined to every [lo, hi) interval containing
    ``value_col``. Output: facts columns + interval columns."""
    cond = ((F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col)))
    if method == "broadcast":
        return facts.join(F.broadcast(intervals), cond)

    if method != "bucketize":
        raise ValueError(f"unknown method: {method}")
    if bucket_width is None:
        raise ValueError("bucketize requires bucket_width")

    w = float(bucket_width)
    # explode each interval to the bucket ids it overlaps
    ib = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / w).cast("long"),
            F.floor((F.col(hi_col) - 1e-12) / w).cast("long"))))
    fb = facts.withColumn("__bucket",
                          F.floor(F.col(value_col) / w).cast("long"))
    return (fb.join(ib, "__bucket").where(cond).drop("__bucket"))
