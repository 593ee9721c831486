"""Incremental aggregate maintenance — merge partial aggregate
STATES instead of recomputing from raw history.

The lakehouse pattern behind every "update the daily rollup when a
new partition lands" job: keep (n, sum, sumsq, min, max) per group
as the stored state, aggregate only the NEW data to the same state
shape, and merge states with pure algebra. At 100 TB the difference
is a full-history scan per refresh vs a delta-sized one; the merge
itself touches |groups| rows.

Correctness contract: every state component is a commutative monoid
(+, +, +, least, greatest), so merge(agg(A), agg(B)) == agg(A ∪ B)
exactly — which is what lets a plain full-recompute SQL oracle
value-verify the incremental path (``incremental_agg_maintenance``
registry entry). Derived statistics (mean, population std) come off
the merged state, never stored, so they are always consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "s", "ss", "mn", "mx")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Collapse raw rows to the mergeable per-group state
    (n, s, ss, mn, mx) over ``value_col`` (NULLs excluded, matching
    SQL aggregate semantics)."""
    v = F.col(value_col)
    return (df.where(v.isNotNull()).groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx")))


def merge_agg_states(stored: DataFrame, delta: DataFrame,
                     keys: list[str]) -> DataFrame:
    """Merge two state frames (full outer on the group keys — new
    groups appear, untouched groups pass through). Output has the
    same shape, so merges chain across any number of refreshes."""
    # string-qualified references ("a.col") rather than df["col"]:
    # stored and delta may share lineage (both derived from the same
    # scan), and dataframe-attribute references are ambiguous on a
    # lineage-shared self-join
    a, b = stored.alias("a"), delta.alias("b")
    cond = [F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys]
    z = F.lit(0)

    def col2(name):
        return F.col(f"a.{name}"), F.col(f"b.{name}")

    out_keys = [F.coalesce(*col2(k)).alias(k) for k in keys]
    sn, dn = col2("n")
    ss_, ds = col2("s")
    sss, dss = col2("ss")
    smn, dmn = col2("mn")
    smx, dmx = col2("mx")
    return a.join(b, cond, "full_outer").select(
        *out_keys,
        (F.coalesce(sn, z) + F.coalesce(dn, z)).alias("n"),
        (F.coalesce(ss_, z) + F.coalesce(ds, z)).alias("s"),
        (F.coalesce(sss, z) + F.coalesce(dss, z)).alias("ss"),
        F.least(smn, dmn).alias("mn"),
        F.greatest(smx, dmx).alias("mx"))


def state_report(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derived statistics off a state frame: count, sum, min, max,
    mean, population std (ddof=0, the engine's DQ convention)."""
    mean = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - mean * mean
    # floating-point cancellation can push a zero variance a hair
    # negative; clamp like every sufficient-statistics engine does
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return state.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("s").alias("total"),
        F.col("mn").alias("min_v"),
        F.col("mx").alias("max_v"),
        mean.alias("mean_v"),
        std.alias("std_v"))
