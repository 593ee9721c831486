"""Whale-proof gap sessionization: two-phase pre-sessionize + merge.

The classic one-window formulation (lag -> new-session flag -> running
sum, ``queries/timeseries.py:sessionization_gaps``) partitions by
``user_id`` alone, so ONE pathological user (a bot with 10^8 events)
serializes an entire window partition into a single task — AQE cannot
split a window partition (r13 verdict #1). This operator bounds the
per-task work by time-chunking:

Phase 1 (row level, bounded partitions): each row lands in
``(user, chunk)`` where ``chunk = floor(epoch(ts) / chunk_s)``; a
window over that pair assigns LOCAL session ids exactly as the
one-window plan would if the chunk were the whole history. The
largest window partition is now ``max events per user per chunk_s``
— tunable, independent of a user's total history.

Phase 2 (chunk level, tiny): one row per non-empty ``(user, chunk)``
(min/max ts + local session count). A window over ``user`` ordered by
chunk decides, from the PREVIOUS chunk's last timestamp, whether the
chunk's first local session continues the previous chunk's last
session (``gap <= gap_s`` — the boundary merge), and a running sum
assigns each chunk its global session-id offset. The phase-2 table is
|users| x |active chunks| rows — for the 10^8-event bot it is
``history_days`` rows, not 10^8.

Global ids: ``session_id = offset + local_sid - merge``. With
``merge = 1`` the chunk's local session 1 collapses onto the previous
chunk's last global session and every later local session shifts down
by one; chained multi-chunk sessions telescope through the running
sum. Result is IDENTICAL to the one-window formulation — session ids
are 1-based per user in time order — pinned by a hypothesis
equivalence test (tests/test_operators.py).

Cost model: two full-data shuffles (phase-1 keys, then the caller's
per-session aggregate) versus the one-window plan's single exchange —
the deliberate price of bounded task size; the phase-2 window and the
offsets join move only chunk-summary rows. Gap semantics use the same
floor-second epoch arithmetic as the one-window query, so results
match the DuckDB ``date_diff('second', ...)`` oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _epoch_s(c) -> F.Column:
    # same TIMESTAMP/TIMESTAMP_NTZ-robust epoch as queries/core.epoch_s
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp_ltz").cast("long")


def _key_chunk_struct(key_col: str, ts_col: str, chunk_s: int):
    """The ONE partition/group/join key for the two-phase window
    operators: ``struct(key, time-chunk)``. Complex-type equality in
    Spark treats NULL fields as EQUAL (``named_struct('k', NULL) =
    named_struct('k', NULL)`` is true), unlike scalar EqualTo, so
    windows, groupBy AND the carry join all see a NULL key (or a
    NULL timestamp) as an ordinary partition value — matching the
    one-window formulations, where partitionBy groups NULLs together
    instead of dropping them. Using the SAME struct expression for
    the phase-1 window and the summary join keeps the join a plain
    equi-join on the exchange Catalyst already planned for the
    window (an eqNullSafe join condition would rewrite the keys to
    coalesce/isnull pairs and force an extra full-data shuffle)."""
    return F.struct(F.col(key_col).alias("k"),
                    F.floor(_epoch_s(ts_col) / F.lit(chunk_s))
                    .alias("c"))


def two_phase_session_ids(df: DataFrame, user_col: str = "user_id",
                          ts_col: str = "ts", gap_s: int = 1800,
                          chunk_s: int = 86400) -> DataFrame:
    """All input columns + ``session_id`` (1-based per user, in time
    order), computed with no window partition wider than one
    ``(user, chunk_s)`` slice. ``chunk_s`` trades phase-1 partition
    width against phase-2 table size; the default (1 day) bounds a
    uniform-rate bot at rate*86400 rows per task."""
    rows = df.withColumn(
        "__kc", _key_chunk_struct(user_col, ts_col, chunk_s))

    w1 = W.partitionBy("__kc").orderBy(ts_col)
    w1run = w1.rowsBetween(W.unboundedPreceding, W.currentRow)
    rows = (
        rows
        .withColumn("__prev_ts", F.lag(ts_col).over(w1))
        .withColumn(
            "__new",
            (F.col("__prev_ts").isNull()
             | (_epoch_s(ts_col) - _epoch_s("__prev_ts") > gap_s))
            .cast("int"))
        .withColumn("__lsid", F.sum("__new").over(w1run))
        .drop("__prev_ts", "__new"))

    # phase 2: per-chunk summaries (groupBy reuses the phase-1
    # partitioning — Catalyst plans no extra exchange), then the tiny
    # per-user chunk walk
    ch = rows.groupBy("__kc").agg(
        F.min(ts_col).alias("__first"),
        F.max(ts_col).alias("__last"),
        F.max("__lsid").alias("__nloc"))
    w2 = W.partitionBy("__kc.k").orderBy("__kc.c")
    ch = (
        ch
        .withColumn("__prev_last", F.lag("__last").over(w2))
        .withColumn(
            "__merge",
            (F.col("__prev_last").isNotNull()
             & (_epoch_s("__first") - _epoch_s("__prev_last") <= gap_s))
            .cast("long"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum(F.col("__nloc") - F.col("__merge"))
                .over(w2.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0)))
        .select("__kc", "__merge", "__offset"))

    out = (rows.join(ch, ["__kc"])
           .withColumn("session_id",
                       F.col("__offset") + F.col("__lsid")
                       - F.col("__merge"))
           .drop("__kc", "__lsid", "__merge", "__offset"))
    return out
