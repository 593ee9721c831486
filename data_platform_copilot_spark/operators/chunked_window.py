"""Whale-proof chunked windows: bounded trailing frames and the
exclusive running last-non-null, each = chunk-local window + a carry
computed over the tiny per-(key, chunk) summary table.

``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` over
``partitionBy(user)`` serializes a whale user into one task exactly
like gap sessionization does (tools/skew_probe.py measured the EWMA
entry at 28x under a 10%-of-corpus bot user — the worst of the
user-window registry entries). Unlike sessionization, a bounded frame
needs no global pass at all — the fix is local:

1. chunk rows by time (``floor(epoch(ts)/chunk_s)``) and collect each
   row's LOCAL trailing window inside the bounded ``(user, chunk)``
   partition;
2. per chunk, keep its TAIL — the last ``k-1`` values (what any later
   row could still need);
3. the carry for chunk c is the last ``k-1`` values before it, and
   those live within the previous ``k-1`` NON-EMPTY chunks (each
   non-empty chunk contributes at least one value), so a window over
   the tiny per-(user, chunk) summary table with a BOUNDED
   ``rowsBetween(-(k-1), -1)`` frame — flatten + keep-last — computes
   it; nothing unbounded anywhere;
4. join the carry back and take the last ``k`` of
   ``carry ++ local_window`` per row.

Every step is a JVM expression (no Python stage); the widest window
partition is one ``(user, chunk_s)`` slice. Results are identical to
the one-window ``collect_list().over(rowsBetween(-(k-1), 0))`` —
pinned by fuzz equivalence tests (tests/test_operators.py).

Cost: one full-data shuffle on (user, chunk) + the summary-table
window + a join, versus the one-window plan's single exchange — the
same insurance trade as operators/sessionize.py; prefer the plain
window until one key can dwarf a task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .sessionize import _key_chunk_struct


def _last(arr: Column, n: int) -> Column:
    """Last ``n`` elements (whole array when shorter). n >= 1."""
    return F.when(F.size(arr) <= n, arr).otherwise(F.slice(arr, -n, n))


def last_ignorenulls_chunked(df: DataFrame, key_col: str, ts_col: str,
                             order_cols: list[str], value_col: str,
                             out_col: str = "prev",
                             chunk_s: int = 86400) -> DataFrame:
    """All input columns + ``out_col`` = the last non-null
    ``value_col`` STRICTLY BEFORE the current row per ``key_col`` in
    ``order_cols`` order — exactly
    ``last(value, ignorenulls=True).over(partitionBy(key)
    .orderBy(*order).rowsBetween(unboundedPreceding, -1))`` with no
    FULL-DATA window partition wider than one ``(key, chunk_s)``
    slice.

    The unbounded carry moves to the per-(key, chunk) SUMMARY table:
    a chunk's carry is the newest non-null value in any earlier
    chunk, and the summary has one row per occupied chunk — bounded
    by time span / chunk_s, independent of row volume, so a whale
    key bloats the bounded local windows (parallel) but never a
    single task. ``order_cols`` must be non-null and totally order
    rows within a key (both formulations are nondeterministic
    otherwise); ``ts_col`` (the chunking clock) must lead them.

    ``value_col`` may be a struct — the carried value is whatever
    the caller packs, so one pass can carry several attributes of
    the same qualifying row (see attribution_two_phase in
    queries/timeseries.py)."""
    if order_cols[0] != ts_col:
        raise ValueError("ts_col must lead order_cols (chunking and "
                         "ordering must agree)")
    rows = df.withColumn(
        "__kc", _key_chunk_struct(key_col, ts_col, chunk_s))

    # local pass: exclusive running last within the bounded
    # (key, chunk) partition
    w_local = (W.partitionBy("__kc").orderBy(*order_cols)
               .rowsBetween(W.unboundedPreceding, -1))
    rows = rows.withColumn(
        "__local", F.last(value_col, ignorenulls=True).over(w_local))

    # per-chunk summary: the chunk's newest non-null value = max of
    # (order..., value) structs over non-null-value rows (order_cols
    # are non-null and total, so the struct max is the last row)
    tagged = F.when(F.col(value_col).isNotNull(),
                    F.struct(*order_cols, F.col(value_col).alias("__v")))
    ch = (rows.groupBy("__kc")
          .agg(F.max(tagged)["__v"].alias("__chunk_last")))
    # carry: newest non-null chunk_last over all EARLIER chunks —
    # unbounded, but over the tiny summary table
    w_carry = (W.partitionBy("__kc.k").orderBy("__kc.c")
               .rowsBetween(W.unboundedPreceding, -1))
    ch = ch.select("__kc",
                   F.last("__chunk_last", ignorenulls=True)
                   .over(w_carry).alias("__carry"))

    return (rows.join(ch, ["__kc"])
            .withColumn(out_col, F.coalesce("__local", "__carry"))
            .drop("__kc", "__local", "__carry"))


def lead_chunked(df: DataFrame, key_col: str, ts_col: str,
                 order_cols: list[str], value_col: str,
                 out_col: str = "next", chunk_s: int = 86400) -> DataFrame:
    """All input columns + ``out_col`` = the NEXT row's ``value_col``
    per ``key_col`` in ``order_cols`` order — exactly
    ``lead(value).over(partitionBy(key).orderBy(*order))`` with no
    full-data window partition wider than one ``(key, chunk_s)``
    slice.

    The offset function needs exactly ONE row of cross-chunk state:
    a chunk's last row leads into the FIRST row of the key's next
    occupied chunk. So the carry table is one row per occupied
    chunk — ``min`` of the ``(order..., value)`` structs — and the
    chunk walk is a plain ``lead`` over that tiny summary, bounded
    by time span / chunk_s regardless of row volume.

    Row presence and value NULLs stay separate (the one-window
    ``lead`` returns NULL only past the partition's end, not when
    the next VALUE is NULL): every intermediate carries a struct —
    never a bare value — and ``__v`` is extracted only after the
    struct-level coalesce. ``order_cols`` must be non-null and
    totally order rows within a key (both formulations are
    nondeterministic otherwise); ``ts_col`` (the chunking clock)
    must lead them."""
    if order_cols[0] != ts_col:
        raise ValueError("ts_col must lead order_cols (chunking and "
                         "ordering must agree)")
    rows = df.withColumn(
        "__kc", _key_chunk_struct(key_col, ts_col, chunk_s))

    wrapped = F.struct(F.col(value_col).alias("__v"))
    w_local = W.partitionBy("__kc").orderBy(*order_cols)
    rows = rows.withColumn("__local", F.lead(wrapped).over(w_local))

    # per-chunk summary: the chunk's FIRST row's value = min of the
    # (order..., wrapped) structs (order_cols non-null and total, so
    # the struct min is the first row); the carry for chunk c is the
    # next occupied chunk's first value — lead over the summary
    ch = (rows.groupBy("__kc")
          .agg(F.min(F.struct(*order_cols, wrapped.alias("__w")))["__w"]
               .alias("__chunk_first")))
    w_walk = W.partitionBy("__kc.k").orderBy("__kc.c")
    ch = ch.select("__kc",
                   F.lead("__chunk_first").over(w_walk).alias("__carry"))

    return (rows.join(ch, ["__kc"])
            .withColumn(out_col, F.coalesce("__local", "__carry")["__v"])
            .drop("__kc", "__local", "__carry"))


def trailing_values_chunked(df: DataFrame, key_col: str, ts_col: str,
                            order_cols: list[str], value_col: str,
                            k: int, chunk_s: int = 86400,
                            out_col: str = "win") -> DataFrame:
    """All input columns + ``out_col`` = array of the last ``<= k``
    ``value_col`` values per ``key_col`` in ``order_cols`` order
    (current row inclusive) — exactly
    ``collect_list(value).over(partitionBy(key).orderBy(*order)
    .rowsBetween(-(k-1), 0))`` with no window partition wider than one
    ``(key, chunk_s)`` slice. ``order_cols`` must totally order rows
    within a key (ties would make BOTH formulations nondeterministic);
    ``ts_col`` (the chunking clock) must be its leading column."""
    if k < 2:
        raise ValueError("k must be >= 2 (k == 1 is just the value)")
    if order_cols[0] != ts_col:
        raise ValueError("ts_col must lead order_cols (chunking and "
                         "ordering must agree)")
    rows = df.withColumn(
        "__kc", _key_chunk_struct(key_col, ts_col, chunk_s))

    # Every intermediate carries ONE STRUCT PER ROW (never a bare
    # value): the reference formulation's frame counts ROWS while its
    # collect_list drops NULL values, so row accounting and
    # null-dropping must stay separate — wrap the value in a struct
    # (structs are never null, so collect_list keeps every row),
    # slice by rows, and only at the very end drop null VALUES
    # (review r14: bare-value tails silently backfilled frames with
    # older values whenever value_col held NULLs).
    wrapped = F.struct(F.col(value_col).alias("__v"))
    w_local = (W.partitionBy("__kc").orderBy(*order_cols)
               .rowsBetween(-(k - 1), 0))
    rows = rows.withColumn("__local", F.collect_list(wrapped)
                           .over(w_local))

    # per-chunk tail: sort the chunk's (order..., value) structs and
    # keep the last k-1 ROWS (groupBy reuses the local window's
    # (key, chunk) partitioning)
    order_struct = F.struct(*order_cols, wrapped.alias("__w"))
    ch = (rows.groupBy("__kc")
          .agg(F.sort_array(F.collect_list(order_struct)).alias("__s"))
          .select("__kc",
                  _last(F.transform("__s", lambda s: s["__w"]), k - 1)
                  .alias("__tail")))
    # carry = last k-1 rows before this chunk; bounded frame over
    # the previous k-1 non-empty chunk summaries is provably enough
    vt = df.schema[value_col].dataType.simpleString()
    w_carry = (W.partitionBy("__kc.k").orderBy("__kc.c")
               .rowsBetween(-(k - 1), -1))
    ch = ch.select(
        "__kc",
        _last(F.coalesce(
            F.flatten(F.collect_list("__tail").over(w_carry)),
            F.array().cast(f"array<struct<__v:{vt}>>")),
            k - 1).alias("__carry"))

    out = (rows.join(ch, ["__kc"])
           .withColumn(out_col,
                       F.transform(
                           F.filter(
                               _last(F.concat("__carry", "__local"), k),
                               lambda s: s["__v"].isNotNull()),
                           lambda s: s["__v"]))
           .drop("__kc", "__local", "__carry"))
    return out
