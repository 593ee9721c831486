"""SCD Type 2 merge — CDC upserts without Delta/Iceberg.

MERGE INTO needs a transactional table format (not in this image);
the same semantics compose from plain DataFrame ops:

  expired  = current rows whose key receives an update
             -> closed with valid_to = update ts
  carried  = current rows untouched by this batch
  inserted = the update rows, opened at their ts

One shuffle on the business key. Idempotent for a given batch
(re-running with the same updates yields the same table). At scale
the current table is partitioned by is_current so the rewrite
touches only the open partition — with Delta the same plan becomes
a MERGE with file-level pruning, nothing above this API changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_TS = "9999-12-31 23:59:59"


def scd2_init(snapshot: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Bootstrap the history table from an initial snapshot."""
    return (snapshot
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lit(OPEN_TS).cast("timestamp"))
            .withColumn("is_current", F.lit(True)))


def scd2_merge(current: DataFrame, updates: DataFrame,
               key: str, ts_col: str) -> DataFrame:
    """Apply an update batch to an SCD2 history table.

    ``updates`` carries one row per changed key (latest state).
    Idempotent: an open row is closed only when the update is strictly
    newer than its valid_from, and an update whose key already has an
    open row at-or-after its ts is a no-op — so retrying a batch
    leaves the table unchanged instead of stacking zero-length
    versions.
    """
    open_rows = current.where(F.col("is_current"))
    closed_rows = current.where(~F.col("is_current"))

    upd_ts = updates.select(F.col(key).alias("__k"),
                            F.col(ts_col).alias("__new_ts"))
    tagged = open_rows.join(upd_ts, open_rows[key] == F.col("__k"), "left")
    should_expire = (F.col("__k").isNotNull()
                     & (F.col("valid_from") < F.col("__new_ts")))
    expired = (tagged.where(should_expire)
               .withColumn("valid_to", F.col("__new_ts"))
               .withColumn("is_current", F.lit(False))
               .drop("__k", "__new_ts"))
    untouched = tagged.where(~should_expire).drop("__k", "__new_ts")

    already_open = open_rows.select(F.col(key).alias("__k"),
                                    F.col("valid_from").alias("__vf"))
    fresh = updates.join(
        already_open,
        (updates[key] == F.col("__k"))
        & (F.col("__vf") >= updates[ts_col]),
        "left_anti")
    inserted = scd2_init(fresh, key, ts_col)

    cols = [key, *[c for c in inserted.columns if c != key]]
    return (closed_rows.select(*cols)
            .unionByName(untouched.select(*cols))
            .unionByName(expired.select(*cols))
            .unionByName(inserted.select(*cols)))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Row-level diff between two table snapshots:
    (keys..., status in {added, removed, changed, unchanged},
    old_fp, new_fp).

    The change test compares an md5 fingerprint of the compare
    columns, so nothing but the keys and two 32-char strings
    survives the join — at 100 TB the full-outer shuffle carries
    (key, fp) pairs, not row payloads; the same diff over Delta/
    Iceberg would push down to change-data-feed file pruning, and
    nothing above this API changes.

    The pre-hash encoding is injective for ANY cell contents: each
    column encodes as ``len:value`` (NULL as the bare token ``n``,
    unambiguous since non-NULL tokens start with a digit), and the
    tokens concatenate with no separator — a front-to-back parse
    (read digits to ':', then that many chars) recovers the exact
    column tuple, so no separator/sentinel collision exists (unlike
    a concat_ws scheme, where values containing the separator can
    shift across column boundaries).
    """

    def fp(df: DataFrame) -> DataFrame:
        def enc(c: str):
            s = F.col(c).cast("string")
            return F.when(s.isNull(), F.lit("n")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s))
        return df.select(*key_cols,
                         F.md5(F.concat(*[enc(c) for c in compare_cols]))
                         .alias("fp"))

    o = fp(old).withColumnRenamed("fp", "old_fp")
    n = fp(new).withColumnRenamed("fp", "new_fp")
    return (
        o.join(n, key_cols, "full_outer")
        .select(
            *key_cols, "old_fp", "new_fp",
            F.when(F.col("old_fp").isNull(), "added")
            .when(F.col("new_fp").isNull(), "removed")
            .when(F.col("old_fp") != F.col("new_fp"), "changed")
            .otherwise("unchanged").alias("status"))
    )
