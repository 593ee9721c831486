"""Incremental change-feed source over versioned tables (r11 verdict
item 6): tail the manifest log and process each committed version
exactly once — the standard way downstream jobs consume a versioned
table (Delta's ``readChangeFeed`` / Iceberg's incremental read),
built as a foreachBatch-style driver over ``diff_versions`` slices
with a checkpointed high-water mark. (Two consumption paths, Delta's
split exactly: APPEND-ONLY tailing belongs to the true Structured
Streaming format — ``spark.readStream.format("versioned_stream")``,
``streaming/stream_source.py`` — while THIS feed is the CDF path
that also carries updates and deletes as old/new value rows.)

Semantics: one micro-batch PER VERSION. Version 0 (or the configured
``starting_version``) arrives as an initial insert-only snapshot;
every later version v arrives as ``diff_versions(v-1, v)`` — the
(key, change_type, old_*/new_*) CDF shape. Batches are delivered in
version order; the high-water mark advances (atomic tmp+rename)
only AFTER the handler returns, so a crash between handler and
checkpoint re-delivers exactly that one version on restart
(at-least-once at the feed boundary). End-to-end exactly-once comes
from pairing the deterministic batch id (the version number) with an
idempotent sink: ``pipe_to_versioned`` applies each batch to a
destination versioned table via ``write_version(txn=(app_id, v))`` /
``merge_version(txn=...)``, whose per-transaction dedupe makes a
replayed or RACING duplicate delivery of the same version a no-op —
two feed instances sharing a checkpoint directory serialize to one
commit per version.

Scale: offset resolution reads O(1) tiny JSONs per poll (the
pointer + the checkpoint); each batch plans one key-partitioned
full-outer join between two adjacent immutable snapshots, column-
pruned to key + compared columns — the diff never scans versions
outside its slice. A feed that falls behind the vacuum retention
window fails loudly (the old snapshot is gone) instead of silently
skipping changes.

The reference has no streaming or table-format surface (nothing to
cite); parity target is Delta CDF's contract.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.versioned import (VersionedTableError, _manifest_path,
                                 diff_versions, latest_version,
                                 read_version)


class FeedBehindRetentionError(VersionedTableError):
    """The next version's predecessor manifest was vacuumed away —
    the feed can no longer produce an exact diff. Reset the
    checkpoint (full re-snapshot) or widen vacuum retention."""


class VersionedChangeFeed:
    """Checkpointed incremental reader over a versioned table's
    manifest log.

    ``high_water()`` -> last fully processed version (or None).
    ``pending()``    -> versions committed past the high-water mark.
    ``next_batches()`` yields ``(version, DataFrame)`` in order
    WITHOUT advancing the mark; ``run_available(handler)`` delivers
    each pending batch to ``handler(df, version)`` and checkpoints
    after each successful return."""

    def __init__(self, spark: SparkSession, table_dir: str | Path,
                 key: str, checkpoint_dir: str | Path,
                 starting_version: int = 0,
                 compare_cols: list[str] | None = None):
        self.spark = spark
        self.table_dir = Path(table_dir)
        self.key = key
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.starting_version = starting_version
        self.compare_cols = compare_cols

    # -- offset management ----------------------------------------------
    @property
    def _offset_path(self) -> Path:
        return self.checkpoint_dir / "offset.json"

    def high_water(self) -> int | None:
        try:
            return json.loads(self._offset_path.read_text())["version"]
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def _advance(self, version: int) -> None:
        tmp = self._offset_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"version": version}))
        os.replace(tmp, self._offset_path)

    # -- batch production -----------------------------------------------
    def pending(self) -> list[int]:
        latest = latest_version(self.table_dir)
        if latest is None:
            raise VersionedTableError(
                f"not a versioned table: {self.table_dir}")
        hwm = self.high_water()
        start = self.starting_version if hwm is None else hwm + 1
        return list(range(start, latest + 1))

    def _batch(self, version: int) -> DataFrame:
        if version == self.starting_version:
            # initial snapshot: every row arrives as an insert, in
            # the same (key, change_type, new_*) CDF shape
            snap = read_version(self.spark, self.table_dir,
                                version=version)
            cols = (self.compare_cols if self.compare_cols is not None
                    else [c for c in snap.columns if c != self.key])
            out = [F.col(self.key), F.lit("insert").alias("change_type")]
            for c in cols:
                out.append(F.lit(None).cast(dict(snap.dtypes)[c])
                           .alias(f"old_{c}"))
                out.append(F.col(c).alias(f"new_{c}"))
            return snap.select(*out)
        if not _manifest_path(self.table_dir, version - 1).exists():
            raise FeedBehindRetentionError(
                f"version {version - 1} manifest vacuumed: change feed "
                f"fell behind retention (reset the checkpoint)")
        return diff_versions(self.spark, self.table_dir, self.key,
                             v_from=version - 1, v_to=version,
                             compare_cols=self.compare_cols,
                             include_values=True)

    def next_batches(self):
        for v in self.pending():
            yield v, self._batch(v)

    # -- delivery -------------------------------------------------------
    def run_available(self, handler) -> list[int]:
        """Deliver every pending version to ``handler(df, version)``,
        advancing the checkpoint after each successful return.
        Returns the versions delivered this call. A handler exception
        leaves the mark at the last success — the failed version is
        re-delivered next call (pair with a txn-idempotent sink for
        exactly-once)."""
        done = []
        for v, df in self.next_batches():
            handler(df, v)
            self._advance(v)
            done.append(v)
        return done

    def pipe_to_versioned(self, dest_dir: str | Path,
                          app_id: str) -> list[int]:
        """Exactly-once apply into another versioned table: inserts/
        updates upsert, deletes mask, one destination commit per
        source version with ``txn=(app_id, version)`` — a replayed or
        racing duplicate delivery of the same version dedupes to a
        no-op inside the destination's commit protocol."""
        from ..sources.versioned import merge_version, write_version

        def apply(df: DataFrame, version: int) -> None:
            upserts = (df.where(F.col("change_type")
                                .isin("insert", "update"))
                       .select(F.col(self.key),
                               *[F.col(c).alias(c.removeprefix("new_"))
                                 for c in df.columns
                                 if c.startswith("new_")]))
            deletes = df.where(F.col("change_type") == "delete")
            n_del = deletes.limit(1).count()
            if latest_version(dest_dir) is None:
                write_version(upserts, dest_dir, "overwrite",
                              txn=(app_id, version))
            elif n_del == 0:
                merge_version(self.spark, dest_dir, upserts, self.key,
                              strategy="mor", txn=(app_id, version))
            else:
                # delete-bearing batch: rebuild the masked snapshot
                # as one pinned commit (rare on append/upsert feeds).
                # Anti-join on EVERY touched key — deletes AND
                # upserts — or a key updated in the same batch would
                # survive with its old value next to the new one
                # (review r12)
                cur = read_version(self.spark, dest_dir)
                touched = (deletes.select(F.col(self.key))
                           .unionByName(upserts.select(F.col(self.key)))
                           .distinct())
                merged = (cur.join(touched, self.key, "left_anti")
                          .unionByName(upserts,
                                       allowMissingColumns=True))
                write_version(merged, dest_dir, "overwrite",
                              txn=(app_id, version))

        return self.run_available(apply)
