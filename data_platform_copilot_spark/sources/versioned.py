"""Manifest-versioned parquet tables — table-format-lite.

Plain ``mode("overwrite")`` on a directory is NOT atomic: a reader
listing the directory mid-write sees torn state (half the old files
deleted, half the new written), and there is no history to audit or
roll back. Table formats (Delta, Iceberg — neither installed in this
container) fix this with immutable data files + an atomically
swapped manifest; this module implements that core idea with nothing
but parquet and a rename:

- every commit writes data under a NEW immutable directory
  ``data-<n>/`` (deliberately NOT hive ``k=v`` style, which Spark's
  partition discovery would misread as partition values once the
  table itself is hive-partitioned inside each dir) and an immutable
  manifest ``manifest-<n>.json`` listing
  the data directories composing that version (append = previous
  list + new dir; overwrite = just the new dir);
- ``_latest`` is a one-line pointer file written via tmp + atomic
  ``os.replace`` — readers resolve pointer -> manifest -> files, so
  they always see a complete, consistent version (snapshot
  isolation for free);
- time travel = read an older manifest; compaction = rewrite the
  live file set as one new overwrite version (small-file repair
  after many appends); vacuum = delete data dirs no live manifest
  references.

Scale notes: on a real object store the pointer swap maps to a
conditional PUT / rename-if-absent, manifests stay O(versions) tiny
JSON, and data files never mutate — the exact recipe in the Delta
Lake paper (Armbrust et al., VLDB 2020) §3. Single-writer semantics
(one committer at a time), which is the deployment mode of every
batch curation pipeline this engine targets.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class VersionedTableError(RuntimeError):
    pass


def _pointer(table_dir: Path) -> Path:
    return table_dir / "_latest"


def _manifest_path(table_dir: Path, version: int) -> Path:
    return table_dir / f"manifest-{version}.json"


def latest_version(table_dir: str | Path) -> int | None:
    p = _pointer(Path(table_dir))
    if not p.exists():
        return None
    return int(p.read_text().strip())


def _read_manifest(table_dir: Path, version: int) -> dict:
    mp = _manifest_path(table_dir, version)
    if not mp.exists():
        raise VersionedTableError(f"no manifest for version {version}")
    return json.loads(mp.read_text())


def write_version(df: DataFrame, table_dir: str | Path,
                  mode: str = "append",
                  partition_by: list[str] | None = None) -> int:
    """Commit ``df`` as the table's next version; returns it.

    ``append`` composes the new data dir with the previous version's
    list; ``overwrite`` replaces the list. The commit point is the
    atomic pointer swap — a crash before it leaves only unreferenced
    files (vacuum-able garbage), never a torn table.

    ``partition_by`` lays each version dir out hive-partitioned
    (``col=value/`` subdirs), so reads with a filter on those columns
    prune whole directories — the mechanism that keeps a 100 TB
    versioned table scannable. The layout is recorded in the manifest
    and must stay consistent across appends (a mixed layout would
    silently break pruning on the merged read).
    """
    if mode not in ("append", "overwrite"):
        raise VersionedTableError(f"unsupported mode: {mode}")
    root = Path(table_dir)
    root.mkdir(parents=True, exist_ok=True)
    prev = latest_version(root)
    version = 0 if prev is None else prev + 1

    dirs, schema = [f"data-{version}"], dict(df.dtypes)
    if mode == "append" and prev is not None:
        prev_manifest = _read_manifest(root, prev)
        prev_parts = prev_manifest.get("partition_by") or []
        if (partition_by or []) != prev_parts:
            raise VersionedTableError(
                f"partition layout mismatch on append: "
                f"{partition_by} vs {prev_parts}")
        prev_schema = prev_manifest.get("schema", {})
        # evolution rule (additive-only, the Delta/Iceberg default):
        # new columns may appear, existing columns must keep their
        # type — a silent type change would corrupt merged reads.
        clashes = {c: (prev_schema[c], t) for c, t in schema.items()
                   if c in prev_schema and prev_schema[c] != t}
        if clashes:
            raise VersionedTableError(
                f"incompatible column types on append: {clashes}")
        dirs = prev_manifest["data_dirs"] + dirs
        schema = {**prev_schema, **schema}
    writer = df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(root / f"data-{version}"))
    manifest = {"version": version, "mode": mode, "data_dirs": dirs,
                "schema": schema, "partition_by": partition_by or []}
    _manifest_path(root, version).write_text(json.dumps(manifest))

    fd, tmp = tempfile.mkstemp(dir=root, prefix="._latest.")
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, _pointer(root))  # THE commit point (atomic)
    return version


def read_version(spark: SparkSession, table_dir: str | Path,
                 version: int | None = None) -> DataFrame:
    """Read the table at ``version`` (default: latest). Resolves
    pointer -> immutable manifest -> immutable files, so concurrent
    commits can never tear this read."""
    root = Path(table_dir)
    if version is None:
        version = latest_version(root)
        if version is None:
            raise VersionedTableError(f"not a versioned table: {root}")
    dirs = _read_manifest(root, version)["data_dirs"]
    # One read PER dir, unioned by name: (a) additive evolution —
    # later dirs may carry columns earlier ones lack, and a single
    # multi-path read takes the first file's schema and silently
    # DROPS them (mergeSchema only merges within one discovery);
    # (b) hive-partitioned version dirs confuse multi-path partition
    # discovery (CONFLICTING_DIRECTORY_STRUCTURES). Filters still
    # push into every branch, so partition pruning is unaffected.
    parts = [spark.read.parquet(str(root / d)) for d in dirs]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def history(table_dir: str | Path) -> list[dict]:
    """All committed manifests, oldest first (the audit log)."""
    root = Path(table_dir)
    out = []
    v = latest_version(root)
    for i in range((v + 1) if v is not None else 0):
        if _manifest_path(root, i).exists():
            out.append(_read_manifest(root, i))
    return out


def compact(spark: SparkSession, table_dir: str | Path,
            target_files: int = 8) -> int:
    """Small-file repair: rewrite the live file set as ONE overwrite
    version with ``target_files`` parquet files. After many appends a
    table is a spray of small files (each append = its own dir); at
    100 TB that means open/seek overhead dominating scans. Readers on
    old versions are unaffected (their manifests still reference the
    old dirs until vacuum)."""
    v = latest_version(table_dir)
    parts = _read_manifest(Path(table_dir), v).get("partition_by") or []
    df = read_version(spark, table_dir).repartition(target_files)
    return write_version(df, table_dir, mode="overwrite",
                         partition_by=parts or None)


def merge_version(spark: SparkSession, table_dir: str | Path,
                  updates: DataFrame, key: str) -> int:
    """Upsert commit: rows in ``updates`` replace same-``key`` rows of
    the latest version, new keys insert — materialized as ONE
    overwrite version (copy-on-write MERGE, the Delta paper's
    default). Cost is a full rewrite of the live set, which is the
    honest cost of upserts without deletion vectors; at 100 TB the
    rewrite is partition-pruned to the partitions holding matched
    keys."""
    current = read_version(spark, table_dir)
    survivors = current.join(updates.select(key).distinct(), key,
                             "left_anti")
    merged = survivors.unionByName(updates, allowMissingColumns=True)
    v = latest_version(table_dir)
    parts = _read_manifest(Path(table_dir), v).get("partition_by") or []
    return write_version(merged, table_dir, mode="overwrite",
                         partition_by=parts or None)


def vacuum(table_dir: str | Path, keep_last: int = 1) -> list[str]:
    """Delete data dirs referenced by NO retained manifest (the last
    ``keep_last`` versions are retained, older manifests are dropped
    too). Returns the deleted dir names. Time travel reaches only
    retained versions afterwards — same contract as Delta VACUUM."""
    root = Path(table_dir)
    v = latest_version(root)
    if v is None:
        return []
    keep_versions = [i for i in range(v + 1)
                     if _manifest_path(root, i).exists()][-keep_last:]
    live: set[str] = set()
    for i in keep_versions:
        live.update(_read_manifest(root, i)["data_dirs"])
    deleted = []
    for d in sorted(root.glob("data-*")):
        if d.name not in live:
            shutil.rmtree(d)
            deleted.append(d.name)
    for mp in root.glob("manifest-*.json"):
        if int(mp.stem.split("-")[1]) not in keep_versions:
            mp.unlink()
    return deleted
