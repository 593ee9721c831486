"""Catalyst-native BATCH read of versioned tables: a Spark 4.1
Python DataSource with ``pushFilters`` (r12 verdict item 5) —

    register_batch_source(spark)                     # once per session
    spark.read.format("versioned").option("path", table_dir) \\
         .option("version", 3).load().where("id >= 350")
    # or time travel by commit stamp (same contract as the gateway's
    # FOR TIMESTAMP AS OF; naive literals are UTC):
    #    .option("timestampAsOf", "2026-08-16T12:00:00")

Catalyst plans the scan, collects the pushable conjuncts of every
filter above it, and hands them to ``pushFilters`` — the reader
translates the supported ``col op literal`` shapes into the table's
zone-map skip predicates and plans one input partition per SURVIVING
parquet file (manifest dir-level stats, then file-level stats for
``sort_by`` commits — the same two-tier pruning as
``read_version(skip=...)``). Every filter is returned as residual, so
Spark re-applies the full condition row-wise: pruning stays a pure
proof-of-emptiness optimization and results are exactly
``read_version(...).where(...)``.

MoR deletion vectors are applied worker-side (r13): each file
partition carries its dir's applicable tombstone dirs (positional
``after_index`` rule — vectors never mask a later re-insert) and the
reader drops matching keys per Arrow batch, so results equal
``read_version`` on MoR tables too.

Division of labor (decision record in ARCHITECTURE.md §"Batch
DataSource vs gateway rewrite"): this format is the DataFrame-API
door where CATALYST drives manifest pruning natively — no optimizer
re-pass, no view re-materialization. The gateway's SQL-surface
rewrite (``gateway/time_travel.py``) stays the text-SQL door because
it must also resolve AS OF literals and latest-at-query-time names,
and its ``read_version`` views scan native parquet with column
pruning + codegen.

Scale: planning is O(manifest JSON) on the driver; surviving files
are PACKED into byte-budgeted tasks (r14 — ``PackedPartition``; one
task per file priced every small file at a full Python-worker
spin-up, 15.8x the native marginal per-GB cost on a
32-files-per-commit log, tools/ds_throughput_probe.py) and each task
streams its files row-group-wise via pyarrow
(``sources/arrow_io.py``), Arrow batches straight into the plan — the
same executor path the streaming source uses. Reference: no
counterpart (the reference has no versioned storage); parity target
is Delta's DSv2 scan + ``SupportsPushDownFilters`` contract.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    EqualTo, Filter, GreaterThan,
                                    GreaterThanOrEqual, In,
                                    InputPartition, LessThan,
                                    LessThanOrEqual)
from pyspark.sql.types import StructType

from .arrow_io import (FilePartition, hive_constants,
                       read_parquet_aligned)

_PUSH_OPS = {EqualTo: "=", GreaterThan: ">",
             GreaterThanOrEqual: ">=", LessThan: "<",
             LessThanOrEqual: "<="}
# zone-map bounds are only ever int/float/str/bool (mirrors
# versioned._SKIP_LITERAL_TYPES); anything else rides the residual
_PUSH_VALUE_TYPES = (int, float, str, bool)


def _resolve_version(table_dir: str, options) -> int:
    from .versioned import VersionedTableError, history, latest_version
    raw = options.get("version")
    if raw is not None:
        return int(raw)
    ts = options.get("timestampasof")
    if ts is not None:
        # same resolution rule as the gateway's FOR TIMESTAMP AS OF
        # (gateway/time_travel._resolve_timestamp): newest version
        # committed at or before the literal. Re-stated here rather
        # than imported — the gateway raises its HTTP-flavored error
        # type and sits a layer above sources.
        from datetime import datetime, timezone
        want = datetime.fromisoformat(str(ts).strip())
        if want.tzinfo is None:  # naive literals are UTC, like AS OF
            want = want.replace(tzinfo=timezone.utc)
        best = None
        for m in history(table_dir):
            stamp = m.get("committed_at")
            if stamp is not None \
                    and datetime.fromisoformat(stamp) <= want:
                best = m["version"]
        if best is None:
            raise VersionedTableError(
                f"no version committed at or before {ts}")
        return best
    v = latest_version(table_dir)
    if v is None:
        raise VersionedTableError(
            f"not a versioned table: {table_dir}")
    return v


class PackedPartition(InputPartition):
    """One task's worth of immutable parquet files. Planning one task
    PER FILE (the r13 shape) priced every small file at a full Python
    task — worker spin-up + imports dwarf reading a sub-MB file, and a
    32-files-per-commit ingest log scanned 15x slower than native
    (tools/ds_throughput_probe.py, r13 verdict #4). Files are packed
    to a byte budget exactly like Spark's native FileScan packs
    splits, so the per-task constant is amortized over ~budget bytes
    and the marginal per-GB cost is what survives scale-up."""

    def __init__(self, files: list[FilePartition]):
        self.files = list(files)


class VersionedBatchReader(DataSourceReader):
    """One query's scan state: the version is pinned at plan time
    (immutable manifest — concurrent commits can never tear the
    read), ``pushFilters`` accumulates skip predicates, and
    ``partitions`` plans the pruned file set, packed to a byte
    budget (``maxBytesPerPartition``, default 128 MiB, floored by
    ``minPartitions`` — default cpu_count — the way Spark's
    ``maxPartitionBytes``/``leafNodeDefaultParallelism`` pair sizes
    native splits)."""

    _OPEN_FLOOR = 1  # never a zero-byte budget

    def __init__(self, schema: StructType, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError(
                "format('versioned') requires option 'path'")
        self.version = _resolve_version(self.table_dir, options)
        self.schema = schema
        self.skip: list[tuple] = []
        self.max_part_bytes = int(
            options.get("maxbytesperpartition", 128 * 1024 * 1024))
        import os
        self.min_partitions = int(
            options.get("minpartitions", os.cpu_count() or 8))

    # -- Catalyst hands us the pushable conjuncts --------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            op = _PUSH_OPS.get(type(f))
            if (op is not None and len(f.attribute) == 1
                    and isinstance(f.value, _PUSH_VALUE_TYPES)):
                self.skip.append((f.attribute[0], op, f.value))
            elif (isinstance(f, In) and len(f.attribute) == 1
                    and f.value
                    and all(isinstance(v, _PUSH_VALUE_TYPES)
                            for v in f.value)):
                self.skip.append(
                    (f.attribute[0], "in", tuple(f.value)))
        # EVERYTHING stays residual: zone maps prove absence, they
        # don't evaluate predicates — Spark re-filters row-wise
        return iter(filters)

    # -- planning (driver-side Python worker) ------------------------
    def partitions(self) -> list[PackedPartition]:
        """Pack the pruned per-file specs into byte-budgeted tasks.
        Budget = min(maxBytesPerPartition, ceil(total / minPartitions))
        — small tables still fan out to ``minPartitions`` tasks, huge
        tables cap each task at the 128 MiB convention. A single file
        larger than the budget rides alone (a parquet file is this
        planner's atomic unit; row-group splitting would be the next
        refinement). Pruning proofs live on ``plan_files`` — packing
        never changes WHICH files are read, only their grouping."""
        specs = self.plan_files()
        if not specs:
            # a scan needs >= 1 partition; the marker reads nothing
            return [PackedPartition([])]
        sizes = [Path(s.path).stat().st_size for s in specs]
        budget = max(self._OPEN_FLOOR,
                     min(self.max_part_bytes,
                         -(-sum(sizes) // max(1, self.min_partitions))))
        out: list[PackedPartition] = []
        cur: list[FilePartition] = []
        cur_bytes = 0
        for spec, sz in zip(specs, sizes):
            if cur and cur_bytes + sz > budget:
                out.append(PackedPartition(cur))
                cur, cur_bytes = [], 0
            cur.append(spec)
            cur_bytes += sz
        out.append(PackedPartition(cur))
        return out

    def plan_files(self) -> list[FilePartition]:
        from .versioned import (_dir_may_match, _read_manifest,
                                _skip_for_dir)
        root = Path(self.table_dir)
        manifest = _read_manifest(root, self.version)
        dvs = manifest.get("delete_vectors") or []
        stats = manifest.get("dir_stats") or {}
        file_stats = manifest.get("file_stats") or {}
        renames_all = manifest.get("dir_renames") or {}
        out: list[FilePartition] = []
        for i, d in enumerate(manifest["data_dirs"]):
            dskip = _skip_for_dir(manifest, d, self.skip)
            if self.skip and not _dir_may_match(stats.get(d), dskip):
                continue  # whole dir proven empty
            # MoR deletion vectors mask only dirs BEFORE their paired
            # update dir (read_version's positional after_index rule,
            # applied per dir: a vector with after_index j masks dir
            # position i iff j > i — a later re-insert of a masked
            # key is never swallowed)
            tombs = [(dv["key"], str(root / dv["dir"]))
                     for dv in dvs if dv["after_index"] > i]
            ren = renames_all.get(d) or {}
            droot = root / d
            files = sorted(str(p) for p in droot.rglob("*.parquet"))
            fs = file_stats.get(d)
            if (self.skip and fs
                    and set(fs) == {Path(f).name for f in files}):
                # file-granular zone maps (sort_by commits)
                files = [f for f in files
                         if _dir_may_match(fs[Path(f).name], dskip)]
            for f in files:
                out.append(FilePartition(
                    f, ren, hive_constants(self.table_dir, d, f),
                    tombs))
        return out

    # -- executor-side read ------------------------------------------
    def read(self, partition: PackedPartition) -> Iterator:
        for spec in partition.files:
            yield from self._read_file(spec)

    def _read_file(self, spec: FilePartition) -> Iterator:
        batches = read_parquet_aligned(
            spec.path, spec.renames, spec.constants, self.schema)
        if not spec.tombstones:
            yield from batches
            return
        # apply this dir's deletion vectors: drop rows whose key is
        # in any applicable tombstone set. Tombstone files are one
        # merge batch's distinct keys — small by construction (the
        # same reason read_version broadcasts them) — and the masked
        # read stays embarrassingly parallel per file. NULL keys
        # never match a tombstone (anti-join semantics); a dir that
        # predates the key column arrives null-filled and is left
        # intact, matching read_version's column-missing rule.
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        keysets: dict[str, list] = {}
        for key_col, tdir in spec.tombstones:
            for f in sorted(Path(tdir).rglob("*.parquet")):
                t = pq.read_table(f, columns=[key_col])
                keysets.setdefault(key_col, []).append(
                    t.column(key_col))
        masks = {k: pa.concat_arrays(
                     [c for chunked in v for c in chunked.chunks])
                 for k, v in keysets.items()}
        for b in batches:
            keep = None
            for key_col, keys in masks.items():
                idx = b.schema.get_field_index(key_col)
                if idx < 0:
                    continue
                col = b.column(idx)
                if col.type != keys.type:
                    col = pc.cast(col, keys.type)
                hit = pc.fill_null(
                    pc.is_in(col, value_set=keys), False)
                k = pc.invert(hit)
                keep = k if keep is None else pc.and_(keep, k)
            yield b.filter(keep) if keep is not None else b


class VersionedBatchDataSource(DataSource):
    """``spark.dataSource.register(VersionedBatchDataSource)`` (or
    ``register_batch_source``), then
    ``spark.read.format("versioned")`` — Catalyst-driven manifest
    pruning with zero gateway machinery."""

    @classmethod
    def name(cls) -> str:
        return "versioned"

    def _pin_version(self) -> None:
        # resolve "latest" exactly once per scan: schema() and
        # reader() racing a concurrent commit must not see different
        # versions (manifests are immutable, the version pin is the
        # whole torn-read story)
        if self.options.get("version") is None:
            table_dir = self.options.get("path")
            if not table_dir:
                raise ValueError(
                    "format('versioned') requires option 'path'")
            self.options["version"] = str(
                _resolve_version(table_dir, self.options))

    def schema(self) -> str:
        from .versioned import _read_manifest
        self._pin_version()
        m = _read_manifest(Path(self.options["path"]),
                           int(self.options["version"]))
        return ", ".join(f"`{c}` {t}" for c, t in m["schema"].items())

    def reader(self, schema: StructType) -> VersionedBatchReader:
        self._pin_version()
        return VersionedBatchReader(schema, self.options)


def register_batch_source(spark) -> None:
    from ..shipping import ensure_package_shipped
    ensure_package_shipped(spark)  # workers unpickle us by reference
    spark.dataSource.register(VersionedBatchDataSource)
    # runtime-settable and off by default in Spark 4.1: without it,
    # planning fails loudly (DATA_SOURCE_PUSHDOWN_DISABLED) for any
    # reader implementing pushFilters
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
