"""Worker-side pyarrow primitives shared by the versioned table's
Python DataSources (the streaming source ``streaming/stream_source``
and the batch source ``sources/batch_source``): read ONE immutable
parquet file and align it to a declared logical schema — physical->
logical renames (``evolve_schema``), null-fill for later-added
columns, hive partition values injected as typed constants, and
lossless casts for widened types.

Deliberately Spark-free (pyarrow only): this runs inside executors'
Python workers, one partition per file — no nested sessions, no
driver round-trips, Arrow batches straight into the plan.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

from pyspark.sql.datasource import InputPartition

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class FilePartition(InputPartition):
    """One immutable parquet file + its alignment metadata — the
    input-partition shape BOTH DataSources plan (streaming source and
    batch source)."""

    def __init__(self, path: str, renames: dict[str, str],
                 constants: list[tuple[str, str | None]] = (),  # noqa: B006
                 tombstones: list[tuple[str, str]] = ()):  # noqa: B006
        self.path = path
        self.renames = renames
        # hive partition values parsed from the file's path segments
        # (col, raw-string-or-None) — injected as typed constant
        # columns at read (the hive layout stores them in the path,
        # not the parquet footer)
        self.constants = list(constants)
        # MoR deletion vectors applicable to this file's dir:
        # (key_column, tombstone_dir_path) pairs — the batch source
        # masks matching keys worker-side (streaming never sets this:
        # append-only tailing refuses DV tables)
        self.tombstones = list(tombstones)


def hive_constants(table_dir: str, entry: str, file_path: str
                   ) -> list[tuple[str, str | None]]:
    """Hive ``k=v`` constants for one file of one manifest entry.

    Parses BOTH the entry path's own segments and the file's segments
    below it: partitioned CoW merges carry untouched partition LEAVES
    by reference (``data-2-ab/region=EU`` — ``sources.versioned.
    _merge_once``), so for such entries the partition value lives in
    the entry itself, not between entry root and file (ADVICE r12 —
    a between-only parse silently null-fills it)."""
    from urllib.parse import unquote
    droot = Path(table_dir) / entry
    segs = list(Path(entry).parts[1:])
    segs += list(Path(file_path).relative_to(droot).parts[:-1])
    out = []
    for seg in segs:
        if "=" not in seg:
            continue
        k, raw = seg.split("=", 1)
        out.append((k, None if raw == _HIVE_NULL else unquote(raw)))
    return out


def read_parquet_aligned(path: str, renames: dict[str, str],
                         constants: list[tuple[str, str | None]],
                         schema) -> Iterator:
    """Yield arrow ``RecordBatch``es of one parquet file aligned to
    the Spark ``StructType`` ``schema``: rename physical->logical,
    inject hive partition constants, null-fill columns the file
    predates, cast to the declared arrow types.

    Streams the file row-group-wise (``ParquetFile.iter_batches``)
    and aligns per batch, so reader memory stays batch-sized no
    matter how large the file — the read-side twin of the sink's
    incremental ParquetWriter (r13; ``pq.read_table`` materialized
    the whole file per task, the wrong shape for GB-scale files)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    consts = dict(constants)
    pf = pq.ParquetFile(path)
    for rb in pf.iter_batches():
        table = pa.Table.from_batches([rb])
        if renames:
            table = table.rename_columns(
                [renames.get(c, c) for c in table.column_names])
        cols = []
        for field in target:
            if field.name in table.column_names:
                col = table.column(field.name)
                if col.type != field.type:
                    col = pc.cast(col, field.type)
            elif field.name in consts:  # hive partition value
                raw = consts[field.name]
                if raw is None:
                    col = pa.nulls(table.num_rows, type=field.type)
                else:
                    col = pc.cast(
                        pa.array([raw] * table.num_rows,
                                 type=pa.string()), field.type)
            else:  # added by evolve_schema after this file was
                col = pa.nulls(table.num_rows, type=field.type)
            cols.append(col)
        yield from pa.table(cols, schema=target).to_batches()
