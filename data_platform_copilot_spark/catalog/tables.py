"""A17/A18 — table registration + CSV ingestion.

Reference behavior (src/route/namespace_table.py:72-114, src/utils.py:
83-119): two-phase lifecycle — register metadata, then upload a CSV
(<=50 MB, .csv extension, non-empty) which materializes the physical
table and flips ``is_loaded``; re-upload is rejected. The reference's
demo bulk ingest (A18) crashes on missing imports — we implement the
*intended* behavior (SURVEY.md §7 risk register).

Spark-first: ``spark.read.csv(header, inferSchema)`` -> managed
parquet table via ``saveAsTable`` — at scale, the same two-phase flow
pointed at object-store paths, with explicit schemas instead of
inference.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .namespaces import NamespaceManager
from .naming import normalize_schema_name

MAX_FILE_SIZE = 50 * 1024 * 1024  # reference src/utils.py:83


class TableError(ValueError):
    pass


def validate_upload(path: str | Path,
                    suffixes: tuple[str, ...] = (".csv",)) -> int:
    """Size/extension/emptiness gate (reference src/utils.py:83-119).
    Returns the file size."""
    p = Path(path)
    if p.suffix.lower() not in suffixes:
        raise TableError(
            f"only {'/'.join(suffixes)} uploads are supported, "
            f"got {p.suffix!r}")
    if not p.exists():
        raise TableError(f"file not found: {p}")
    size = p.stat().st_size
    if size == 0:
        raise TableError("empty file")
    if size > MAX_FILE_SIZE:
        raise TableError(f"file exceeds {MAX_FILE_SIZE} bytes: {size}")
    return size


class TableManager:
    def __init__(self, spark: SparkSession, namespaces: NamespaceManager) -> None:
        self.spark = spark
        self.ns = namespaces

    def register(self, namespace_id: int, name: str) -> dict[str, Any]:
        """Phase 1: metadata row, not yet loaded."""
        self.ns.get(namespace_id)  # raises if missing
        table_name = normalize_schema_name(name)
        if self.ns.tables.filter(namespace_id=namespace_id,
                                 table_name=table_name):
            raise TableError(f"table exists: {table_name}")
        return self.ns.tables.insert(
            namespace_id=namespace_id, name=name, table_name=table_name,
            file_name=None, file_size=None, is_loaded=False)

    def upload_csv(self, table_id: int, csv_path: str | Path) -> dict[str, Any]:
        """Phase 2: materialize the physical table from a CSV."""
        meta = self.ns.tables.get(table_id)
        if meta is None:
            raise TableError(f"table not found: {table_id}")
        if bool(meta["is_loaded"]):
            raise TableError("table already loaded; re-upload rejected")
        size = validate_upload(csv_path)
        ns = self.ns.get(int(meta["namespace_id"]))
        fq = f"{ns['schema_name']}.{meta['table_name']}"
        df = self.spark.read.csv(str(csv_path), header=True, inferSchema=True)
        df.write.mode("overwrite").saveAsTable(fq)
        return self.ns.tables.update(
            table_id, file_name=Path(csv_path).name,
            file_size=size, is_loaded=True)

    def upload_jsonl(self, table_id: int,
                     jsonl_path: str | Path) -> dict[str, Any]:
        """Phase 2 for newline-delimited JSON (the other interchange
        format every data platform ingests; reference is CSV-only).
        Same two-phase lifecycle and gates; schema inference via
        Spark's native JSON reader (one extra pass, like CSV
        inferSchema — at scale callers pass explicit schemas through
        the sources layer instead)."""
        meta = self.ns.tables.get(table_id)
        if meta is None:
            raise TableError(f"table not found: {table_id}")
        if bool(meta["is_loaded"]):
            raise TableError("table already loaded; re-upload rejected")
        size = validate_upload(jsonl_path, (".jsonl", ".json"))
        ns = self.ns.get(int(meta["namespace_id"]))
        fq = f"{ns['schema_name']}.{meta['table_name']}"
        df = self.spark.read.json(str(jsonl_path))
        if not df.columns or df.columns == ["_corrupt_record"]:
            raise TableError("no parseable JSON records in upload")
        n_corrupt = 0
        if "_corrupt_record" in df.columns:
            # PERMISSIVE mode routes unparseable lines into
            # _corrupt_record; a warehouse table must carry DATA
            # columns only — drop the bad lines, surface the count.
            # (Spark requires a cache/materialization barrier to
            # filter on the corrupt column of the same scan.)
            df = df.cache()
            n_corrupt = df.where(
                F.col("_corrupt_record").isNotNull()).count()
            df = (df.where(F.col("_corrupt_record").isNull())
                  .drop("_corrupt_record"))
        df.write.mode("overwrite").saveAsTable(fq)
        out = self.ns.tables.update(
            table_id, file_name=Path(jsonl_path).name,
            file_size=size, is_loaded=True)
        out["n_corrupt_records"] = n_corrupt
        return out

    def get(self, table_id: int) -> dict[str, Any]:
        meta = self.ns.tables.get(table_id)
        if meta is None:
            raise TableError(f"table not found: {table_id}")
        return meta

    def list(self, namespace_id: int) -> list[dict[str, Any]]:
        return self.ns.tables.filter(namespace_id=namespace_id)

    def rename(self, table_id: int, new_name: str) -> dict[str, Any]:
        """Human-facing rename; the physical ``table_name`` is stable
        once normalized (intended behavior of reference
        src/route/namespace_table.py:125-137, whose handler validates
        against the *namespace* model — a pinned reference bug,
        SURVEY.md §7; mirrors NamespaceManager.rename)."""
        self.get(table_id)  # raises if missing
        out = self.ns.tables.update(table_id, name=new_name)
        assert out is not None
        return out

    def delete(self, table_id: int) -> None:
        """Drop physical table + metadata (fixes the reference bug of
        deleting by namespace id, SURVEY.md §7)."""
        meta = self.get(table_id)
        ns = self.ns.get(int(meta["namespace_id"]))
        self.spark.sql(
            f"DROP TABLE IF EXISTS {ns['schema_name']}.{meta['table_name']}")
        self.ns.tables.delete(table_id)

    def demo_bulk_ingest(self, namespace_id: int,
                         directory: str | Path) -> list[dict[str, Any]]:
        """A18 intended behavior: register + upload every *.csv in a
        directory."""
        out = []
        for p in sorted(Path(directory).glob("*.csv")):
            meta = self.register(namespace_id, p.stem)
            out.append(self.upload_csv(int(meta["id"]), p))
        return out
