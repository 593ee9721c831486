"""A16 — namespace lifecycle on Spark SQL databases.

Reference behavior (src/route/namespace.py): create = CREATE SCHEMA
+ metadata row; list/get from metadata; rename updates metadata only
(the physical schema name is immutable once normalized); delete =
DROP SCHEMA CASCADE + cascade metadata delete (models.py:60-73).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from .control import ControlTable
from .naming import normalize_schema_name


class NamespaceError(ValueError):
    pass


class NamespaceManager:
    def __init__(self, spark: SparkSession, control_root: str) -> None:
        self.spark = spark
        self.namespaces = ControlTable(
            control_root, "namespace",
            {"name": "string", "schema_name": "string"})
        self.tables = ControlTable(
            control_root, "namespace_table",
            {"namespace_id": "int64", "name": "string",
             "table_name": "string", "file_name": "string",
             "file_size": "int64", "is_loaded": "bool"})

    def create(self, name: str) -> dict[str, Any]:
        schema_name = normalize_schema_name(name)
        if self.namespaces.filter(schema_name=schema_name):
            raise NamespaceError(f"namespace exists: {schema_name}")
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema_name}")
        return self.namespaces.insert(name=name, schema_name=schema_name)

    def list(self) -> list[dict[str, Any]]:
        return self.namespaces.all()

    def get(self, id_: int) -> dict[str, Any]:
        ns = self.namespaces.get(id_)
        if ns is None:
            raise NamespaceError(f"namespace not found: {id_}")
        return ns

    def rename(self, id_: int, new_name: str) -> dict[str, Any]:
        """Human-facing rename; the physical schema_name is stable
        (reference parity: update touches name + updated_at only)."""
        out = self.namespaces.update(id_, name=new_name)
        if out is None:
            raise NamespaceError(f"namespace not found: {id_}")
        return out

    def delete(self, id_: int) -> None:
        ns = self.get(id_)
        self.spark.sql(f"DROP DATABASE IF EXISTS {ns['schema_name']} CASCADE")
        # cascade metadata delete (reference models.py:60-73)
        for t in self.tables.filter(namespace_id=id_):
            self.tables.delete(int(t["id"]))
        self.namespaces.delete(id_)
