"""A15 — metadata control tables on Spark.

The reference keeps ``namespace`` / ``namespace_table`` metadata in
DuckDB with sequences + RETURNING (reference src/database/
base_model.py:12-132, models.py:42-124). Spark has neither; the
idiomatic replacement for low-QPS control metadata is a tiny
single-partition parquet table with driver-side id assignment under
a lock — read-modify-write of a few-hundred-row file, atomic via
write-to-temp + rename.

This is deliberately NOT a distributed-write path: control metadata
is driver-owned state (like a Hive metastore's RDBMS), while the
100 TB data tables live in the warehouse proper.

The injection-prone equality filter of the reference
(base_model.py:91-110, string-interpolated literals) is replaced by
in-memory predicate evaluation — no SQL string assembly at all.
"""

from __future__ import annotations

import shutil
import tempfile
import threading
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class ControlTable:
    """A named, schema'd, driver-side metadata table."""

    def __init__(self, root: str | Path, name: str,
                 columns: dict[str, str]) -> None:
        self.name = name
        self.path = Path(root) / f"{name}.parquet"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        # columns: name -> pandas dtype ('int64'|'string'|'bool'|'datetime')
        self.columns = {"id": "int64", **columns,
                        "created_at": "datetime", "updated_at": "datetime"}
        self._lock = threading.Lock()

    # -- storage ----------------------------------------------------------
    def _empty(self) -> pd.DataFrame:
        data: dict[str, Any] = {}
        for col, dt in self.columns.items():
            if dt == "int64":
                data[col] = pd.Series(dtype="Int64")
            elif dt == "bool":
                data[col] = pd.Series(dtype="boolean")
            elif dt == "datetime":
                data[col] = pd.Series(dtype="datetime64[us]")
            else:
                data[col] = pd.Series(dtype="string")
        return pd.DataFrame(data)

    def _read(self) -> pd.DataFrame:
        if not self.path.exists():
            return self._empty()
        return pq.read_table(self.path).to_pandas()

    def _write(self, df: pd.DataFrame) -> None:
        tmp = Path(tempfile.mkdtemp()) / "t.parquet"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        shutil.move(str(tmp), str(self.path))

    # -- CRUD (reference base_model.py semantics) --------------------------
    def insert(self, **values: Any) -> dict[str, Any]:
        with self._lock:
            df = self._read()
            new_id = int(df["id"].max()) + 1 if len(df) else 1
            now = datetime.now(timezone.utc).replace(tzinfo=None)
            row = {"id": new_id, **values,
                   "created_at": now, "updated_at": now}
            df = pd.concat([df, pd.DataFrame([row])], ignore_index=True)
            self._write(df)
            return row

    def get(self, id_: int) -> dict[str, Any] | None:
        df = self._read()
        hit = df[df["id"] == id_]
        return hit.iloc[0].to_dict() if len(hit) else None

    def update(self, id_: int, **values: Any) -> dict[str, Any] | None:
        with self._lock:
            df = self._read()
            mask = df["id"] == id_
            if not mask.any():
                return None
            for k, v in values.items():
                df.loc[mask, k] = v
            df.loc[mask, "updated_at"] = datetime.now(
                timezone.utc).replace(tzinfo=None)
            self._write(df)
            return df[mask].iloc[0].to_dict()

    def delete(self, id_: int) -> bool:
        with self._lock:
            df = self._read()
            mask = df["id"] == id_
            if not mask.any():
                return False
            self._write(df[~mask])
            return True

    def all(self) -> list[dict[str, Any]]:
        df = self._read().sort_values("id")
        return df.to_dict(orient="records")

    def filter(self, **equals: Any) -> list[dict[str, Any]]:
        """AND-equality filter, evaluated in memory (no SQL strings)."""
        df = self._read()
        for k, v in equals.items():
            df = df[df[k] == v]
        return df.sort_values("id").to_dict(orient="records")
