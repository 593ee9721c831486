"""A5 — table sampler (reference src/dq.py:18-28).

``SELECT * FROM {table} WHERE {pred} LIMIT n`` with the limit clamped
to [1, 200000] (reference src/config.py:195-196). The reference
interpolates the table name into an f-string (SQL-injectable, noted
as a bug in SURVEY.md §7); we validate the identifier instead.

Scale note: ``limit(n)`` after a pushed-down filter means Spark stops
scanning once n rows are produced (CollectLimit incremental
execution) — the sample never costs a full 100 TB scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import settings

DEFAULT_LIMIT = settings.data_quality.default_limit  # reference src/config.py:195
MAX_LIMIT = settings.data_quality.max_limit          # reference src/config.py:196

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def clamp_limit(n: int | None) -> int:
    """Clamp semantics from reference src/dq.py:20: min(max(n,1), max)."""
    n = DEFAULT_LIMIT if n is None else n
    return min(max(int(n), 1), MAX_LIMIT)


def fetch_table_sample(spark: SparkSession, table: str,
                       where: str | None = None,
                       limit: int | None = None) -> DataFrame:
    """Return up to ``limit`` rows of ``table`` matching ``where``."""
    if not _IDENT_RE.match(table):
        raise ValueError(f"invalid table identifier: {table!r}")
    df = spark.table(table)
    if where:
        df = df.where(F.expr(where))
    return df.limit(clamp_limit(limit))
