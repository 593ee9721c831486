"""Read-side connectors: cross-format files and JDBC databases.

The reference carries a PostgreSQL connector beside its DuckDB file
(reference src/database/db_connector.py:115-151 — stubbed there: the
DSN builder exists, the execution paths raise). Spark's idiomatic
equivalent is the JDBC data source, which pushes filters and
projections into the remote database and parallelizes the scan with
partitioning bounds. No JDBC driver jar ships in this sandbox, so
``jdbc_table`` is import-safe and only ``.load()`` needs the driver —
the reader construction (URL, dbtable, pushdown-relevant options,
partition bounds) is the tested contract, mirroring how the
reference ships a connector it cannot exercise either.

``read_table_any`` is the read twin of sinks.write_table: one
entrypoint for parquet/csv/json/orc with explicit schema support —
schema-on-read for the self-describing formats, mandatory schema for
text formats (schema inference is a full extra scan at 100 TB; make
it a choice, not an accident).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .sinks import FORMATS


def read_table_any(spark: SparkSession, path: str, fmt: str = "parquet",
                   schema: T.StructType | str | None = None,
                   **options: str) -> DataFrame:
    """Read ``path`` as ``fmt``; text formats require a schema."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt}; one of {FORMATS}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(
            f"{fmt} needs an explicit schema: inference costs a full "
            "extra scan of the source")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def jdbc_options(url: str, table: str,
                 user: str | None = None, password: str | None = None,
                 partition_column: str | None = None,
                 lower_bound: int | None = None,
                 upper_bound: int | None = None,
                 num_partitions: int | None = None,
                 fetch_size: int = 10_000,
                 **options: str) -> dict[str, str]:
    """Validated JDBC option map (the testable connector contract —
    the DataFrameReader keeps its options JVM-side)."""
    if not url.startswith("jdbc:"):
        raise ValueError("url must be a jdbc: URL")
    if (partition_column is not None) and (
            lower_bound is None or upper_bound is None
            or num_partitions is None):
        raise ValueError(
            "partition_column requires lower_bound, upper_bound "
            "and num_partitions")
    out: dict[str, str] = {"url": url, "dbtable": table,
                           "fetchsize": str(fetch_size)}
    if user is not None:
        out["user"] = user
    if password is not None:
        out["password"] = password
    if partition_column is not None:
        out.update({"partitionColumn": partition_column,
                    "lowerBound": str(lower_bound),
                    "upperBound": str(upper_bound),
                    "numPartitions": str(num_partitions)})
    out.update(options)
    return out


def jdbc_reader(spark: SparkSession, url: str, table: str, **kwargs):
    """Configured JDBC DataFrameReader (call ``.load()`` to scan).

    With ``partition_column`` + bounds the scan splits into
    ``num_partitions`` range queries executed in parallel — the only
    way a database read scales past one connection. Filters and
    column pruning on the resulting DataFrame push down into the
    remote SQL (Catalyst's JDBC pushdown), so ``.filter().select()``
    costs the database only the rows and columns asked for.
    """
    return spark.read.format("jdbc").options(
        **jdbc_options(url, table, **kwargs))


def postgres_url(host: str, port: int, database: str) -> str:
    """DSN builder (reference db_connector.py:129 semantics)."""
    if not 1 <= port <= 65535:
        raise ValueError("port must be between 1 and 65535")
    return f"jdbc:postgresql://{host}:{port}/{database}"
