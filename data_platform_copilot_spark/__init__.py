"""data_platform_copilot_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of the reference system
(Newander/Data-Platform-Copilot, an NL->SQL copilot + data-platform
control plane that delegates execution to an embedded DuckDB): the
SQL gateway, data-quality subsystem, catalog/metadata layer, schema
docs, NL->SQL chain scaffolding — all re-expressed on Apache Spark
(DataFrame / Spark SQL / Catalyst / Structured Streaming), plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.

Design stance (see ARCHITECTURE.md):
- DataFrame/SQL-first; Catalyst does pushdown/pruning/join planning.
- One long-lived SparkSession; warehouse = parquet-backed databases.
- UDFs only where built-ins can't express semantics, always
  Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
- Every operator designed for a 1000-executor / 100 TB deployment,
  verified for correctness on small scale factors.
"""

__version__ = "0.1.0"
