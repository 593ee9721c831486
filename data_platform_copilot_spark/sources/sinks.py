"""Write-side: format sinks with scale-aware layout controls.

The reference only ever ingests CSV into DuckDB; a standalone engine
needs the full write surface. Thin, explicit wrappers over the
DataFrameWriter so layout decisions (partitioning, bucketing, target
file count) are part of the operator contract rather than scattered
call sites.

Scale notes:
- ``partition_by`` => directory partitioning => partition pruning for
  readers (the 100 TB equivalent of an index).
- ``bucket_by`` => co-located joins/aggs on the bucket key with no
  exchange (see tests/test_scale_patterns.py).
- ``target_files`` coalesces ONLY when reducing partition count —
  never a full shuffle on the write path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMATS = ("parquet", "csv", "json", "orc")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: list[str] | None = None,
                target_files: int | None = None,
                **options: str) -> None:
    """Write ``df`` to ``path`` in ``fmt`` with optional dir-partitioning."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt}; one of {FORMATS}")
    if target_files is not None:
        df = df.coalesce(target_files)
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    if options:
        writer = writer.options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(df: DataFrame, table: str, buckets: int,
                         bucket_cols: list[str],
                         sort_cols: list[str] | None = None,
                         mode: str = "overwrite") -> None:
    """Save as a bucketed managed table (bucketing requires the table
    catalog — plain paths can't carry bucket metadata)."""
    writer = (df.write.mode(mode)
              .bucketBy(buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None, **options: str) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt}; one of {FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def export_training_shards(packed: DataFrame, path: str,
                           mode: str = "overwrite") -> None:
    """Materialize packed training chunks (output of
    ``operators.quality.pack_chunks``: ... shard, token_offset, bin)
    as the directory layout a trainer consumes: one directory per
    shard (partition pruning = shard selection), rows within each
    file sorted by (bin, token_offset) so a sequential read streams
    training sequences in packing order without a sort at load time.

    One exchange total: the repartition ON shard both routes each
    shard's rows to a single writer task (one file per shard, no
    tiny-file spray) and is the only shuffle —
    ``sortWithinPartitions`` is a task-local sort. At 100 TB,
    shards = O(cluster cores), so files stay balanced by
    construction (the md5 shard assignment is uniform).
    """
    (packed
     .repartition("shard")
     .sortWithinPartitions("bin", "token_offset")
     .write.mode(mode)
     .partitionBy("shard")
     .parquet(path))


def export_document_shards(docs: DataFrame, path: str,
                           target_tokens: int = 1 << 22,
                           mode: str = "overwrite") -> None:
    """Materialize raw documents as token-balanced shards using the
    order-preserving prefix-sum plan (queries/quality.py
    output_shard_plan): shard_id = floor(exclusive-running-token-sum
    / target) in doc_id order, so every output directory holds ~
    ``target_tokens`` whitespace tokens regardless of doc-length
    skew, and a sequential reader sees docs in corpus order.

    Scale (r12 — same rewrite as the output_shard_plan twin): the
    running sum is the TWO-PHASE DISTRIBUTED PREFIX SUM over
    deterministic fixed-width doc_id buckets
    (operators/layout.add_range_bucket): phase 1 reduces each bucket
    to a token subtotal (the only unpartitioned window runs over the
    64 aggregated subtotal rows), phase 2 broadcasts the exclusive
    offsets back and finishes with a per-bucket running sum — no
    single-task WindowExec over the corpus. The remaining wide
    stages are the phase-1 reduce and the repartition ON shard_id
    that gives each shard a single writer (no tiny-file spray); rows
    inside each file stay sorted by doc_id via a task-local sort.
    The two token_count scans (subtotal + assignment) are the
    standard two-pass prefix trade.
    """
    from pyspark.sql import Window

    from ..functions.text import token_count
    from ..operators.layout import add_range_bucket, bucket_offsets
    d = docs.withColumn("__nt",
                        token_count(F.col("text")).cast("long"))
    db = add_range_bucket(d, "doc_id", 64)
    offs = bucket_offsets(db, F.col("__nt"))
    wloc = (Window.partitionBy("__rb").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    assigned = (db.join(F.broadcast(offs), "__rb")
                .withColumn(
                    "shard_id",
                    F.floor((F.col("__rb_off")
                             + F.sum("__nt").over(wloc)
                             - F.col("__nt")) / target_tokens)
                    .cast("long"))
                .drop("__rb", "__rb_off", "__nt"))
    (assigned
     .repartition("shard_id")
     .sortWithinPartitions("doc_id")
     .write.mode(mode)
     .partitionBy("shard_id")
     .parquet(path))


def export_interleaved_shards(docs: DataFrame, path: str,
                              group_col: str = "source",
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              temperature: float = 0.7,
                              target_tokens: int = 1 << 22,
                              mode: str = "overwrite") -> None:
    """Trainer-ready export: documents ordered by the deterministic
    temperature-weighted interleave schedule
    (operators/sampling.interleave_schedule_keys — sources mixed at
    n^temperature rates, md5-ranked within source), then cut into
    token-balanced shards by the running token sum IN SCHEDULE
    ORDER. A sequential reader walking shard 0, 1, 2, ... consumes
    the exact training mixture with ~``target_tokens`` per file —
    the end-to-end compose of the interleave audit entry and the
    prefix-sum shard planner.

    Scale (r12): the schedule-order running sum is the two-phase
    distributed prefix sum over fixed-width buckets of the integer
    interleave key k (equal keys always share a bucket, so the
    per-bucket (k, group, rn) window plus broadcast offsets equals
    the single global window exactly); no single-task WindowExec
    over the corpus. Wide stages: the phase-1 reduce and the
    single-writer-per-shard repartition, both inherent to an
    order-defining export.
    """
    from pyspark.sql import Window

    from ..functions.text import token_count
    from ..operators.layout import add_range_bucket, bucket_offsets
    from ..operators.sampling import interleave_schedule_keys
    keyed = interleave_schedule_keys(docs, group_col, id_col,
                                     temperature=temperature) \
        .withColumn("__nt", token_count(F.col(text_col)).cast("long"))
    kb = add_range_bucket(keyed, "k", 64)
    offs = bucket_offsets(kb, F.col("__nt"))
    wloc = (Window.partitionBy("__rb").orderBy("k", group_col, "rn")
            .rowsBetween(Window.unboundedPreceding, 0))
    assigned = (kb.join(F.broadcast(offs), "__rb")
                .withColumn(
                    "shard_id",
                    F.floor((F.col("__rb_off")
                             + F.sum("__nt").over(wloc)
                             - F.col("__nt")) / target_tokens)
                    .cast("long"))
                .drop("__rb", "__rb_off", "__nt"))
    (assigned
     .repartition("shard_id")
     .sortWithinPartitions("k", group_col, "rn")
     .write.mode(mode)
     .partitionBy("shard_id")
     .parquet(path))
