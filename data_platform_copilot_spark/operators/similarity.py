"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN recipe:
- ``brute_force_topk`` — exact cosine top-k; the baseline and the
  verify stage. O(|queries| x |corpus|): fine when queries are few
  (broadcast) or as the within-bucket scorer.
- ``srp_lsh_topk`` — signed-random-projection LSH: deterministic
  hyperplanes (seeded numpy, shipped as literal arrays — no UDF, no
  broadcast variable needed at this size), bucket = sign bit string;
  candidates come only from the query's bucket across ``tables``
  independent hash tables, then exact cosine re-ranks.

Scale design: brute force distributes as a broadcast of the query
set against a partitioned corpus scan — no shuffle of the corpus.
SRP-LSH turns top-k into |tables| equi-joins on the bucket key; at
100 TB the corpus-side buckets are precomputed once and reused
across query batches (write-side partitioning by bucket).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot


def brute_force_topk(corpus: DataFrame, queries: DataFrame,
                     id_col: str, vec_col: str, k: int = 10,
                     query_id_col: str | None = None) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Ties break on neighbor id for determinism. Self-matches excluded.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit string of the vector against each hyperplane."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(x)) for x in plane])) >= 0,
               F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def srp_lsh_topk(corpus: DataFrame, queries: DataFrame,
                 id_col: str, vec_col: str, k: int = 10,
                 n_planes: int = 8, tables: int = 4,
                 dim: int = 64, seed: int = 42,
                 query_id_col: str | None = None) -> DataFrame:
    """Approximate cosine top-k via SRP-LSH bucketing.

    Candidates = corpus rows sharing the query's bucket in ANY of the
    ``tables`` hash tables; exact cosine re-ranks candidates. Recall
    improves with more tables / fewer planes per table.
    """
    query_id_col = query_id_col or id_col
    cand = None
    for t in range(tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        q = queries.select(F.col(query_id_col).alias("query_id"),
                           F.col(vec_col).alias("qv"),
                           _bucket_expr(F.col(vec_col), planes).alias("bucket"))
        c = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"),
                          _bucket_expr(F.col(vec_col), planes).alias("bucket"))
        pairs = (F.broadcast(q).join(c, "bucket")
                 .where(F.col("query_id") != F.col("neighbor_id"))
                 .select("query_id", "qv", "neighbor_id", "cv"))
        cand = pairs if cand is None else cand.unionAll(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand
        .withColumn("cosine", cosine_similarity(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
