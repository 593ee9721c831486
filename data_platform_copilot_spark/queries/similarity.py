"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, srp_lsh_topk
from .core import _t, query, rnd

_COS = """list_dot_product(q.embedding, c.embedding) /
      (sqrt(list_dot_product(q.embedding, q.embedding)) *
       sqrt(list_dot_product(c.embedding, c.embedding)))"""


@query("ann_bruteforce_topk", oracle=f"""
WITH scored AS (
    SELECT q.vec_id AS query_id,
           c.vec_id AS neighbor_id,
           {_COS} AS cos_raw
    FROM embeddings q
    JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
), ranked AS (
    SELECT query_id, neighbor_id,
           round(cos_raw, 4) AS cosine,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= 10
""")
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 5 vectors as queries —
    the ANN baseline. Query set broadcasts; the corpus is scanned
    once with no shuffle of the corpus itself."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = brute_force_topk(emb, queries, "vec_id", "embedding", k=10)
    return out.select("query_id", "neighbor_id",
                      rnd("cosine", 4).alias("cosine"), "rank")


@query("ann_srp_lsh_topk")  # approximate: rows-only check; recall pinned in tests
def ann_srp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-10 for the same 5 queries. Bucketed
    candidate generation (4 tables x 8 hyperplanes) + exact re-rank;
    recall vs brute force is asserted in tests (not SQL-expressible
    deterministically, so no value oracle)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = srp_lsh_topk(emb, queries, "vec_id", "embedding",
                       k=10, n_planes=8, tables=4, dim=64, seed=42)
    return out.select("query_id", "neighbor_id",
                      rnd("cosine", 4).alias("cosine"), "rank")


@query("ann_ivf_topk")  # approximate + iterative index build: rows-only
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 for the same 5 queries: deterministic
    mini k-means coarse quantizer (16 cells, 2 Lloyd rounds), each
    query probes its 8 nearest cells, exact cosine re-ranks. The
    iterative index build is not SQL-expressible, so the driver
    records a rows-only check; recall vs brute force is pinned in
    tests."""
    from ..operators.similarity import ivf_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = ivf_topk(emb, queries, "vec_id", "embedding",
                   k=10, n_clusters=16, n_probe=8, iters=2, dim=64)
    return out.select("query_id", "neighbor_id",
                      rnd("cosine", 4).alias("cosine"), "rank")


@query("embedding_quantize_int8", oracle="""
WITH s AS (
    SELECT vec_id,
           CAST(127.0 AS DOUBLE)
           / nullif(CAST(list_max(list_transform(embedding, x -> abs(x)))
                         AS DOUBLE), 0.0) AS scale,
           embedding
    FROM embeddings
), q AS (
    SELECT vec_id, scale,
           list_transform(embedding,
                          x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qv,
           embedding
    FROM s
)
SELECT vec_id,
       round(scale, 6) AS scale,
       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
       round(list_sum(list_transform(
                 list_zip(qv, embedding),
                 p -> abs(p[1] / scale - p[2])))
             / len(embedding), 6) AS mean_abs_err
FROM q
""")
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization fidelity over the embeddings
    table: per-vector scale, integer-exact |q| mass, and mean
    absolute dequantization error — all value-verified (half-up
    rounding by construction avoids engine round() divergence)."""
    from ..operators.embeddings import dequant_error
    out = dequant_error(_t(spark, sf_dir, "embeddings"),
                        "vec_id", "embedding")
    return out.select(
        out["id"].alias("vec_id"),
        rnd("scale", 6).alias("scale"),
        "q_l1",
        rnd("mean_abs_err", 6).alias("mean_abs_err"),
    )
