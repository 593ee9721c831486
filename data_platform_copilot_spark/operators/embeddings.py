"""Embedding storage operators: int8 scalar quantization.

Training-data pipelines store billions of embeddings; symmetric int8
quantization (q = round(x * 127 / max|x|), per-vector scale) cuts
storage 4x and feeds int8 ANN kernels. Everything here is a pure
column expression over the array (higher-order functions — zero
Python, zero shuffle, linear scan at any scale).

The rounding step is floor(x * scale + 0.5) — NOT engine round():
half-up by construction, so Spark and the DuckDB oracle agree
bit-for-bit on exact .5 products (engine round() semantics differ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale(vec: Column) -> Column:
    # Explicit NULL for all-zero vectors: Spark's non-ANSI 127/0 happens
    # to yield NULL already, but DuckDB (ieee_floating_point_ops) yields
    # +inf — the guard keeps both engines (and ANSI mode) on the
    # documented "NULL scale" contract; the oracle mirrors it as
    # nullif(max|x|, 0).
    amax = F.array_max(F.transform(vec, F.abs))
    return F.when(amax > 0, F.lit(127.0) / amax)


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, scale, qvec): symmetric per-vector int8 quantization.

    ``scale`` is the dequant multiplier's inverse (x ~ q / scale);
    all-zero vectors yield NULL scale and qvec (nothing to quantize).
    """
    # r14: the scale is an O(dim) fold and the quantize lambda's body
    # closes over it — an interpreted higher-order function
    # re-evaluates non-lambda body subexpressions PER ELEMENT, so the
    # inlined form cost O(dim^2) per row. Layering the scale as a
    # projection column makes the body reference an attribute: O(dim).
    v = F.col(vec_col)
    s1 = df.select(F.col(id_col).alias("id"), v.alias("__v"),
                   _scale(v).alias("__scale"))
    scale = F.col("__scale")
    qvec = F.transform(
        "__v", lambda x: F.floor(x * scale + F.lit(0.5)).cast("int"))
    return s1.select(
        "id",
        scale.alias("scale"),
        # NULL array (not an array of NULLs) when there is no scale
        F.when(scale.isNotNull(), qvec).alias("qvec"),
    )


def dequant_error(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, scale, q_l1, mean_abs_err): quantization fidelity metrics.

    q_l1 is integer-exact (engine-portable without rounding); the
    mean absolute dequantization error folds left-to-right in both
    engines, so the double result is bit-identical.
    """
    # r14: same layering as quantize_int8 — the inlined scale inside
    # the lambda bodies cost O(dim^2) per row — plus the quantized
    # array itself layered once (it feeds BOTH the l1 fold and the
    # error fold; inlined it was re-derived per fold).
    v0 = F.col(vec_col)
    s1 = df.select(F.col(id_col).alias("id"), v0.alias("__v"),
                   _scale(v0).alias("__scale"))
    v = F.col("__v")
    scale = F.col("__scale")
    s2 = s1.select(
        "id", "__v", "__scale",
        F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5))
                    .cast("long")).alias("__q"))
    abs_err = F.zip_with(
        F.col("__q"), v, lambda q, x: F.abs(q / scale - x))
    return s2.select(
        "id",
        scale.alias("scale"),
        F.aggregate("__q", F.lit(0).cast("long"),
                    lambda acc, q: acc + F.abs(q)).alias("q_l1"),
        (F.aggregate(abs_err, F.lit(0.0), lambda acc, e: acc + e)
         / F.size(v)).alias("mean_abs_err"),
    )


def mean_pool(df: DataFrame, group_col: str, vec_col: str,
              renormalize: bool = True) -> DataFrame:
    """Element-wise mean of the vectors in each group — the standard
    chunk-embeddings -> document-embedding pooling step — optionally
    L2-renormalized (cosine retrieval expects unit vectors).

    Shape: posexplode to (group, dim, x) then ONE (group, dim)-keyed
    combine with map-side partial aggregation, then one small
    group-keyed fold back to an array. No per-row Python, no driver
    collect; at 100 TB the shuffle carries |groups| x dims partial
    sums per map task, not the vectors themselves.

    zip_with/aggregate over a collect_list would also work but holds
    every vector of a group in one aggregation buffer; the dim-keyed
    form never materializes a group's vectors together.
    """
    exploded = df.select(
        F.col(group_col).alias("group"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"))
    per_dim = (exploded.groupBy("group", "dim")
               .agg(F.avg(F.col("x").cast("double")).alias("m"),
                    F.count("*").alias("n")))
    pooled = (per_dim.groupBy("group")
              .agg(F.array_sort(F.collect_list(
                  F.struct("dim", "m"))).alias("dm"),
                  (F.max("n")).cast("long").alias("n_vectors"))
              .select("group", "n_vectors",
                      F.transform("dm", lambda s: s["m"]).alias("mean_vec")))
    if not renormalize:
        return pooled
    # r14: norm layered as a projection column — inlined it sat in the
    # renormalize lambda's body, re-evaluating the O(dim) fold per
    # element (O(dim^2) per group).
    normed = pooled.select(
        "group", "n_vectors", "mean_vec",
        F.sqrt(F.aggregate("mean_vec", F.lit(0.0),
                           lambda acc, x: acc + x * x)).alias("__norm"))
    norm = F.col("__norm")
    return normed.select(
        "group", "n_vectors",
        F.when(norm > 0,
               F.transform("mean_vec", lambda x: x / norm))
        .otherwise(F.col("mean_vec")).alias("mean_vec"))


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> "tuple":
    """(sum of outer products X^T X as a dim x dim numpy array,
    per-dim sums, row count) in ONE distributed pass: each Arrow
    batch contributes a partial Gram (a dim*dim float block —
    kilobytes, corpus-size independent), and a single global combine
    sums the partials. This is the covariance/PCA building block
    whose driver state is O(dim^2), never O(rows).
    """
    import numpy as np

    def partial(batches):
        import pandas as pd
        g = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            g += mat.T @ mat
            s += mat.sum(axis=0)
            n += len(mat)
        yield pd.DataFrame({"g": [g.reshape(-1).tolist()],
                            "s": [s.tolist()], "n": [n]})

    parts = (df.select(F.col(vec_col).cast("array<double>").alias("v"))
             .mapInPandas(partial,
                          "g array<double>, s array<double>, n long")
             .collect())
    import numpy as np
    g = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0
    for r in parts:
        g += np.array(r["g"]).reshape(dim, dim)
        s += np.array(r["s"])
        n += r["n"]
    return g, s, n


def pca_components(df: DataFrame, vec_col: str, dim: int,
                   k: int = 2) -> "tuple":
    """Top-k principal components of the embedding cloud: covariance
    = Gram/n - mean mean^T (one distributed pass via gram_matrix),
    then an eigendecomposition of the dim x dim matrix on the driver
    — numpy on a kilobyte-sized symmetric matrix, the correct
    split of distributed vs driver work at any corpus size. Returns
    (components k x dim with a deterministic sign convention —
    largest-|coord| entry positive — and eigenvalues desc).
    """
    import numpy as np
    g, s, n = gram_matrix(df, vec_col, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order]


def pca_project(df: DataFrame, id_col: str, vec_col: str,
                components) -> DataFrame:
    """Project every vector onto the given components (k x dim
    literal — kilobytes riding the plan, no broadcast variable, no
    Python in the scan): returns (id, proj array<double>). Centering
    is deliberately NOT applied here so projection composes with
    incremental appends; callers wanting centered scores subtract
    the component-projected mean (a k-vector) afterwards."""
    from ..functions.vectors import dot
    v = F.col(vec_col).cast("array<double>")
    cols = [dot(v, F.array(*[F.lit(float(x)) for x in comp]))
            for comp in components]
    return df.select(F.col(id_col).alias("id"),
                     F.array(*cols).alias("proj"))
