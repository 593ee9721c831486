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


def _kmeans_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                      n_clusters: int, iters: int, dim: int):
    """Deterministic mini k-means for the IVF coarse quantizer.

    Seeds = the ``n_clusters`` corpus vectors with the smallest
    md5(id) (engine-portable deterministic sample); ``iters`` Lloyd
    rounds refine them. Index BUILD is an iterative action loop by
    nature (each round syncs n_clusters x dim floats to the driver —
    kilobytes, independent of corpus size); assignment stays
    distributed (argmin over a broadcast centroid matrix in one Arrow
    batch pass per round). Returns a list[list[float]].

    Centroids are quantized to 6 decimals after every round: the
    per-cell means are float sums whose accumulation ORDER is
    engine- and partitioning-dependent, so snapping to a 1e-6 grid
    makes the whole index build bit-reproducible across engines —
    the DuckDB oracle replays these exact rounds in SQL (negligible
    recall impact; pinned by the recall pytest).
    """
    import numpy as np

    seeds = (corpus
             .select(F.col(vec_col).alias("v"),
                     F.md5(F.col(id_col).cast("string")).alias("h"))
             .orderBy("h").limit(n_clusters).collect())
    if not seeds:  # empty corpus: no cells, callers propagate empty
        return []
    cents = np.array([r["v"] for r in seeds], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cents = np.round(cents, 6)

    for _ in range(iters):
        assigned = _assign_clusters(corpus, id_col, vec_col, cents.tolist())
        sums = (assigned
                .select("cluster", F.posexplode(F.col("v")))
                .groupBy("cluster", "pos")
                .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
                .collect())
        nxt = cents.copy()
        acc: dict[int, np.ndarray] = {}
        for r in sums:
            acc.setdefault(r["cluster"], np.zeros(dim))[r["pos"]] = (
                r["s"] / r["n"])
        for c, vec in acc.items():
            norm = np.linalg.norm(vec)
            if norm > 0:
                nxt[c] = np.round(vec / norm, 6)
        cents = nxt
    return cents.tolist()


def _assign_clusters(df: DataFrame, id_col: str, vec_col: str,
                     centroids: list[list[float]]) -> DataFrame:
    """(id, v, cluster): nearest centroid by cosine, via one
    Arrow-batched gemm against the (tiny) centroid matrix."""
    import numpy as np
    import pandas as pd

    cmat = np.array(centroids, dtype=np.float64)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            pdf = pdf.assign(cluster=np.argmax(mat @ cmat.T, axis=1))
            yield pd.DataFrame({"id": pdf["id"], "v": pdf["v"],
                                "cluster": pdf["cluster"].astype("int32")})

    return (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .mapInPandas(run, "id long, v array<double>, cluster int"))


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             id_col: str, vec_col: str, k: int = 10,
             n_clusters: int = 16, n_probe: int = 4,
             iters: int = 2, dim: int = 64,
             query_id_col: str | None = None) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    Build: deterministic mini k-means partitions the corpus into
    ``n_clusters`` cells (one `cluster` column — at scale this is the
    write-side partition key, computed once per corpus, reused by
    every query batch). Search: each query probes its ``n_probe``
    nearest cells only, then exact cosine re-ranks the candidates —
    compute touches ~n_probe/n_clusters of the corpus instead of all
    of it. Recall/probe trade-off is the standard IVF dial; pinned by
    a recall-vs-brute-force pytest.
    """
    query_id_col = query_id_col or id_col
    cents = _kmeans_centroids(corpus, id_col, vec_col,
                              n_clusters, iters, dim)
    if not cents:  # empty corpus: no cells, no neighbors
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, "
                "rank long")
    tagged = _assign_clusters(corpus, id_col, vec_col, cents)

    # query -> its n_probe nearest cells, as (query_id, qv, cluster)
    cent_col = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    sims = F.transform(
        cent_col, lambda c: cosine_similarity(F.col("qv"), c))
    order = F.reverse(F.array_sort(
        F.transform(sims, lambda s, i: F.struct(
            s.alias("sim"), i.alias("cluster")))))
    probes = F.slice(order, 1, n_probe)
    q = (queries
         .select(F.col(query_id_col).alias("query_id"),
                 F.col(vec_col).alias("qv"))
         .withColumn("p", F.explode(probes))
         .select("query_id", "qv", F.col("p.cluster").alias("cluster")))

    c = tagged.select("cluster", F.col("id").alias("neighbor_id"),
                      F.col("v").alias("cv"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        F.broadcast(q).join(c, "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


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


def knn_join(corpus: DataFrame, id_col: str, vec_col: str,
             k: int = 3, n_planes: int | None = 6, tables: int = 4,
             dim: int = 64, seed: int = 42,
             target_bucket: int = 32) -> DataFrame:
    """k-NN GRAPH: approximate top-k neighbors for EVERY corpus
    vector (vs the ANN entries, whose small query set broadcasts).
    The corpus self-joins per hash table on the SRP bucket key — a
    shuffle hash join co-locating each bucket, never a broadcast —
    and exact cosine re-ranks the union of candidates.

    Exactly-once pair emission without a distinct: a pair is taken
    only from the FIRST table whose buckets collide (join on table
    t's bucket, filter that every earlier table's buckets differ),
    so the union is duplicate-free by construction and the
    dropDuplicates exchange the naive union needs disappears.

    Scale: per table the work is O(sum over buckets of bucket^2) —
    the standard LSH knn-join bound (Sarma et al., WWW 2014 class) —
    and each bucket's pairs materialize only within its shuffle
    partition. Rows whose buckets collide with nothing simply have
    no edges, the correct semantics for a near-dup/similarity graph.

    THE scale knob is ``n_planes``: bucket count is 2^n_planes per
    table, so holding it constant while the corpus grows makes
    per-bucket work grow quadratically (measured: 10x corpus at 6
    planes = 42x time; 10 planes = exactly 10x — BASELINE.md).
    ``n_planes=None`` derives it from the corpus size to hold
    ~``target_bucket`` vectors per bucket (one count() at build,
    the same dial a production LSH index turns).
    """
    if n_planes is None:
        import math
        n = corpus.count()
        n_planes = max(4, math.ceil(math.log2(max(n, 1) / target_bucket)))
    all_planes = [_hyperplanes(dim, n_planes, seed + 1000 * t)
                  for t in range(tables)]
    b = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        *[_bucket_expr(F.col(vec_col), p).alias(f"b{t}")
          for t, p in enumerate(all_planes)])
    cand = None
    for t in range(tables):
        q, c = b.alias("q"), b.alias("c")
        cond = (F.col(f"q.b{t}") == F.col(f"c.b{t}")) & \
            (F.col("q.id") != F.col("c.id"))
        for s in range(t):
            cond &= F.col(f"q.b{s}") != F.col(f"c.b{s}")
        pairs = q.join(c, cond).select(
            F.col("q.id").alias("query_id"), F.col("q.v").alias("qv"),
            F.col("c.id").alias("neighbor_id"), F.col("c.v").alias("cv"))
        cand = pairs if cand is None else cand.unionAll(pairs)
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (cand
            .withColumn("cosine", cosine_similarity(F.col("qv"),
                                                    F.col("cv")))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def knn_distance_outliers(corpus: DataFrame, id_col: str, vec_col: str,
                          k: int = 3, quantile: float = 0.95,
                          n_planes: int | None = 6, tables: int = 4,
                          dim: int = 64, seed: int = 42,
                          exact: bool = False,
                          round_dp: int | None = None) -> DataFrame:
    """Embedding-space outlier detection by k-NN distance — the
    curation screen for garbage/mislabeled/off-distribution samples
    (a vector whose k-th nearest neighbor is far away sits in no
    cluster; Bhatia et al.-style distance-based outliers restated on
    cosine). Score = 1 - cosine(v, farthest retained neighbor) from
    the SRP-LSH ``knn_join`` graph: the k-th neighbor when the bucket
    yields k, else the highest available rank (a sparse bucket with
    1..k-1 close neighbors is NOT an orphan and keeps its real
    distance). Only rows whose buckets collide with NOTHING — zero
    neighbors, the strongest outlier signal — take the sentinel 1.0.
    The flag threshold is the ``quantile`` of the scores; by default
    ``percentile_approx`` (mergeable sketch, no single-reducer buffer
    of the full corpus at 100 TB), ``exact=True`` switches to exact
    ``percentile`` so a SQL oracle can replay the value bit-for-bit
    (same dial as quality.quantile_band_filter).

    Scale: inherits knn_join's O(sum bucket^2) bound and its
    ``n_planes`` dial; everything downstream of the graph is
    id-keyed (the vectors never re-shuffle). Output:
    (id, knn_distance, is_outlier), one row per corpus vector.
    """
    graph = knn_join(corpus, id_col, vec_col, k=k, n_planes=n_planes,
                     tables=tables, dim=dim, seed=seed)
    # rank orders by desc cosine, so min(cosine) over the retained
    # top-k rows IS the farthest available neighbor (rank k when the
    # bucket yields k, the max available rank otherwise).
    kth = (graph.groupBy(F.col("query_id").alias("id"))
           .agg((1.0 - F.min("cosine")).alias("knn_distance")))
    scored = (corpus.select(F.col(id_col).alias("id"))
              .join(kth, "id", "left")
              .select("id", F.coalesce("knn_distance", F.lit(1.0))
                      .alias("knn_distance")))
    # scored feeds TWO subtrees (the threshold agg and the output
    # join) above the full kNN-graph lineage — share it or the graph
    # executes twice (measured 1.59s -> ~0.9s warm at sf0.1)
    from ..sources.registry import materialize_auto
    scored = materialize_auto(scored)
    if round_dp is not None:
        # quantize BEFORE thresholding so a cross-engine replay sees
        # the identical score multiset (scale-then-round matches
        # DuckDB's rounding bit-for-bit); summation-order ULP drift
        # in raw cosines would otherwise make the percentile boundary
        # engine-dependent
        from ..functions.numeric import rnd
        scored = scored.withColumn(
            "knn_distance", rnd("knn_distance", round_dp))
    pct = F.percentile if exact else F.percentile_approx
    thr = scored.agg(pct("knn_distance",
                         F.lit(quantile)).alias("thr"))
    return (scored.crossJoin(F.broadcast(thr))
            .select("id", "knn_distance",
                    (F.col("knn_distance") >= F.col("thr"))
                    .alias("is_outlier")))


def pq_codebooks(corpus: DataFrame, id_col: str, vec_col: str,
                 m: int = 8, ks: int = 16, iters: int = 2,
                 dim: int = 64) -> list:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    vector into ``m`` subspaces of dim/m and train an independent
    ``ks``-centroid L2 k-means per subspace. Returns a nested list
    (m x ks x d) of 1e-6-quantized centroids.

    Deterministic like the IVF build: seeds are the ``ks`` corpus
    vectors with the smallest md5(id) (each sliced per subspace),
    assignment ranks by the expanded L2 form c.c - 2*x.c with ties
    to the lowest cluster, and every update snaps to the 1e-6 grid —
    so a SQL oracle can replay the identical rounds.

    Scale: the build syncs only m*ks*d floats per round to the
    driver (kilobytes, corpus-size independent); per-round stats are
    ONE distributed pass (argmin in an Arrow batch gemm, then a
    (sub, cluster, pos)-keyed mean — m*ks*d groups). Empty cells
    keep their previous centroid.
    """
    d = dim // m
    seeds = (corpus
             .select(F.col(vec_col).cast("array<double>").alias("v"),
                     F.md5(F.col(id_col).cast("string")).alias("h"))
             .orderBy("h").limit(ks).collect())
    if not seeds:  # empty corpus: no codebooks, callers propagate empty
        return []
    if len(seeds) < ks:
        # corpus smaller than the codebook: cycle-pad the seed set
        # (deterministic; previously an unconditional reshape crash)
        seeds = [seeds[i % len(seeds)] for i in range(ks)]
    books = np.round(
        np.array([r["v"] for r in seeds], dtype=np.float64)
        .reshape(ks, m, d).transpose(1, 0, 2), 6)  # (m, ks, d)

    def assign(batches):
        import pandas as pd
        cc = np.einsum("mkd,mkd->mk", books, books)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            sub = mat.reshape(len(mat), m, d)
            cross = np.einsum("nmd,mkd->nmk", sub, books)
            codes = np.argmin(cc[None] - 2.0 * cross, axis=2)
            yield pd.DataFrame({"v": pdf["v"],
                                "codes": list(codes.astype("int32"))})

    base = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(iters):
        assigned = base.mapInPandas(
            assign, "v array<double>, codes array<int>")
        stats = (assigned
                 .select(F.posexplode("v").alias("pos", "x"), "codes")
                 .withColumn("sub",
                             F.floor(F.col("pos") / d).cast("int"))
                 .withColumn("cluster",
                             F.element_at("codes", F.col("sub") + 1))
                 .groupBy("sub", "cluster", "pos")
                 .agg(F.avg("x").alias("mx"))
                 .collect())
        nxt = books.copy()
        for r in stats:
            nxt[r["sub"], r["cluster"], r["pos"] % d] = np.round(r["mx"], 6)
        books = nxt
    return books.tolist()


def pq_code_expr(vec: Column, books: list) -> Column:
    """codes array<int>: per subspace, the argmin-L2 codebook entry,
    as a pure JVM expression (ranked by c.c - 2*x.c; ties to the
    lowest cluster via struct-min). ``books`` is pq_codebooks output.
    """
    m = len(books)
    d = len(books[0][0])
    codes = []
    for j in range(m):
        sv = F.slice(vec, j * d + 1, d)
        entries = []
        for cidx, cent in enumerate(books[j]):
            cc = 0.0
            for x in cent:
                cc += float(x) * float(x)
            clit = F.array(*[F.lit(float(x)) for x in cent])
            entries.append(F.struct(
                (F.lit(cc) - 2.0 * dot(sv, clit)).alias("dist"),
                F.lit(cidx).alias("cluster")))
        codes.append(F.array_min(F.array(*entries))["cluster"])
    return F.array(*codes)


def pq_xhat_expr(codes: Column, books: list) -> Column:
    """Reconstructed vector from PQ codes: concat of the selected
    centroid per subspace (the codebook rides as a literal —
    m*ks*d doubles, kilobytes)."""
    blit = F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in cent])
                  for cent in book])
        for book in books])
    return F.flatten(F.transform(
        codes, lambda c, j: F.element_at(F.element_at(blit, j + 1), c + 1)))


def pq_topk(corpus: DataFrame, queries: DataFrame,
            id_col: str, vec_col: str, k: int = 10,
            m: int = 8, ks: int = 16, iters: int = 2, dim: int = 64,
            shortlist: int = 40,
            query_id_col: str | None = None) -> DataFrame:
    """Approximate cosine top-k via product quantization + exact
    refine — the memory-scale ANN path: the corpus persists as
    m log2(ks)-bit codes (8 bytes/vector here vs 512 raw), ADC
    scoring ranks ALL rows against the reconstructed vectors, and
    only the ``shortlist`` best per query fetch their full-precision
    vector for the exact re-rank.

    Plan: encode + reconstruct are scan-local expressions; scoring
    is a broadcast of the (small) query set across the code scan —
    no corpus shuffle; the refine join touches |queries|*shortlist
    rows. All arithmetic is deterministic (1e-6 codebooks, tie-break
    on neighbor id), so a SQL oracle value-verifies end to end.
    """
    query_id_col = query_id_col or id_col
    books = pq_codebooks(corpus, id_col, vec_col, m, ks, iters, dim)
    if not books:  # empty corpus
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, "
                "rank long")
    v = F.col(vec_col).cast("array<double>")
    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        pq_xhat_expr(pq_code_expr(v, books), books).alias("xhat"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       v.alias("qv"))
    ws = W.partitionBy("query_id").orderBy(F.desc("adc"), "neighbor_id")
    short = (F.broadcast(q).crossJoin(enc)
             .where(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("adc", cosine_similarity(F.col("qv"),
                                                  F.col("xhat")))
             .withColumn("rn", F.row_number().over(ws))
             .where(F.col("rn") <= shortlist)
             .select("query_id", "qv", "neighbor_id"))
    full = corpus.select(F.col(id_col).alias("neighbor_id"),
                         v.alias("cv"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (short.join(full, "neighbor_id")
            .withColumn("cosine",
                        cosine_similarity(F.col("qv"), F.col("cv")))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def margin_topk(left: DataFrame, right: DataFrame, id_col: str,
                vec_col: str, k: int = 4, m: int = 20) -> DataFrame:
    """Ratio-margin candidate pair mining between two embedding
    corpora (Artetxe & Schwenk, "Margin-based Parallel Corpus
    Mining with Multilingual Sentence Embeddings", ACL 2019) — the
    standard bitext/near-pair miner: raw cosine over-selects pairs
    in dense neighborhoods, so each candidate's cosine is normalized
    by the average cosine of both endpoints' k-NN neighborhoods:

        margin(x, y) = cos(x, y)
                       / ((avgNN_k(x -> right) + avgNN_k(y -> left)) / 2)

    Returns the global top-``m`` pairs
    (src_id, tgt_id, cosine, margin, rank), margin-descending with
    (src_id, tgt_id) tie-break. Candidates are the left->right k-NN
    pairs, so every pair's margin uses both directions' neighborhood
    statistics but only |left| * k candidates are ever scored.

    Scale shape: two brute-force k-NN passes (each broadcasts the
    query side over one scan of the other — swap in srp_lsh_topk /
    ivf_topk when neither side fits a broadcast), two k-row-per-query
    aggregates, two broadcast joins, and a distributed top-m
    (sort+limit plans as TakeOrderedAndProject: per-partition heaps,
    no global sort); the final rank window runs over the m collected
    survivors only."""
    ab = brute_force_topk(right, left, id_col, vec_col, k=k)
    ba = brute_force_topk(left, right, id_col, vec_col, k=k)
    a_avg = ab.groupBy("query_id").agg(F.avg("cosine").alias("__a_avg"))
    b_avg = ba.groupBy("query_id").agg(F.avg("cosine").alias("__b_avg"))
    cand = (ab.select(F.col("query_id").alias("src_id"),
                      F.col("neighbor_id").alias("tgt_id"), "cosine")
            .join(F.broadcast(a_avg.withColumnRenamed("query_id", "src_id")),
                  "src_id")
            .join(F.broadcast(b_avg.withColumnRenamed("query_id", "tgt_id")),
                  "tgt_id")
            .withColumn("margin",
                        F.col("cosine")
                        / ((F.col("__a_avg") + F.col("__b_avg")) / 2)))
    top = (cand.orderBy(F.desc("margin"), "src_id", "tgt_id").limit(m)
           .drop("__a_avg", "__b_avg"))
    w = W.orderBy(F.desc("margin"), "src_id", "tgt_id")
    return (top.withColumn("rank", F.row_number().over(w).cast("long"))
            .select("src_id", "tgt_id", "cosine", "margin", "rank"))
