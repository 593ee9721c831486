"""Property tests for the extended-r7 operators: prefix-filter
similarity join, triangle census, HyperLogLog, label propagation.
Each is checked against a brute-force or pure-Python reference on
randomized inputs (seeded), independent of the DuckDB oracle gate."""

from __future__ import annotations

import hashlib
import itertools
import random

import pytest
from pyspark.sql import functions as F


def _random_sets(seed: int, n_ids: int, universe: int, lo: int, hi: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n_ids):
        size = rng.randint(lo, hi)
        toks = rng.sample(range(universe), size)
        rows += [(i, f"t{t}") for t in toks]
    # plant near-duplicate pairs (high overlap)
    base = rng.sample(range(universe), 30)
    for j, drop in ((n_ids, 1), (n_ids + 1, 3)):
        keep = base[drop:]
        rows += [(j, f"t{t}") for t in keep]
    rows += [(n_ids + 2, f"t{t}") for t in base]
    return rows


class TestPrefixFilterPairs:
    @pytest.mark.parametrize("threshold", [0.4, 0.6, 0.8])
    def test_equals_exhaustive_inverted_index(self, spark, threshold):
        """AllPairs' correctness claim: prefix indexing + length +
        positional filters lose NOTHING vs the full inverted index."""
        from data_platform_copilot_spark.operators.dedup import (
            jaccard_pairs,
            prefix_filter_pairs,
        )
        rows = _random_sets(seed=7, n_ids=40, universe=120, lo=8, hi=25)
        sh = spark.createDataFrame(rows, ["id", "shingle"]).distinct()
        exhaustive = {
            (r.id_a, r.id_b, r.common)
            for r in jaccard_pairs(sh, threshold=threshold,
                                   max_shingle_freq=None).collect()
        }
        prefix = {
            (r.id_a, r.id_b, r.common)
            for r in prefix_filter_pairs(sh, threshold=threshold).collect()
        }
        assert prefix == exhaustive
        assert prefix  # the planted near-dups must be found

    def test_planted_pair_found_at_high_threshold(self, spark):
        from data_platform_copilot_spark.operators.dedup import (
            prefix_filter_pairs,
        )
        rows = _random_sets(seed=11, n_ids=20, universe=90, lo=8, hi=20)
        sh = spark.createDataFrame(rows, ["id", "shingle"]).distinct()
        got = prefix_filter_pairs(sh, threshold=0.85).collect()
        pairs = {(r.id_a, r.id_b) for r in got}
        assert (20, 22) in pairs  # 29/30 overlap = 0.9666


class TestTriangleStats:
    def _stats(self, spark, edges):
        from data_platform_copilot_spark.operators.graph import (
            triangle_stats,
        )
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        return triangle_stats(df).first()

    def test_k4_plus_tail(self, spark):
        """K4 has 4 triangles and 12 wedges; a pendant vertex adds
        2 wedges (degree 1 at the tail, +1 at the attachment)."""
        k4 = list(itertools.combinations(range(4), 2))
        got = self._stats(spark, k4 + [(3, 9)])
        assert got.n_vertices == 5 and got.n_edges == 7
        assert got.n_triangles == 4
        # degrees: 3,3,3,4,1 -> wedges = 3+3+3+6+0 = 15
        assert got.n_wedges == 15
        assert got.transitivity == round(12 / 15, 4)

    def test_random_graph_equals_bruteforce(self, spark):
        rng = random.Random(3)
        n = 40
        edges = [(a, b) for a in range(n) for b in range(a + 1, n)
                 if rng.random() < 0.12]
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        brute = sum(1 for a, b, c in itertools.combinations(range(n), 3)
                    if b in adj[a] and c in adj[a] and c in adj[b])
        got = self._stats(spark, edges + [(b, a) for a, b in edges[:5]])
        assert got.n_triangles == brute
        assert got.n_edges == len(edges)

    def test_triangle_free_graph(self, spark):
        star = [(0, i) for i in range(1, 8)]
        got = self._stats(spark, star)
        assert got.n_triangles == 0 and got.transitivity == 0.0


class TestHllCardinality:
    def _pure_python(self, values, b=8):
        m = 1 << b
        regs = {}
        for v in values:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
            bucket, w = h >> 24, h & 0xFFFFFF
            rho = 25 - w.bit_length() if w else 25
            regs[bucket] = max(regs.get(bucket, 0), rho)
        s = sum(1 << (25 - r) for r in regs.values())
        s += (m - len(regs)) * (1 << 25)
        return len(regs), s, sum(k * r for k, r in regs.items())

    def test_registers_match_pure_python(self, spark):
        from data_platform_copilot_spark.operators.selection import (
            hll_cardinality,
        )
        rng = random.Random(5)
        vals = [rng.randint(0, 10 ** 9) for _ in range(4000)]
        df = spark.createDataFrame([(v,) for v in vals], ["x"])
        got = hll_cardinality(df, "x").first()
        nz, s, checksum = self._pure_python(set(vals))
        assert got.nonzero_registers == nz
        assert got.s_scaled == s
        assert got.register_checksum == checksum
        assert got.n_exact == len(set(vals))
        assert got.within_3sigma

    def test_duplicates_do_not_change_registers(self, spark):
        from data_platform_copilot_spark.operators.selection import (
            hll_cardinality,
        )
        base = [(i % 500,) for i in range(5000)]
        df = spark.createDataFrame(base, ["x"])
        dedup = spark.createDataFrame([(i,) for i in range(500)], ["x"])
        a = hll_cardinality(df, "x").first()
        b = hll_cardinality(dedup, "x").first()
        assert a.s_scaled == b.s_scaled
        assert a.register_checksum == b.register_checksum


class TestLabelPropagation:
    def test_two_round_chain(self, spark):
        """seed(0) -> 1 -> 2: node 1 labels in round 1, node 2 only
        in round 2; the seed never changes."""
        from data_platform_copilot_spark.operators.graph import (
            label_propagation,
        )
        edges = spark.createDataFrame(
            [(1, 0), (2, 1)], ["query_id", "neighbor_id"])
        seeds = spark.createDataFrame([(0, 7)], ["vec_id", "label"])
        got = {r.vec_id: (r.label, r.round_assigned)
               for r in label_propagation(edges, seeds, rounds=2).collect()}
        assert got == {0: (7, 0), 1: (7, 1), 2: (7, 2)}

    def test_majority_and_tiebreak(self, spark):
        from data_platform_copilot_spark.operators.graph import (
            label_propagation,
        )
        edges = spark.createDataFrame(
            [(10, 0), (10, 1), (10, 2), (11, 3), (11, 4)],
            ["query_id", "neighbor_id"])
        seeds = spark.createDataFrame(
            [(0, 5), (1, 5), (2, 9), (3, 8), (4, 2)],
            ["vec_id", "label"])
        got = {r.vec_id: r.label
               for r in label_propagation(edges, seeds, rounds=1).collect()}
        assert got[10] == 5   # majority 2:1
        assert got[11] == 2   # 1:1 tie -> lowest label


class TestKnnDistanceOutliers:
    """Planted-outlier recovery: two tight cosine clusters + isolated
    vectors; the isolates must carry the top k-NN distances and the
    quantile flag must recover exactly them."""

    def _corpus(self, spark):
        import math
        import random

        rng = random.Random(11)
        dim = 64

        def unit(v):
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v]

        c1 = unit([rng.gauss(0, 1) for _ in range(dim)])
        c2 = unit([rng.gauss(0, 1) for _ in range(dim)])
        rows = []
        for i in range(40):  # cluster members: tiny jitter -> cosine ~1
            base = c1 if i % 2 == 0 else c2
            rows.append((i, unit([b + rng.gauss(0, 0.01) for b in base])))
        for j in range(40, 44):  # isolates: independent random dirs
            rows.append((j, unit([rng.gauss(0, 1) for _ in range(dim)])))
        return spark.createDataFrame(rows, "vec_id long, v array<double>")

    @pytest.mark.slow
    def test_planted_isolates_flagged(self, spark):
        from data_platform_copilot_spark.operators.similarity import (
            knn_distance_outliers)

        out = knn_distance_outliers(
            self._corpus(spark), "vec_id", "v",
            k=3, quantile=44 / 44 - 4 / 44,  # flag the top 4 scores
            n_planes=4, tables=4, exact=True).collect()
        assert len(out) == 44
        scores = {r["id"]: r["knn_distance"] for r in out}
        flagged = {r["id"] for r in out if r["is_outlier"]}
        # every isolate scores above every cluster member
        worst_member = max(scores[i] for i in range(40))
        best_isolate = min(scores[j] for j in range(40, 44))
        assert best_isolate > worst_member
        assert flagged == {40, 41, 42, 43}
        # the scale default (percentile_approx sketch) may pick a data
        # value at-or-below the exact quantile, flagging a boundary
        # row extra — but never misses a planted isolate
        approx_flagged = {r["id"] for r in knn_distance_outliers(
            self._corpus(spark), "vec_id", "v",
            k=3, quantile=44 / 44 - 4 / 44,
            n_planes=4, tables=4).collect() if r["is_outlier"]}
        assert {40, 41, 42, 43} <= approx_flagged
        assert len(approx_flagged) <= 6

    def test_bucket_orphans_score_one(self, spark):
        from data_platform_copilot_spark.operators.similarity import (
            knn_distance_outliers)

        # with many planes the isolates collide with nothing: no
        # neighbors at all -> the documented score-1.0 path
        out = {r["id"]: r["knn_distance"]
               for r in knn_distance_outliers(
                   self._corpus(spark), "vec_id", "v",
                   k=3, quantile=0.9, n_planes=10, tables=2).collect()}
        assert any(v == 1.0 for v in out.values())

    def test_sparse_bucket_uses_max_available_rank(self, spark):
        """A vector with SOME but fewer than k neighbors keeps its
        real farthest-neighbor distance; the 1.0 sentinel is reserved
        for zero-neighbor orphans (r8 advice: sparse bucket != orphan,
        the old rank==k filter over-flagged it as maximal)."""
        import math

        from data_platform_copilot_spark.operators.similarity import (
            knn_distance_outliers)

        dim = 64

        def unit(v):
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v]

        # a 2-vector corpus: each row has exactly ONE possible
        # neighbor, so with k=3 every row is a sparse bucket.
        a = unit([1.0] * dim)
        b = unit([1.0] * (dim - 1) + [3.0])  # close to a, cosine >.9
        df = spark.createDataFrame([(0, a), (1, b)],
                                   "vec_id long, v array<double>")
        out = {r["id"]: r["knn_distance"]
               for r in knn_distance_outliers(
                   df, "vec_id", "v", k=3, quantile=0.5,
                   n_planes=1, tables=1).collect()}
        assert out[0] < 0.1 and out[1] < 0.1  # real distances, not 1.0
