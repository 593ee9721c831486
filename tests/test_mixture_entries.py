"""Pure-python replays of the mixture-design entries (r7): a third
verification source independent of both Spark and the DuckDB oracle.
Each test builds a small seeded corpus, runs the registry entry on
it, and checks every output value against a from-scratch python
computation of the documented semantics."""

from __future__ import annotations

import hashlib
import math
import random
import re
from collections import Counter, defaultdict

import pytest

from data_platform_copilot_spark.queries import QUERIES

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
         "eta", "theta", "iota", "kappa"]


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _toks(text: str) -> list[str]:
    return _norm(text).split(" ")


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """A seeded 90-doc corpus over 3 sources with skewed sizes and
    planted cross-source span duplication, written as documents.parquet."""
    rng = random.Random(1234)
    rows = []
    doc_id = 0
    for source, n_docs in (("web", 50), ("books", 30), ("code", 10)):
        for _ in range(n_docs):
            n = rng.randint(3, 40)
            words = [rng.choice(WORDS) for _ in range(n)]
            rows.append((doc_id, " ".join(words), "en", source,
                         len(" ".join(words))))
            doc_id += 1
    # plant an identical 10-token span in one web and one books doc
    span = " ".join(WORDS)
    rows[0] = (rows[0][0], span + " " + rows[0][1], "en", "web",
               len(span) + 1 + len(rows[0][1]))
    rows[50] = (rows[50][0], span + " " + rows[50][1], "en", "books",
                len(span) + 1 + len(rows[50][1]))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = tmp_path_factory.mktemp("mixture_corpus")
    df.coalesce(1).write.parquet(str(out / "documents.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def corpus_rows(corpus_dir, spark):
    df = spark.read.parquet(corpus_dir + "/documents.parquet")
    return [(r.doc_id, r.text, r.source) for r in df.collect()]


def test_doc_length_percentiles_replay(spark, corpus_dir, corpus_rows):
    got = {r.source: r for r in
           QUERIES["doc_length_percentiles_by_source"](
               spark, corpus_dir).collect()}
    by_source = defaultdict(list)
    for _, text, source in corpus_rows:
        by_source[source].append(len(_toks(text)))
    assert set(got) == set(by_source)
    for source, lengths in by_source.items():
        lengths.sort()
        n = len(lengths)
        row = got[source]
        assert row.n_docs == n
        assert row.min_tokens == lengths[0]
        assert row.max_tokens == lengths[-1]
        # nearest-rank: smallest value whose cumulative count >= ceil(p*n)
        assert row.p50_tokens == lengths[math.ceil(0.5 * n) - 1]
        assert row.p90_tokens == lengths[math.ceil(0.9 * n) - 1]
        assert row.p99_tokens == lengths[math.ceil(0.99 * n) - 1]


def test_ngram_diversity_replay(spark, corpus_dir, corpus_rows):
    got = {r.source: r for r in
           QUERIES["ngram_diversity_by_source"](
               spark, corpus_dir).collect()}
    for source in {s for _, _, s in corpus_rows}:
        texts = [t for _, t, s in corpus_rows if s == source]
        for n, col in ((1, "unigram_ttr"), (2, "bigram_ttr"),
                       (3, "trigram_ttr")):
            grams = Counter()
            for t in texts:
                toks = _toks(t)
                for i in range(len(toks) - n + 1):
                    grams[" ".join(toks[i:i + n])] += 1
            total = sum(grams.values())
            expected = round(len(grams) / total * 1e6) / 1e6
            assert abs(getattr(got[source], col) - expected) < 1e-9, \
                (source, col)
        assert got[source].n_tokens == sum(
            len(_toks(t)) for t in texts)


def test_domain_js_replay(spark, corpus_dir, corpus_rows):
    got = {(r.s1, r.s2): r for r in
           QUERIES["domain_unigram_js"](spark, corpus_dir).collect()}
    dists = {}
    for source in {s for _, _, s in corpus_rows}:
        c = Counter()
        for _, t, s in corpus_rows:
            if s == source:
                c.update(_toks(t))
        total = sum(c.values())
        dists[source] = {tok: n / total for tok, n in c.items()}
    names = sorted(dists)
    for i, s1 in enumerate(names):
        for s2 in names[i + 1:]:
            p, q = dists[s1], dists[s2]
            union = set(p) | set(q)
            js = 0.0
            for tok in union:
                a, b = p.get(tok, 0.0), q.get(tok, 0.0)
                if a > 0:
                    js += 0.5 * a * math.log(2 * a / (a + b))
                if b > 0:
                    js += 0.5 * b * math.log(2 * b / (a + b))
            row = got[(s1, s2)]
            assert row.n_union_tokens == len(union)
            assert row.n_shared_tokens == len(set(p) & set(q))
            assert abs(row.js_divergence - js) < 0.005 + 1e-9


def test_training_order_interleave_replay(spark, corpus_dir,
                                          corpus_rows):
    got = {(r.source, r.decile): r for r in
           QUERIES["training_order_interleave"](
               spark, corpus_dir).collect()}
    counts = Counter(s for _, _, s in corpus_rows)
    # largest-remainder apportionment of 1e6 over n^0.7
    wts = {s: n ** 0.7 for s, n in counts.items()}
    tot_w = sum(wts.values())
    quotas = {s: 1_000_000 * w / tot_w for s, w in wts.items()}
    base = {s: math.floor(q) for s, q in quotas.items()}
    leftover = 1_000_000 - sum(base.values())
    order = sorted(quotas, key=lambda s: (-(quotas[s] - base[s]), s))
    share = {s: max(base[s] + (1 if i < leftover else 0), 1)
             for i, s in enumerate(order)}
    # md5-ranked stride schedule
    by_source = defaultdict(list)
    for doc_id, _, s in corpus_rows:
        by_source[s].append(doc_id)
    keyed = []
    for s, ids in by_source.items():
        ids.sort(key=lambda d: (hashlib.md5(str(d).encode())
                                .hexdigest(), d))
        for rn, _ in enumerate(ids, start=1):
            keyed.append((rn * 1_000_000 // share[s], s, rn))
    keyed.sort()
    total = len(keyed)
    expected = Counter()
    first = {}
    for gpos, (_, s, _) in enumerate(keyed, start=1):
        d = (gpos - 1) * 10 // total
        expected[(s, d)] += 1
        first.setdefault((s, d), gpos)
    assert {k: v.n_docs for k, v in got.items()} == dict(expected)
    for k, v in got.items():
        assert v.first_pos == first[k]
    # schedule invariant: every doc scheduled exactly once
    assert sum(v.n_docs for v in got.values()) == total


def test_cross_source_matrix_replay(spark, corpus_dir, corpus_rows):
    got = {(r.s1, r.s2): r for r in
           QUERIES["dedup_cross_source_matrix"](
               spark, corpus_dir).collect()}
    span_counts = defaultdict(Counter)  # fingerprint -> source -> n
    for _, text, source in corpus_rows:
        toks = _toks(text)
        for s in range(0, max(len(toks), 1), 10):
            span_counts[" ".join(toks[s:s + 10])][source] += 1
    pairs = Counter()
    groups = Counter()
    for counts in span_counts.values():
        for s1, n1 in counts.items():
            for s2, n2 in counts.items():
                if s1 < s2:
                    pairs[(s1, s2)] += n1 * n2
                    groups[(s1, s2)] += 1
                elif s1 == s2 and n1 > 1:
                    pairs[(s1, s1)] += n1 * (n1 - 1) // 2
                    groups[(s1, s1)] += 1
    expected = {k: v for k, v in pairs.items() if v > 0}
    assert {k: v.dup_pairs for k, v in got.items()} == expected
    for k, v in got.items():
        assert v.n_shared_groups == groups[k]
    # the planted cross-source span must surface
    assert got[("books", "web")].dup_pairs >= 1
