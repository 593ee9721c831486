"""Repetition-based quality signals (the Gopher/C4 pretraining
filters: MassiveText's repetition rules, Rae et al. 2021 §A1.1).

Per document:
- ``top_token_share``   — most frequent token's share of all tokens
- ``top_bigram_share``  — most frequent word 2-gram's share
- ``dup_trigram_frac``  — fraction of 3-gram INSTANCES that are
                          repeats of an earlier one (1 - distinct/total)

High values mark degenerate/boilerplate text (keyword stuffing, menu
dumps, repeated paragraphs) that repetition filters drop before
training.

Shape: ONE explode emits (id, kind, gram) for all three gram kinds
(unigram/bigram/trigram slices built by zipping shifted token-array
views — fixed cost per row, stays in codegen until the explode), then
ONE groupBy(id, kind, gram) whose output rows are per-doc distinct
grams, then ONE groupBy(id) folds the three signals out of
conditional aggregates. Two shuffles total, both keyed on uniform
(id, gram) / (id); no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens
from ..sources.registry import spread


def _grams(toks: Column, n: int, kind: int) -> Column:
    """array<struct<k,g>> of the row's word n-grams (non-distinct)."""
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, width).alias(f"t{i}") for i in range(n)]
    return F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.struct(
            F.lit(kind).alias("k"),
            F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]).alias("g")))


# PII patterns shared with the oracle — RE2-compatible (no lookarounds)
# so Java regex (Spark) and RE2 (DuckDB) agree on every match.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\+?[0-9][0-9-]{6,}[0-9]",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Append per-kind PII counts and a redacted text column.

    The scrubbing pass every pretraining pipeline runs before
    training: emails, phone numbers and IPs are replaced by typed
    placeholders (<EMAIL>/<PHONE>/<IP>), counts per kind kept for
    filtering/reporting. Pure regexp expressions — codegen'd, zero
    shuffle, linear scan. Redaction order is email -> phone -> ip
    (fixed, since the patterns could otherwise nest).
    """
    # Counts are taken on the PROGRESSIVELY redacted string (count kind
    # k after replacing kinds before it), so each count equals the
    # number of replacements actually made — counting on the original
    # would double-count e.g. the digit run inside an already-redacted
    # email as a phone.
    out = df
    red = F.col(text_col)
    for kind in ("email", "phone", "ip"):
        out = out.withColumn(
            f"n_{kind}s",
            F.size(F.regexp_extract_all(
                red, F.lit(PII_PATTERNS[kind]), 0)).cast("long"))
        red = F.regexp_replace(red, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out.withColumn("redacted", red)


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 128,
                    overlap: int = 16) -> DataFrame:
    """Split documents into overlapping token windows (the
    context-length chunking step before tokenization/packing).

    Output: (id, chunk_idx, start_token, n_tokens, chunk_text) — one
    row per window; windows start every ``chunk_tokens - overlap``
    tokens, the last may be short. Pure expressions + one explode:
    embarrassingly parallel, no shuffle, linear in corpus size.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(normalize_text(F.col(text_col)), " ")
    out = (
        spread(df)
        .where(F.size(toks) >= 1)
        .select(F.col(id_col).alias("id"), toks.alias("t"))
        .select("id", "t",
                F.explode(F.sequence(F.lit(1), F.size("t"),
                                     F.lit(step))).alias("start"))
        .select(
            "id",
            ((F.col("start") - 1) / step).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start_token"),
            F.slice("t", F.col("start"), chunk_tokens).alias("chunk"))
    )
    return out.select(
        "id", "chunk_idx", "start_token",
        F.size("chunk").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
    )


def pack_chunks(chunks: DataFrame, id_col: str, idx_col: str,
                tokens_col: str, capacity: int = 512,
                shards: int = 8) -> DataFrame:
    """Concat-and-cut sequence packing: assign every chunk a training
    bin so each bin holds ``capacity`` tokens (the packing step that
    turns chunked documents into fixed-length training sequences —
    concatenate in order, cut every ``capacity`` tokens).

    Chunks hash into ``shards`` independent streams (md5-derived so
    any engine reproduces the assignment); within a shard a window
    cumsum gives each chunk its token offset and bin = offset div
    capacity. One shuffle, keyed on the shard; each shard packs
    sequentially (the operation is order-defined) but shards pack in
    parallel — at 100 TB, shards = O(cluster cores) keeps every task
    busy while preserving a deterministic, reproducible packing.
    """
    from pyspark.sql import Window as W
    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6),
                    16, 10).cast("long") % shards)
    w = (W.partitionBy("shard").orderBy(id_col, idx_col)
         .rowsBetween(W.unboundedPreceding, -1))
    return (
        chunks
        .withColumn("shard", shard)
        .withColumn("token_offset",
                    F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
                    .cast("long"))
        .withColumn("bin",
                    F.floor(F.col("token_offset") / capacity).cast("long"))
    )


def repetition_signals(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """(id, top_token_share, top_bigram_share, dup_trigram_frac).

    Documents shorter than 3 tokens yield NULL for the signals whose
    gram kind they cannot form (matching the SQL oracle's empty
    position ranges).
    """
    # r14: tokenize once into a projected column — the three _grams
    # builders reference the token array ~10 times between them and
    # their lambdas exempt the tree from codegen subexpression
    # elimination, so the inlined form re-tokenized per reference.
    toked = spread(df).select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks"))
    toks = F.col("__toks")
    exploded = (
        toked.where(F.size(toks) >= 1)
        .select("id",
                F.explode(F.concat(_grams(toks, 1, 1),
                                   _grams(toks, 2, 2),
                                   _grams(toks, 3, 3))).alias("s"))
        .select("id", F.col("s.k").alias("k"), F.col("s.g").alias("g"))
    )
    freq = exploded.groupBy("id", "k", "g").agg(F.count("*").alias("c"))

    def _of(kind: int, col: Column) -> Column:
        return F.when(F.col("k") == kind, col)

    return (
        freq.groupBy("id").agg(
            (F.max(_of(1, F.col("c"))).cast("double")
             / F.sum(_of(1, F.col("c")))).alias("top_token_share"),
            (F.max(_of(2, F.col("c"))).cast("double")
             / F.sum(_of(2, F.col("c")))).alias("top_bigram_share"),
            (F.lit(1.0)
             - F.count(_of(3, F.lit(1))).cast("double")
             / F.sum(_of(3, F.col("c")))).alias("dup_trigram_frac"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "a", "in", "that",
                    "have", "with")


def gopher_quality_filter(df: DataFrame, id_col: str, text_col: str,
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_ratio: float = 0.1,
                          min_alpha_word_frac: float = 0.8,
                          min_stopwords: int = 2) -> DataFrame:
    """Gopher-style document quality filter (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): the rule ensemble web-scale LM pipelines
    apply before training. Defaults are the paper's thresholds; every
    rule is a pure JVM expression over the token array (one scan, no
    shuffle, no UDF), so the filter runs at wire speed and pushes
    into codegen.

    Rules (each surfaced as its own boolean so curation can audit WHY
    a doc dropped, plus the conjunction as ``keep``):
    - ``ok_word_count``:    min_words <= n <= max_words
    - ``ok_mean_word_len``: mean token length in [min, max]
    - ``ok_symbol_ratio``:  ('#' + '...') occurrences / n <= max
    - ``ok_alpha_words``:   frac of tokens containing a letter >= min
    - ``ok_stopwords``:     distinct stopword hits >= min_stopwords
    """
    # r14 layered projections (guide §4 per-row work): normalize ONCE,
    # tokenize ONCE, then fold each signal ONCE. Inlined, the token
    # chain was referenced by two higher-order functions plus five
    # plain expressions and the mean re-derived for both its output
    # column and its rule — the lambdas exempt those trees from
    # codegen subexpression elimination, so every reference
    # re-tokenized the row. Arithmetic is expression-identical —
    # bit-equal doubles, same oracle hashes.
    base = df.select(F.col(id_col),
                     normalize_text(F.col(text_col)).alias("__norm"))
    toked = base.select(F.col(id_col), "__norm",
                        F.split(F.col("__norm"), " ").alias("__toks"))
    toks = F.col("__toks")
    norm = F.col("__norm")
    n = F.size(toks)
    sig = toked.select(
        F.col(id_col),
        n.alias("__n"),
        (F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
         .cast("double") / n).alias("__mean_len"),
        (F.length(norm) - F.length(F.replace(norm, F.lit("#")))
         + F.regexp_count(norm, F.lit(r"\.\.\."))).alias("__symbols"),
        (F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
         .cast("double") / n).alias("__alpha_frac"),
        F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
        .alias("__stop_hits"))
    nn = F.col("__n")
    mean_len = F.col("__mean_len")
    out = sig.select(
        F.col(id_col),
        nn.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        ((nn >= min_words) & (nn <= max_words)).alias("ok_word_count"),
        ((mean_len >= min_mean_word_len)
         & (mean_len <= max_mean_word_len)).alias("ok_mean_word_len"),
        ((F.col("__symbols").cast("double") / nn) <= max_symbol_ratio)
            .alias("ok_symbol_ratio"),
        (F.col("__alpha_frac") >= min_alpha_word_frac)
            .alias("ok_alpha_words"),
        (F.col("__stop_hits") >= min_stopwords).alias("ok_stopwords"),
    )
    return out.withColumn(
        "keep",
        F.col("ok_word_count") & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio") & F.col("ok_alpha_words")
        & F.col("ok_stopwords"))


def decontaminate(df: DataFrame, id_col: str, text_col: str,
                  eval_df: DataFrame, eval_id_col: str,
                  eval_text_col: str, n: int = 13) -> DataFrame:
    """Benchmark decontamination by n-gram overlap (the GPT-3
    appendix-C rule, Brown et al. 2020: flag any training document
    sharing a 13-gram with an evaluation set). Returns one row per
    training doc: (id, n_hit_ngrams, contaminated).

    Both sides reuse the dedup shingle builder (distinct word
    n-grams per doc, built in-row before the explode) and compare
    md5 fingerprints, so the check is engine-portable.

    Scale: eval sets are benchmark-sized (thousands of docs — tiny
    against a 100 TB corpus), so the distinct eval-gram set is
    BROADCAST and the corpus side never shuffles its gram stream:
    explode -> broadcast-hash semi-ish join -> groupBy doc_id on
    only the HITS (near-empty for a clean corpus). Docs shorter
    than n words emit no grams and report 0 hits.
    """
    from .dedup import shingles

    eval_fps = (shingles(eval_df, eval_id_col, eval_text_col, n=n)
                .select(F.md5("shingle").alias("fp")).distinct())
    hits = (shingles(df, id_col, text_col, n=n)
            .select(F.col("id"), F.md5("shingle").alias("fp"))
            .join(F.broadcast(eval_fps), "fp")
            .groupBy("id").agg(F.count("*").alias("n_hit_ngrams")))
    return (df.select(F.col(id_col).alias("id"))
            .join(hits, "id", "left")
            .select(
                "id",
                F.coalesce("n_hit_ngrams", F.lit(0)).alias("n_hit_ngrams"))
            .withColumn("contaminated", F.col("n_hit_ngrams") > 0))


def decontaminate_fuzzy(df: DataFrame, id_col: str, text_col: str,
                        eval_df: DataFrame, eval_id_col: str,
                        eval_text_col: str, n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Near-duplicate benchmark decontamination: flag a training doc
    when its n-gram-shingle Jaccard similarity to ANY eval doc
    reaches ``threshold`` — the fuzzy complement of the exact
    13-gram rule (verbatim-overlap checks miss lightly-edited eval
    copies; near-dup contamination is the documented failure mode
    the dedup literature warns about, Lee et al. 2021 §6).

    Returns one row per training doc:
    (id, n_eval_matches, max_jaccard, contaminated).

    Scale: the eval shingle set is benchmark-sized -> BROADCAST; the
    corpus gram stream never shuffles against it. Both shingle-set
    sizes are map-only ``size(shingle_array(...))`` expressions (no
    groupBy, no subtree reuse of the exploded stream), so the only
    keyed exchanges are the per-(train, eval) common count, the
    size-join on hit docs, and the per-doc fold — all over HIT rows
    only (near-empty for a clean corpus). Jaccard is
    common / (size_a + size_b - common) over distinct shingles —
    integer inputs, one division, so both engines compute
    bit-identical doubles and the threshold/max agree exactly.
    """
    from .dedup import shingle_array, shingles

    sh_c = shingles(df, id_col, text_col, n=n)
    sh_e = (shingles(eval_df, eval_id_col, eval_text_col, n=n)
            .withColumnsRenamed({"id": "eid"}))
    esizes = eval_df.select(
        F.col(eval_id_col).alias("eid"),
        F.size(shingle_array(F.col(eval_text_col), n)).alias("esize"))
    # spread: the per-row shingle_array size pass is CPU-heavy and
    # the testdata scan is a single unsplittable row group
    csizes = spread(df).select(
        F.col(id_col).alias("id"),
        F.size(shingle_array(F.col(text_col), n)).alias("csize"))
    common = (sh_c.join(F.broadcast(sh_e), "shingle")
              .groupBy("id", "eid").agg(F.count("*").alias("common")))
    jac = (common
           .join(F.broadcast(esizes), "eid")
           .join(csizes, "id")
           .withColumn("jaccard",
                       F.col("common")
                       / (F.col("csize") + F.col("esize")
                          - F.col("common")))
           .where(F.col("jaccard") >= threshold))
    per_doc = jac.groupBy("id").agg(
        F.count("*").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"))
    return (df.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select(
                "id",
                F.coalesce("n_eval_matches", F.lit(0)).cast("long")
                .alias("n_eval_matches"),
                "max_jaccard")
            .withColumn("contaminated", F.col("n_eval_matches") > 0))


def positional_kgrams(df: DataFrame, id_col: str, text_col: str,
                      k: int) -> DataFrame:
    """(id, pos, fp): md5 of every word k-gram WITH its 0-based token
    offset — the positional sibling of ``dedup.shingles`` (which
    dedupes in-row and drops offsets). Built by zipping k shifted
    slices of the token array (k fixed-cost slices per row), then one
    posexplode; docs shorter than k tokens emit nothing."""
    # r14: token array layered as a projection column — inlined, the
    # k+2 references below re-tokenized the row k+2 times (the lambda
    # exempts this tree from codegen subexpression elimination).
    toked = spread(df).select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks"))
    toks = F.col("__toks")
    width = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    shifted = [F.slice(toks, i + 1, width).alias(f"t{i}") for i in range(k)]
    sh = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(k)]))
    grams = F.when(F.size(toks) >= k, sh).otherwise(
        F.array().cast("array<string>"))
    return (toked
            .select("id",
                    F.posexplode(grams).alias("pos", "gram"))
            .select("id", "pos", F.md5("gram").alias("fp")))


def decontaminate_substring(df: DataFrame, id_col: str, text_col: str,
                            eval_df: DataFrame, eval_id_col: str,
                            eval_text_col: str,
                            min_len: int = 10, k: int = 5) -> DataFrame:
    """Arbitrary-offset exact-substring decontamination — the
    suffix-array-class check of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"): flag a training doc
    sharing ANY verbatim run of >= ``min_len`` tokens with an eval
    doc, at any offset in either text. Subsumes the fixed-alignment
    13-gram rule (``decontaminate``): a shared 13-gram is a run of 13.

    Returns one row per training doc:
    (id, n_eval_matches, max_substring_tokens, contaminated) where
    max_substring_tokens is the longest shared run among pairs
    reaching min_len (0 when clean).

    Instead of a monolithic suffix array (single-machine, RAM-bound)
    the same semantics distribute as k-gram diagonal chaining:
    a shared run of length m >= k is EXACTLY m - k + 1 consecutive
    shared k-grams at constant offset difference (pos - epos), so
    per (pair, diagonal) a gaps-and-islands window recovers every
    maximal run length — no approximation.

    Scale shape: the eval gram set is benchmark-sized -> BROADCAST;
    the corpus gram stream never shuffles against it. A strided
    anchor prefilter bounds the chaining stage: any run of
    >= min_len tokens must contain a corpus gram starting at a
    multiple of s = min_len - k + 1 (an interval of s consecutive
    start offsets always contains one), so only docs whose STRIDED
    grams (1/s of the stream) hit the eval set enter the
    all-gram chaining join — for a clean corpus that stage is
    near-empty. The only keyed exchanges are over HIT rows.
    """
    if k > min_len:
        raise ValueError("k must be <= min_len")
    stride = min_len - k + 1
    cg = positional_kgrams(df, id_col, text_col, k)
    eg = (positional_kgrams(eval_df, eval_id_col, eval_text_col, k)
          .withColumnsRenamed({"id": "eid", "pos": "epos"}))
    # stage 1: strided anchors -> candidate (corpus doc, eval doc) pairs
    cand = (cg.where(F.col("pos") % stride == 0)
            .join(F.broadcast(eg.select("eid", "fp").distinct()), "fp")
            .select("id", "eid").distinct())
    # stage 2: full-gram diagonal chaining over candidate pairs only.
    # Runs >= min_len are guaranteed anchored (stride argument above),
    # so restricting to candidates loses nothing.
    m = (cg.join(F.broadcast(eg), "fp")
         .join(cand, ["id", "eid"], "left_semi")
         .select("id", "eid", "pos",
                 (F.col("pos") - F.col("epos")).alias("diag")))
    w = W.partitionBy("id", "eid", "diag").orderBy("pos")
    runs = (m.withColumn("isl", F.col("pos") - F.row_number().over(w))
            .groupBy("id", "eid", "diag", "isl")
            .agg((F.count("*") + (k - 1)).alias("run")))
    pair_best = (runs.groupBy("id", "eid")
                 .agg(F.max("run").alias("run"))
                 .where(F.col("run") >= min_len))
    per_doc = pair_best.groupBy("id").agg(
        F.count("*").alias("n_eval_matches"),
        F.max("run").alias("max_substring_tokens"))
    return (df.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select(
                "id",
                F.coalesce("n_eval_matches", F.lit(0)).cast("long")
                .alias("n_eval_matches"),
                F.coalesce("max_substring_tokens", F.lit(0)).cast("long")
                .alias("max_substring_tokens"))
            .withColumn("contaminated", F.col("n_eval_matches") > 0))


def duplicate_substring_pairs(df: DataFrame, id_col: str, text_col: str,
                              min_len: int = 15, k: int = 5,
                              max_gram_freq: int | None = 1000) -> DataFrame:
    """Corpus x corpus exact-substring duplicate pairs — the DEDUP
    half of the suffix-array family (Lee et al. 2022 find duplicated
    >=50-token spans ACROSS training docs, not just vs an eval set):
    (id_a, id_b, max_substring_tokens) for every doc pair sharing a
    verbatim run of >= ``min_len`` tokens at any offsets, id_a < id_b.

    Same k-gram diagonal chaining as ``decontaminate_substring`` but
    self-joined: a strided anchor pass (1/s of the gram stream,
    s = min_len - k + 1) generates candidate pairs, then full-gram
    chaining runs over candidate docs only. Both joins key on the
    gram fingerprint — ordinary keyed shuffles, no broadcast needed
    on either side, so the pattern holds when both sides are the
    full corpus.

    ``max_gram_freq`` (default 1000, matching ``dedup.jaccard_pairs``)
    drops grams occurring in more than that many docs before the
    anchor join — boilerplate/navigation grams create quadratic
    candidate fan-out, and a run shared only through such grams is
    boilerplate, not duplication. ``None`` keeps exact semantics
    (what the small-scale oracle entry uses).
    """
    if k > min_len:
        raise ValueError("k must be <= min_len")
    stride = min_len - k + 1
    g = positional_kgrams(df, id_col, text_col, k)
    if max_gram_freq is not None:
        hot = (g.select("id", "fp").distinct()
               .groupBy("fp").count()
               .where(F.col("count") > max_gram_freq).select("fp"))
        g = g.join(hot, "fp", "left_anti")
    anchors = (g.where(F.col("pos") % stride == 0)
               .select(F.col("id").alias("id_a"), "fp"))
    cand = (anchors
            .join(g.select(F.col("id").alias("id_b"), "fp"), "fp")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    docs_a = cand.select(F.col("id_a").alias("id")).distinct()
    docs_b = cand.select(F.col("id_b").alias("id")).distinct()
    ga = (g.join(docs_a, "id", "left_semi")
          .select(F.col("id").alias("id_a"), F.col("pos").alias("pa"), "fp"))
    gb = (g.join(docs_b, "id", "left_semi")
          .select(F.col("id").alias("id_b"), F.col("pos").alias("pb"), "fp"))
    m = (ga.join(gb, "fp")
         .where(F.col("id_a") < F.col("id_b"))
         .join(cand, ["id_a", "id_b"], "left_semi")
         .select("id_a", "id_b", "pa",
                 (F.col("pa") - F.col("pb")).alias("diag")))
    w = W.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = (m.withColumn("isl", F.col("pa") - F.row_number().over(w))
            .groupBy("id_a", "id_b", "diag", "isl")
            .agg((F.count("*") + (k - 1)).alias("run")))
    return (runs.groupBy("id_a", "id_b")
            .agg(F.max("run").cast("long").alias("max_substring_tokens"))
            .where(F.col("max_substring_tokens") >= min_len))


def quantile_band_filter(df: DataFrame, score: Column,
                         lower_q: float = 0.25, upper_q: float = 0.75,
                         exact: bool = False) -> DataFrame:
    """Keep rows whose ``score`` lies inside the corpus's
    [lower_q, upper_q] quantile band — the standard middle-band
    heuristic (CCNet keeps the head/middle perplexity buckets; both
    tails are suspect: too-clean boilerplate on one side, noise on
    the other). Appends the band bounds as ``q_lo`` / ``q_hi``.

    ``exact=False`` (default, the 100 TB path) derives the bounds
    from percentile_approx's bounded sketch; the exact interpolated
    form exists for small-scale oracle parity. Either way the bounds
    are a 1-row aggregate broadcast back over the scan — two passes
    over the data, no data-sized shuffle.
    """
    scored = df.withColumn("__score", score)
    if exact:
        bounds = scored.agg(F.expr(
            f"percentile(__score, array({lower_q}, {upper_q}))").alias("q"))
    else:
        bounds = scored.agg(F.percentile_approx(
            "__score", [lower_q, upper_q], 10000).alias("q"))
    bounds = bounds.select(F.col("q")[0].alias("q_lo"),
                           F.col("q")[1].alias("q_hi"))
    return (scored.crossJoin(F.broadcast(bounds))
            .where(F.col("__score").between(F.col("q_lo"), F.col("q_hi")))
            .drop("__score"))


def compression_ratio(df: DataFrame, id_col: str, text_col: str,
                      level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the FineWeb/RefinedWeb
    compressibility quality signal (highly repetitive or templated
    text compresses far below natural prose; near-random noise
    compresses above it). Returns (id, n_bytes, n_compressed,
    compression_ratio = compressed/raw, NULL for empty docs).

    DEFLATE is fully deterministic for a fixed (input, level), so
    the output is engine-reproducible — but it is NOT expressible in
    SQL (no zlib in DuckDB), making this the engine's one
    documented oracle-less query entry: the registry records a
    rows-only driver check and the exact-value gate lives in pytest,
    which replays zlib.compress byte-for-byte
    (tests/test_operators.py). Plan: Arrow-batched mapInPandas over
    the (id, text) projection — a pure per-row kernel, no shuffle,
    parallelism from the source split (``spread`` in the query
    layer); the 100 TB cost is one scan.
    """
    import pandas as pd

    def run(batches):
        import zlib
        for pdf in batches:
            raw = [t.encode("utf-8") if t is not None else b""
                   for t in pdf[text_col]]
            comp = [len(zlib.compress(b, level)) if b else None
                    for b in raw]
            yield pd.DataFrame({
                "id": pdf[id_col],
                "n_bytes": [len(b) for b in raw],
                "n_compressed": pd.array(comp, dtype="Int64"),
                "compression_ratio": [
                    c / len(b) if b else None
                    for c, b in zip(comp, raw)]})

    return (df.select(F.col(id_col).alias(id_col),
                      F.col(text_col).alias(text_col))
            .mapInPandas(run, "id long, n_bytes long, "
                              "n_compressed long, "
                              "compression_ratio double"))


def normalize_unicode(df: DataFrame, text_col: str,
                      form: str = "NFC") -> DataFrame:
    """Unicode normalization of a text column — the canonicalization
    step every multilingual corpus build runs before hashing or
    deduplication (the same grapheme can arrive precomposed (NFC) or
    decomposed (NFD) from different crawls, and byte-level dedup/
    fingerprints silently miss the equality). Appends
    ``<text_col>_norm`` and ``was_normal``.

    Arrow-batched mapInPandas over ``unicodedata.normalize`` (the
    stdlib implements the full Unicode algorithm; Spark's built-ins
    have no normalizer) — a pure per-row kernel, no shuffle, one
    scan at any scale. Cross-engine parity with DuckDB's
    ``nfc_normalize`` is value-gated by the
    ``unicode_nfc_normalization`` registry entry.
    """
    import pandas as pd

    cols = list(df.columns)

    def run(batches):
        import unicodedata
        for pdf in batches:
            src = pdf[text_col]
            norm = [unicodedata.normalize(form, t)
                    if t is not None else None for t in src]
            out = pdf.copy()
            out[f"{text_col}_norm"] = norm
            out["was_normal"] = [t == n if t is not None else None
                                 for t, n in zip(src, norm)]
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema]
        + [f"{text_col}_norm string", "was_normal boolean"])
    return df.mapInPandas(run, schema)


def bloom_decontaminate(df: DataFrame, id_col: str, text_col: str,
                        eval_df: DataFrame, eval_id_col: str,
                        eval_text_col: str, n: int = 13,
                        m_bits: int = 1 << 16, k: int = 3) -> DataFrame:
    """Bloom-filter-prefiltered benchmark decontamination: the exact
    13-gram rule (``decontaminate``), restructured so the corpus
    gram stream is screened against a Bloom filter of the eval set
    BEFORE any exact comparison — the standard industrial shape when
    the eval-suite gram set outgrows comfortable broadcast (a full
    eval HARNESS — every benchmark, every split — reaches 10^8+
    grams ≈ GBs of md5 fingerprints, while an m-bit Bloom bitmap of
    the same set is m/8 bytes at any cardinality).

    Construction (engine-portable, deterministic): a gram's
    fingerprint is md5(shingle); its k Bloom positions are
    conv(md5(fp || ':' || j)[:7], 16) % m for j in 0..k-1. The
    filter is the DISTINCT position set of the eval grams. A corpus
    gram is a CANDIDATE iff all k of its positions are set. Because
    positions are a pure function of fp, an exact hit is always a
    candidate (zero false negatives — the Bloom guarantee); false
    positives are exactly the candidates the verify stage kills.

    Plan: ONE pass over the corpus gram stream -> k-position explode
    -> broadcast join against the bit set -> per-gram count==k
    keeps candidates only -> the EXACT fingerprint join runs on
    candidates alone (near-empty for a clean corpus). Per-doc
    output: (id, n_candidate_grams, n_hit_ngrams, bloom_candidate,
    contaminated, false_positive). The false-positive count is
    deterministic given (m, k) and both engines replay it exactly —
    which is what lets a SQL oracle value-gate a Bloom filter.

    Scale: bits ≈ k * |eval grams| distinct ints (far under the
    bitmap's information bound, broadcast-trivial); the corpus side
    shuffles only candidate grams + one doc-keyed combine. At 100 TB
    with a clean corpus the post-filter exchange is ~empty; the
    whole cost is the map-side gram scan — optimal for this rule.
    """
    from ..sources.registry import materialize_auto
    from .dedup import shingles

    def pos(fp, j: int):
        return (F.conv(F.substring(
            F.md5(F.concat(fp, F.lit(f":{j}"))), 1, 7), 16, 10)
            .cast("long") % m_bits)

    # eval fingerprints feed BOTH the bit-set build and the verify
    # join — materialize the (tiny) frame so the eval corpus is
    # scanned once, not re-derived per consumer
    eval_fps = materialize_auto(
        shingles(eval_df, eval_id_col, eval_text_col, n=n)
        .select(F.md5("shingle").alias("fp")).distinct())
    bits = (eval_fps.select(F.explode(F.array(
                *[pos(F.col("fp"), j) for j in range(k)])).alias("p"))
            .distinct())
    grams = (shingles(df, id_col, text_col, n=n)
             .select("id", F.md5("shingle").alias("fp")))
    cand = (grams
            .select("id", "fp", F.explode(F.array(
                *[pos(F.col("fp"), j) for j in range(k)])).alias("p"))
            .join(F.broadcast(bits), "p")
            .groupBy("id", "fp").agg(F.count("*").alias("nset"))
            .where(F.col("nset") == k))
    verified = (cand
                .join(F.broadcast(eval_fps).withColumn(
                    "hit", F.lit(1)), "fp", "left")
                .groupBy("id")
                .agg(F.count("*").alias("n_candidate_grams"),
                     F.count("hit").alias("n_hit_ngrams")))
    return (df.select(F.col(id_col).alias("id"))
            .join(verified, "id", "left")
            .select(
                "id",
                F.coalesce("n_candidate_grams", F.lit(0))
                .alias("n_candidate_grams"),
                F.coalesce("n_hit_ngrams", F.lit(0))
                .alias("n_hit_ngrams"))
            .withColumn("bloom_candidate", F.col("n_candidate_grams") > 0)
            .withColumn("contaminated", F.col("n_hit_ngrams") > 0)
            .withColumn("false_positive",
                        F.col("bloom_candidate")
                        & ~F.col("contaminated")))
