"""Text-analysis queries over the documents table (north-star ops).

All expressions come from ``functions/text.py`` (JVM-side built-ins,
no UDFs); the oracles mirror the arithmetic exactly — md5 for
fingerprints, distinct-stopword-overlap for language ID — so every
operator is hash-verified, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_STOPWORDS,
    doc_fingerprint,
    normalize_text,
    predicted_lang,
    punct_ratio,
    stopword_ratio,
    tokens,
)
from ..sources.registry import spread
from .core import _t, query, rnd

# DuckDB fragment: the same canonical text form as normalize_text().
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


def _duck_lang_case() -> str:
    """DuckDB CASE chain mirroring functions.text.predicted_lang."""
    langs = sorted(LANG_STOPWORDS)
    score = {
        lang: ("len(list_intersect({toks}, ["
               + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
               + "]))").format(toks=_TOKS)
        for lang in langs
    }
    clauses = []
    for i, lang in enumerate(langs):
        rest = [score[x] for x in langs[i + 1:]]
        cond = f"{score[lang]} > 0"
        if rest:
            cond += f" AND {score[lang]} >= greatest({', '.join(rest)})"
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


# BPE-ish pre-tokenizer: alphanumeric runs OR single symbols — the
# split-points a byte-pair tokenizer starts from. Same semantics in
# Java regex and DuckDB's RE2.
_SUBWORD_RE = r"[a-z0-9]+|[^a-z0-9\s]"


@query("text_token_stats", oracle=f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all({_NORM}, '{_SUBWORD_RE}'))
            AS BIGINT) AS n_subword_tokens,
       CAST(length({_NORM}) AS BIGINT) AS n_chars_norm,
       round(CAST(list_sum(list_transform({_TOKS}, x -> length(x)))
                  AS DOUBLE) / len({_TOKS}), 4) AS avg_token_len
FROM documents
""")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish pre-token count
    (alnum runs | single symbols), mean token length.
    Zero shuffles — pure per-row expressions at any scale."""
    # r14 layered projections: normalize once, tokenize once — the
    # aggregate/transform lambdas exempt the inlined chains from
    # codegen subexpression elimination (norm was evaluated 3x and
    # the token split 3x per row).
    d = (spread(_t(spark, sf_dir, "documents"))
         .select("doc_id", normalize_text(F.col("text")).alias("__norm"))
         .select("doc_id", "__norm",
                 F.split(F.col("__norm"), " ").alias("__toks")))
    norm = F.col("__norm")
    toks = F.col("__toks")
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(_SUBWORD_RE), 0))
         .cast("long").alias("n_subword_tokens"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        rnd(tok_len_sum.cast("double") / F.size(toks), 4).alias("avg_token_len"),
    )


_EN_SW = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])


@query("text_quality_score", oracle=f"""
SELECT doc_id,
       round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                  AS DOUBLE) / length(text), 4) AS punct_ratio,
       round(CAST(len(list_filter({_TOKS},
                  t -> list_contains([{_EN_SW}], t))) AS DOUBLE)
             / len({_TOKS}), 4) AS stopword_ratio,
       round(0.4 * least(1.0, CAST(len({_TOKS}) AS DOUBLE) / 100.0)
           + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]',
                                       '', 'g')) AS DOUBLE) / length(text))
           + 0.3 * (CAST(len(list_filter({_TOKS},
                          t -> list_contains([{_EN_SW}], t))) AS DOUBLE)
                    / len({_TOKS})), 4) AS quality
FROM documents
""")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + punctuation + stopword-density mix
    (the standard pretraining-filter recipe, deterministic weights).

    r14 layered-projection rewrite (guide §1.2 step 2 — per-task
    work): the single-Project form inlined the tokenization chain
    (split·trim·regexp_replace·lower) six times and the punct regex
    strip three times per row, and the higher-order ``filter`` keeps
    this Project OUT of whole-stage codegen, so no codegen-side
    subexpression elimination ever rescued it. Materializing the
    token array, the punct ratio and the stopword hit count as
    intermediate projection columns evaluates each expensive
    expression ONCE per row: CollapseProject refuses to merge a
    Project whose non-cheap alias is referenced more than once
    upstream, so the layering survives optimization (plan pinned by
    tests/test_plan_quality.py). Arithmetic on top is identical
    expression-for-expression — bit-equal doubles, same oracle hash
    (re-proven at sf0.01 AND sf0.1). Measured 0.132 s -> 0.062 s at
    sf0.1 (min-of-5, BASELINE.md r14 log)."""
    d = spread(_t(spark, sf_dir, "documents"))
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    s1 = d.select("doc_id", "text", tokens(F.col("text")).alias("__toks"))
    s2 = s1.select(
        "doc_id",
        punct_ratio(F.col("text")).alias("__punct"),
        F.size("__toks").alias("__ntok"),
        F.size(F.filter(F.col("__toks"),
                        lambda t: F.array_contains(sw, t))).alias("__nstop"),
    )
    stop = F.when(F.col("__ntok") > 0,
                  F.col("__nstop") / F.col("__ntok")).otherwise(F.lit(0.0))
    quality = (
        0.4 * F.least(F.lit(1.0), F.col("__ntok").cast("double") / 100.0)
        + 0.3 * (1.0 - F.col("__punct"))
        + 0.3 * stop
    )
    return s2.select(
        "doc_id",
        rnd(F.col("__punct"), 4).alias("punct_ratio"),
        rnd(stop, 4).alias("stopword_ratio"),
        rnd(quality, 4).alias("quality"),
    )


@query("text_lang_id", oracle=f"""
SELECT lang AS labeled_lang,
       {_duck_lang_case()} AS predicted_lang,
       CAST(count(*) AS BIGINT) AS n
FROM documents
GROUP BY 1, 2
""")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID (stopword-overlap heuristic) cross-tabbed against
    the labeled lang column."""
    d = spread(_t(spark, sf_dir, "documents"))
    return (
        d.select(F.col("lang").alias("labeled_lang"),
                 predicted_lang(F.col("text")).alias("predicted_lang"))
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )


@query("text_fingerprint", oracle=f"""
SELECT doc_id, md5({_NORM}) AS fingerprint
FROM documents
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the canonical text form —
    engine-portable (unlike xxhash64), value-verified per doc."""
    return spread(_t(spark, sf_dir, "documents")).select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


def corpus_datacard(docs: DataFrame, lang_col: str = "lang",
                    text_col: str = "text",
                    exact_percentile: bool = False) -> DataFrame:
    """Per-language corpus data card: doc counts, exact-duplicate doc
    counts (content-fingerprint collisions), and token-length
    mean/median — the one-call summary a dataset release documents
    (data cards / datasheets). One fingerprint window + one lang
    combine; at scale both key uniformly.

    ``exact_percentile=False`` (the default, and the 100 TB path)
    computes the median via percentile_approx's bounded GK sketch;
    the exact form buffers every token count of a language group in
    one aggregation buffer — a per-group memory bomb on a web-scale
    corpus with few languages — and exists for oracle parity at
    small scale factors (mirroring the A6 profiler's exact flag).
    """
    from pyspark.sql import Window as W
    nt = normalize_text(F.col(text_col))
    f = docs.select(F.col(lang_col).alias("lang"),
                    F.size(F.split(nt, " ")).alias("ntok"),
                    F.md5(nt).alias("fp"))
    wf = W.partitionBy("fp")
    dd = f.withColumn("is_dup", F.count("*").over(wf) > 1)
    p50 = (F.expr("percentile(CAST(ntok AS DOUBLE), 0.5)")
           if exact_percentile
           else F.percentile_approx(F.col("ntok").cast("double"),
                                    0.5, 10000))
    return (dd.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
                 .cast("long").alias("n_dup_docs"),
                 rnd(F.avg(F.col("ntok").cast("double")), 2)
                 .alias("avg_tokens"),
                 rnd(p50, 2).alias("p50_tokens")))



@query("corpus_datacard_by_lang", oracle=f"""
WITH t AS (
    SELECT doc_id, lang, {_NORM} AS nt
    FROM documents
), f AS (
    SELECT doc_id, lang,
           len(string_split(nt, ' ')) AS ntok,
           md5(nt) AS fp
    FROM t
), d AS (
    SELECT lang, ntok,
           count(*) OVER (PARTITION BY fp) > 1 AS is_dup
    FROM f
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs,
       round(avg(CAST(ntok AS DOUBLE)), 2) AS avg_tokens,
       round(quantile_cont(CAST(ntok AS DOUBLE), 0.5), 2) AS p50_tokens
FROM d
GROUP BY lang
""")
def corpus_datacard_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle entry for :func:`corpus_datacard`, run in exact-
    percentile mode so DuckDB's quantile_cont hash-matches; the
    operator default is the approx scale path."""
    return corpus_datacard(_t(spark, sf_dir, "documents"),
                           exact_percentile=True)


_QSCORE = (f"0.4 * least(1.0, CAST(len({_TOKS}) AS DOUBLE) / 100.0)"
           f" + 0.3 * (1.0 - CAST(length(regexp_replace(text,"
           f" '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text))"
           f" + 0.3 * (CAST(len(list_filter({_TOKS},"
           f" t -> list_contains([{_EN_SW}], t))) AS DOUBLE)"
           f" / len({_TOKS}))")


@query("quality_band_filter_counts", oracle=f"""
WITH s AS (
    SELECT lang, {_QSCORE} AS score FROM documents
), b AS (
    SELECT quantile_cont(score, 0.25) AS q_lo,
           quantile_cont(score, 0.75) AS q_hi
    FROM s
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN score BETWEEN q_lo AND q_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band,
       round(any_value(q_lo), 4) AS q_lo,
       round(any_value(q_hi), 4) AS q_hi
FROM s CROSS JOIN b
GROUP BY lang
""")
def quality_band_filter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Middle-quality-band selection (CCNet-style bucket keep): per
    language, how many documents survive the corpus [p25, p75]
    quality band, with the band bounds. Oracle runs the operator's
    exact-percentile mode; the operator default is the
    percentile_approx scale path."""
    from ..operators.quality import quantile_band_filter
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    score = (0.4 * F.least(F.lit(1.0), F.size(toks).cast("double") / 100.0)
             + 0.3 * (1.0 - punct_ratio(F.col("text")))
             + 0.3 * stopword_ratio(F.col("text"), "en"))
    kept = quantile_band_filter(d, score, 0.25, 0.75, exact=True)
    total = d.groupBy("lang").agg(F.count("*").alias("n_total"))
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_in_band"),
                 rnd(F.first("q_lo"), 4).alias("q_lo"),
                 rnd(F.first("q_hi"), 4).alias("q_hi"))
            .join(total, "lang")
            .select("lang", "n_total", "n_in_band", "q_lo", "q_hi"))


@query("text_token_entropy", oracle=f"""
WITH tk AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), tknn AS (
    SELECT doc_id, tok FROM tk WHERE length(tok) > 0
), c AS (
    SELECT doc_id, tok, count(*) AS c FROM tknn GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy,
       CASE WHEN count(*) > 1
            THEN round((ln(sum(c)) - sum(c * ln(c)) / sum(c))
                       / ln(count(*)), 4)
       END AS norm_entropy
FROM c GROUP BY doc_id
""")
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document plus the
    type-count-normalized form in [0, 1] — the diversity signal that
    separates keyword-stuffed/templated text (low) from natural prose
    (high); complements the Gopher repetition ratios. Identity
    H = ln(n) - sum(c ln c)/n keeps it one combine per doc, all
    expressions; single-type docs yield NULL normalized entropy by
    definition on both engines."""
    d = spread(_t(spark, sf_dir, "documents"))
    c = (d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
         .where(F.length("tok") > 0)
         .groupBy("doc_id", "tok").agg(F.count("*").alias("c")))
    n = F.sum("c")
    h = F.log(n) - F.sum(F.col("c") * F.log("c")) / n
    return (c.groupBy("doc_id")
            .agg(n.cast("long").alias("n_tokens"),
                 F.count("*").cast("long").alias("n_types"),
                 rnd(h, 4).alias("entropy"),
                 F.when(F.count("*") > 1,
                        rnd(h / F.log(F.count("*")), 4))
                 .alias("norm_entropy")))


@query("text_distinctiveness", oracle=f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           concat_ws(' ', t[i], t[i+1], t[i+2]) AS g
    FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
    WHERE length(concat_ws(' ', t[i], t[i+1], t[i+2])) > 0
      AND len(t) >= 3
), freq AS (
    SELECT g, count(*) AS df FROM sh GROUP BY g
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN freq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique,
       round(CAST(sum(CASE WHEN freq.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS distinctiveness
FROM sh JOIN freq USING (g)
GROUP BY sh.doc_id
""")
def text_distinctiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc distinctiveness: the fraction of a document's distinct
    trigram shingles that occur NOWHERE else in the corpus — near 1
    means genuinely novel content, near 0 means template/boilerplate
    assembled from corpus-common phrasing. The complement signal to
    near-dup detection (a doc can be 'no near-dup' yet still fully
    boilerplate). Reuses the dedup shingle builder; one gram-keyed
    document-frequency combine + one doc-keyed fold."""
    from ..operators.dedup import shingles as _sh
    sh = _sh(_t(spark, sf_dir, "documents"), "doc_id", "text", n=3)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    return (sh.join(freq, "shingle")
            .groupBy(F.col("id").alias("doc_id"))
            .agg(F.count("*").alias("n_shingles"),
                 F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
                 rnd(F.sum((F.col("df") == 1).cast("int"))
                     / F.count("*"), 4).alias("distinctiveness")))


@query("heavy_hitter_tokens", oracle=f"""
WITH t AS (
    SELECT unnest({_TOKS}) AS tok FROM documents
), total AS (
    SELECT count(*) AS n_total FROM t
)
SELECT tok, CAST(count(*) AS BIGINT) AS n,
       round(count(*) / (SELECT n_total FROM total), 6) AS freq
FROM t GROUP BY tok
HAVING count(*) >= ceil((SELECT n_total FROM total) * 0.002)
""")
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens at >= 0.2% of all token
    mass) via the two-phase Misra-Gries design: per-partition O(1/phi)
    sketch summaries generate candidates, an exact recount of only
    the candidates kills false positives — so the output is the
    EXACT heavy-hitter set (a plain GROUP BY/HAVING oracle verifies
    it) while the plan never shuffles the full vocabulary. The
    100 TB motivation: a web-scale corpus has billions of long-tail
    token keys; this plan's shuffle carries only broadcast
    candidates and their counts."""
    from ..operators.selection import heavy_hitters
    docs = _t(spark, sf_dir, "documents")
    out = heavy_hitters(docs, "text", phi=0.002)
    return out.select("tok", "n", rnd("freq", 6).alias("freq"))


def _bpe_oracle(n_merges: int) -> str:
    """DuckDB replay of operators.bpe.bpe_train, round by round: the
    word vocab, the character symbol streams, and per round the
    pair-frequency combine, the (freq DESC, lhs, rhs) argmax as a
    1-row CTE, the greedy non-overlap window selection, and the
    symbol-stream rebuild — identical relational steps, identical
    tiebreaks, so the learned merge table value-hashes equal. CTEs
    are MATERIALIZED: default inlining re-expands each round's state
    into the next (exponential re-scans of the parquet)."""
    ctes = [f"""words AS MATERIALIZED (
    SELECT tok AS w, count(*) AS n FROM (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ) WHERE len(tok) > 0 GROUP BY tok
), s0 AS MATERIALIZED (
    SELECT w, i AS pos, substr(w, i, 1) AS s
    FROM words, unnest(range(1, len(w) + 1)) AS u(i)
    UNION ALL
    SELECT w, len(w) + 1, '</w>' FROM words
)"""]
    for r in range(1, n_merges + 1):
        p = f"s{r - 1}"
        ctes.append(f"""p{r} AS MATERIALIZED (
    SELECT a.w, a.pos AS apos, a.s AS lhs, b.s AS rhs
    FROM {p} a JOIN {p} b ON a.w = b.w AND b.pos = a.pos + 1
), b{r} AS MATERIALIZED (
    SELECT lhs, rhs, freq FROM (
        SELECT lhs, rhs, sum(n) AS freq
        FROM p{r} JOIN words USING (w) GROUP BY lhs, rhs
    ) ORDER BY freq DESC, lhs, rhs LIMIT 1
), m{r} AS MATERIALIZED (
    SELECT w, apos FROM (
        SELECT w, apos,
               row_number() OVER (PARTITION BY w, grp
                                  ORDER BY apos) AS rn2
        FROM (
            SELECT c.w, c.apos,
                   c.apos - row_number() OVER (PARTITION BY c.w
                                               ORDER BY c.apos) AS grp
            FROM p{r} c JOIN b{r} USING (lhs, rhs)
        )
    ) WHERE rn2 % 2 = 1
), s{r} AS MATERIALIZED (
    SELECT w, row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, s
    FROM (
        SELECT s.w, s.pos,
               CASE WHEN m1.apos IS NOT NULL
                    THEN (SELECT lhs || rhs FROM b{r})
                    ELSE s.s END AS s
        FROM {p} s
        LEFT JOIN m{r} m1 ON s.w = m1.w AND s.pos = m1.apos
        LEFT JOIN m{r} m2 ON s.w = m2.w AND s.pos = m2.apos + 1
        WHERE m2.apos IS NULL
    )
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_rank, lhs, rhs, CAST(freq AS BIGINT) AS freq "
        f"FROM b{r}" for r in range(1, n_merges + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def _bpe_segment_oracle(n_merges: int) -> str:
    """Same round replay, different projection: the FINAL symbol
    state s{n} — a word's row count is its subword count under the
    learned merges."""
    base = _bpe_oracle(n_merges)
    head = base[:base.rindex("\nSELECT 1 AS merge_rank")]
    return head + f"""
SELECT s.w AS w,
       CAST(max(words.n) AS BIGINT) AS word_count,
       CAST(count(*) AS BIGINT) AS n_subwords
FROM s{n_merges} s JOIN words ON s.w = words.w
GROUP BY s.w
"""


@query("bpe_merge_table", oracle=_bpe_oracle(8))
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich 2016) over the documents
    corpus: the first 8 learned merges with their frequencies. The
    whole training loop is relational — ONE corpus-sized groupBy
    collapses 100 TB of text to its word vocabulary, and every merge
    round after that is vocab-sized joins/windows; the driver sees
    one row per round. Deterministic by construction (freq DESC +
    lexicographic tiebreak, greedy left-to-right non-overlap), so the
    DuckDB oracle replays all 8 rounds as chained CTEs and the merge
    tables value-hash equal."""
    from ..operators.bpe import bpe_train
    docs = _t(spark, sf_dir, "documents")
    return bpe_train(docs, "text", n_merges=8, batch=8)


@query("tfidf_keywords_per_doc", oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    WHERE doc_id < 100
), tf AS (
    SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok
), df_t AS (
    SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok
), n AS (
    SELECT count(DISTINCT doc_id) AS n_docs FROM tok
), scored AS (
    SELECT tf.doc_id, tf.tok,
           tf.tf * ln(n.n_docs / df_t.df) AS tfidf
    FROM tf JOIN df_t USING (tok) CROSS JOIN n
)
SELECT doc_id, tok, round(tfidf, 6) AS tfidf,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT doc_id, tok, tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, tok) AS rnk
    FROM scored
) WHERE rnk <= 3
""")
def tfidf_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (first 100 docs) — the
    classic per-document salience extraction: raw tf times
    ln(N/df), deterministic (score DESC, token) tiebreak. Plan
    shape: one doc-keyed tf combine, one token-keyed df combine
    (map-side partial on both), a token join — NOT broadcast by
    hint, the token side is vocabulary-sized and Catalyst picks —
    and a WindowGroupLimit-pushed rank-3 filter, so the shuffle
    after scoring carries at most 3 rows per document."""
    from pyspark.sql import Window as W
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text")))
                      .alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_t = tok.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"))
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (tf.join(df_t, "tok").crossJoin(F.broadcast(n))
              .select("doc_id", "tok",
                      (F.col("tf")
                       * F.log(F.col("n_docs") / F.col("df")))
                      .alias("tfidf")))
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= 3)
            .select("doc_id", "tok", rnd("tfidf", 6).alias("tfidf"),
                    "rnk"))


@query("pmi_cooccurrence_pairs", oracle=f"""
WITH tok AS (
    SELECT doc_id, i AS pos, t[i] AS tok
    FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
         unnest(range(1, len(t) + 1)) AS u(i)
), pairs AS (
    SELECT a.tok AS w1, b.tok AS w2
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
         AND a.tok < b.tok
), pc AS (
    SELECT w1, w2, count(*) AS n_pair FROM pairs GROUP BY w1, w2
), uc AS (
    SELECT tok, count(*) AS n_tok FROM tok GROUP BY tok
), tot AS (
    SELECT (SELECT count(*) FROM pairs) AS n_pairs,
           (SELECT count(*) FROM tok) AS n_toks
)
SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
       round(ln((n_pair / n_pairs)
                / ((a.n_tok / n_toks) * (b.n_tok / n_toks))), 6) AS pmi
FROM pc JOIN uc a ON pc.w1 = a.tok
        JOIN uc b ON pc.w2 = b.tok
        CROSS JOIN tot
WHERE n_pair >= 50
""")
def pmi_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring
    within a +-2 window — the embedding-training-prep statistic
    (word2vec/GloVe both start from exactly this co-occurrence
    count). Position self-join bounded to offset<=2 (each token row
    joins at most 2 partners — linear, not quadratic, in corpus
    size), unordered pairs canonicalized w1<w2, count floor 50 keeps
    the output the strong-association set. PMI from the three
    count tables; all shuffles are map-side-combinable key groups."""
    from ..sources.registry import spread
    docs = _t(spark, sf_dir, "documents")
    tok = spread(docs.select("doc_id", F.posexplode(
        tokens(F.col("text"))).alias("pos", "tok")))
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (F.col("b.pos") - F.col("a.pos")).between(1, 2)
                    & (F.col("a.tok") < F.col("b.tok")))
             .select(F.col("a.tok").alias("w1"),
                     F.col("b.tok").alias("w2")))
    pc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    uc = tok.groupBy("tok").agg(F.count("*").alias("n_tok"))
    tot = (pairs.agg(F.count("*").alias("n_pairs"))
           .crossJoin(tok.agg(F.count("*").alias("n_toks"))))
    pmi = F.log((F.col("n_pair") / F.col("n_pairs"))
                / ((F.col("a.n_tok") / F.col("n_toks"))
                   * (F.col("b.n_tok") / F.col("n_toks"))))
    return (pc.join(uc.alias("a"), F.col("w1") == F.col("a.tok"))
            .join(uc.alias("b"), F.col("w2") == F.col("b.tok"))
            .crossJoin(F.broadcast(tot))
            .where(F.col("n_pair") >= 50)
            .select("w1", "w2", "n_pair", rnd(pmi, 6).alias("pmi")))


@query("bpe_segment_lengths", oracle=_bpe_segment_oracle(8))
def bpe_segment_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword segmentation under the learned BPE merges: per
    distinct word, its corpus count and its subword count after the
    8 trained merges — the vocabulary-sized dim table that, joined
    back by word, segments the full corpus (and prices it in
    tokens) without touching the text again. Verified by the same
    round-replay oracle as bpe_merge_table, projected onto the
    final symbol state."""
    from ..operators.bpe import bpe_train_with_state
    docs = _t(spark, sf_dir, "documents")
    _, state = bpe_train_with_state(docs, "text", n_merges=8, batch=8)
    from ..operators.bpe import word_vocab
    words = word_vocab(docs, "text")
    return (state.groupBy("w")
            .agg(F.count("*").alias("n_subwords"))
            .join(words, "w")
            .select("w", F.col("n").cast("long").alias("word_count"),
                    F.col("n_subwords").cast("long").alias("n_subwords")))


def _bpe_fertility_oracle(n_merges: int) -> str:
    """Round replay projected onto per-language fertility: corpus
    token occurrences weighted by each word's final subword count."""
    base = _bpe_oracle(n_merges)
    head = base[:base.rindex("\nSELECT 1 AS merge_rank")]
    return head + f""",
lw AS (
    SELECT lang, tok AS w, count(*) AS n FROM (
        SELECT lang, unnest({_TOKS}) AS tok FROM documents
    ) WHERE len(tok) > 0 GROUP BY 1, 2
), seg AS (
    SELECT w, count(*) AS n_sub FROM s{n_merges} GROUP BY w
)
SELECT lang,
       CAST(sum(lw.n) AS BIGINT) AS n_tokens,
       round(sum(lw.n * seg.n_sub) / sum(lw.n), 6) AS fertility
FROM lw JOIN seg ON lw.w = seg.w
GROUP BY lang
"""


@query("bpe_fertility_by_lang", oracle=_bpe_fertility_oracle(8))
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language (subwords emitted per word
    token) under the 8 learned BPE merges — the fairness metric for
    multilingual tokenizers (a language with fertility 2x pays 2x
    the sequence length for the same text). Corpus-weighted: each
    (lang, word) occurrence count joins the vocab-sized segmentation
    dim table; verified by the same round-replay oracle projected
    onto the weighted average."""
    from ..operators.bpe import bpe_train_with_state
    docs = _t(spark, sf_dir, "documents")
    _, state = bpe_train_with_state(docs, "text", n_merges=8, batch=8)
    seg = state.groupBy("w").agg(F.count("*").alias("n_sub"))
    lw = (docs.select("lang", F.explode(tokens(F.col("text")))
                      .alias("w"))
          .where(F.length("w") > 0)
          .groupBy("lang", "w").agg(F.count("*").alias("n")))
    return (lw.join(seg, "w")
            .groupBy("lang")
            .agg(F.sum("n").cast("long").alias("n_tokens"),
                 rnd(F.sum(F.col("n") * F.col("n_sub"))
                     / F.sum("n"), 6).alias("fertility")))


def _bpe_doc_cost_oracle(n_merges: int) -> str:
    """Round replay projected onto per-document subword cost."""
    base = _bpe_oracle(n_merges)
    head = base[:base.rindex("\nSELECT 1 AS merge_rank")]
    return head + f""",
dt AS (
    SELECT doc_id, tok AS w FROM (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ) WHERE len(tok) > 0
), seg AS (
    SELECT w, count(*) AS n_sub FROM s{n_merges} GROUP BY w
)
SELECT dt.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(seg.n_sub) AS BIGINT) AS n_bpe_tokens
FROM dt JOIN seg ON dt.w = seg.w
GROUP BY dt.doc_id
"""


@query("bpe_doc_token_cost", oracle=_bpe_doc_cost_oracle(8))
def bpe_doc_token_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token PRICE under the learned BPE merges: word
    count and total subword count — what sequence-length budgeting,
    packing, and billing actually consume. The corpus joins the
    vocab-sized segmentation dim table by word (broadcast-scale at
    any corpus size: the dim is the vocabulary); one doc-keyed
    combine. Completes the tokenizer QA ladder: merge table -> word
    segmentation -> per-language fertility -> per-document cost,
    every rung value-verified by the same round-replay oracle."""
    from ..operators.bpe import bpe_train_with_state
    docs = _t(spark, sf_dir, "documents")
    _, state = bpe_train_with_state(docs, "text", n_merges=8, batch=8)
    seg = state.groupBy("w").agg(F.count("*").alias("n_sub"))
    dt = (docs.select("doc_id", F.explode(tokens(F.col("text")))
                      .alias("w"))
          .where(F.length("w") > 0))
    return (dt.join(seg, "w")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("n_sub").cast("long").alias("n_bpe_tokens")))


@query("zipf_slope_tokens", oracle=f"""
WITH tf AS (
    SELECT tok, count(*) AS n FROM (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ) WHERE len(tok) > 0 GROUP BY tok
), ranked AS (
    SELECT ln(row_number() OVER (ORDER BY n DESC, tok)) AS lx,
           ln(n) AS ly
    FROM tf
    ORDER BY n DESC, tok
    LIMIT 100
), s AS (
    SELECT count(*) AS k, sum(lx) AS sx, sum(ly) AS sy,
           sum(lx * ly) AS sxy, sum(lx * lx) AS sxx
    FROM ranked
)
SELECT CAST(k AS BIGINT) AS n_ranks,
       round((sxy - sx * sy / k) / (sxx - sx * sx / k), 6)
           AS zipf_slope
FROM s
""")
def zipf_slope_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the token rank-frequency curve: OLS slope
    of ln(freq) vs ln(rank) for the top-100 tokens (natural text
    sits near -1; templated/synthetic corpora drift far off — a
    one-number corpus-naturalness probe). One vocab combine, a
    deterministic (freq DESC, token) ranking, and the same
    closed-form moment-sum regression as the trend entries."""
    from pyspark.sql import Window as W
    docs = _t(spark, sf_dir, "documents")
    tf = (docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
          .where(F.length("tok") > 0)
          .groupBy("tok").agg(F.count("*").alias("n")))
    ranked = (tf.select(
        F.log(F.row_number().over(W.orderBy(F.desc("n"), "tok"))
              .cast("double")).alias("lx"),
        F.log(F.col("n").cast("double")).alias("ly"),
        F.row_number().over(W.orderBy(F.desc("n"), "tok")).alias("r"))
        .where(F.col("r") <= 100))
    s = ranked.agg(F.count("*").alias("k"), F.sum("lx").alias("sx"),
                   F.sum("ly").alias("sy"),
                   F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
                   F.sum(F.col("lx") * F.col("lx")).alias("sxx"))
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("k")) / \
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("k"))
    return s.select(F.col("k").cast("long").alias("n_ranks"),
                    rnd(slope, 6).alias("zipf_slope"))


def _lang_mix_oracle() -> str:
    from ..functions.text import LANG_STOPWORDS
    cols = []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        cols.append(
            f"len(list_filter(toks, x -> list_contains([{lst}], x)))"
            f" AS hits_{lang}")
    hits = ",\n           ".join(cols)
    langs = list(LANG_STOPWORDS)
    n_langs = " + ".join(
        f"CASE WHEN hits_{lg} > 0 THEN 1 ELSE 0 END" for lg in langs)
    return f"""
WITH t AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
), h AS (
    SELECT doc_id,
           {hits}
    FROM t
)
SELECT doc_id,
       CAST({n_langs} AS BIGINT) AS n_langs_hit,
       {n_langs} >= 2 AS is_mixed
FROM h
WHERE {n_langs} >= 1
"""


@query("text_lang_mixing_flags", oracle=_lang_mix_oracle())
def text_lang_mixing_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixing detector: documents whose tokens hit the
    stopword lists of TWO OR MORE languages — the corpus-QA flag for
    boilerplate-contaminated or concatenated-crawl pages that a
    single-label language ID silently misfiles (they degrade
    monolingual training sets from inside the 'right' bucket). The
    entry emits every doc with at least one stopword hit so the
    is_mixed flag itself is value-verified (this synthetic corpus is
    cleanly monolingual — zero mixed docs IS the verified answer).
    Pure token-array expressions per row, zero shuffle (spread
    unlocks the unsplittable testdata scan for the per-row array
    intersections; no-op on a cluster)."""
    from ..functions.text import LANG_STOPWORDS
    docs = spread(_t(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    hit_flags = []
    for words in LANG_STOPWORDS.values():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        hit_flags.append(F.when(hits > 0, 1).otherwise(0))
    n_langs = hit_flags[0]
    for fl in hit_flags[1:]:
        n_langs = n_langs + fl
    return (docs.select("doc_id", n_langs.alias("nl"))
            .where(F.col("nl") >= 1)
            .select("doc_id", F.col("nl").cast("long").alias("n_langs_hit"),
                    (F.col("nl") >= 2).alias("is_mixed")))


@query("sample_vocab_coverage", oracle=f"""
WITH corpus_v AS (
    SELECT DISTINCT tok FROM (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ) WHERE len(tok) > 0
), samp AS (
    SELECT doc_id, text FROM documents
    WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
           % 1000000) < 100000
), samp_v AS (
    SELECT DISTINCT tok FROM (
        SELECT unnest({_TOKS.replace('documents', 'samp')}) AS tok
        FROM samp
    ) WHERE len(tok) > 0
)
SELECT CAST((SELECT count(*) FROM samp) AS BIGINT) AS n_sample_docs,
       CAST((SELECT count(*) FROM samp_v) AS BIGINT) AS sample_types,
       CAST((SELECT count(*) FROM corpus_v) AS BIGINT) AS corpus_types,
       round((SELECT count(*) FROM samp_v)
             / (SELECT CAST(count(*) AS DOUBLE) FROM corpus_v), 6)
           AS type_coverage
""")
def sample_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-quality audit: what fraction of the corpus's distinct
    token types does the deterministic 10% document sample retain?
    Low coverage means the sample under-represents the long tail —
    the check run before trusting any subsampled ablation. Uses the
    same md5 sample rule as the sampling operators; two vocab
    combines and KB-sized scalars."""
    from ..operators.sampling import deterministic_sample
    docs = _t(spark, sf_dir, "documents")
    def vocab(df):
        return (df.select(F.explode(tokens(F.col("text"))).alias("tok"))
                .where(F.length("tok") > 0).distinct())
    samp = deterministic_sample(docs, "doc_id", 0.1)
    nv_c = vocab(docs).agg(F.count("*").alias("corpus_types"))
    nv_s = vocab(samp).agg(F.count("*").alias("sample_types"))
    nd = samp.agg(F.count("*").alias("n_sample_docs"))
    return (nd.crossJoin(nv_s).crossJoin(nv_c)
            .select(F.col("n_sample_docs").cast("long")
                    .alias("n_sample_docs"),
                    F.col("sample_types").cast("long")
                    .alias("sample_types"),
                    F.col("corpus_types").cast("long")
                    .alias("corpus_types"),
                    rnd(F.col("sample_types")
                        / F.nullif(F.col("corpus_types").cast("double"),
                                   F.lit(0.0)), 6)
                    .alias("type_coverage")))


@query("corr_length_alpha_by_lang", oracle=f"""
WITH m AS (
    SELECT lang,
           CAST(n_chars AS DOUBLE) AS x,
           len(list_filter(string_split({_NORM}, ' '),
                           t -> regexp_matches(t, '[a-z]')))
           / CAST(greatest(len(string_split({_NORM}, ' ')), 1) AS DOUBLE)
               AS y
    FROM documents
), s AS (
    SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM m GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       round((sxy - sx * sy / n)
             / nullif(sqrt(sxx - sx * sx / n)
                      * sqrt(syy - sy * sy / n), 0),
             6) AS pearson_r
FROM s
""")
def corr_length_alpha_by_lang(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-language Pearson correlation between document length and
    alphabetic-token fraction — the cross-feature dependency check
    run before treating quality signals as independent filters (a
    strong correlation means two rules double-count the same
    evidence). Closed-form moment sums per language: one combine,
    engine-portable arithmetic."""
    from ..functions.text import normalize_text
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    alpha = (F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
             / F.greatest(F.size(toks), F.lit(1)).cast("double"))
    m = docs.select("lang", F.col("n_chars").cast("double").alias("x"),
                    alpha.alias("y"))
    s = m.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    # zero-variance groups (e.g. a language with no [a-z] tokens)
    # get NULL r — nullif on both engines, not a crash
    denom = (F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
             * F.sqrt(F.col("syy") - F.col("sy") * F.col("sy")
                      / F.col("n")))
    r = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / \
        F.nullif(denom, F.lit(0.0))
    return s.select("lang", F.col("n").cast("long").alias("n_docs"),
                    rnd(r, 6).alias("pearson_r"))


@query("quality_score_auc", oracle=f"""
WITH scored AS (
    SELECT CAST(len({_TOKS}) AS BIGINT) AS s,
           CAST(lang = 'en' AS INT) AS y
    FROM documents
), g AS (
    SELECT s, CAST(sum(y) AS DOUBLE) AS p,
           CAST(sum(1 - y) AS DOUBLE) AS neg
    FROM scored GROUP BY s
), c AS (
    SELECT p, neg,
           coalesce(sum(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_neg
    FROM g
)
SELECT CAST(sum(p) AS BIGINT) AS n_pos,
       CAST(sum(neg) AS BIGINT) AS n_neg,
       round(sum(p * (cum_neg + 0.5 * neg))
             / (sum(p) * sum(neg)), 6) AS auc
FROM c
""")
def quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of a quality score against a binary label — the
    standard calibration check before a scored filter goes into a
    curation pipeline (here: does token count discriminate English
    docs?). Computed by the HISTOGRAM method: AUC equals the
    Mann-Whitney probability P(s_pos > s_neg) + 0.5 P(tie), which for
    an integer-valued score reduces to one groupBy over DISTINCT
    SCORE VALUES plus a window over that (tiny) value histogram —
    never a per-row global rank. At 100 TB the per-row sort a naive
    rank-based AUC needs is the bottleneck; this plan shuffles only
    |distinct scores| rows after the combine."""
    from pyspark.sql import Window as W
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.size(tokens(F.col("text"))).cast("long").alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"))
    g = scored.groupBy("s").agg(
        F.sum("y").cast("double").alias("p"),
        F.sum(1 - F.col("y")).cast("double").alias("neg"))
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    c = g.select("p", "neg",
                 F.coalesce(F.sum("neg").over(w), F.lit(0.0))
                 .alias("cum_neg"))
    return c.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        rnd(F.sum(F.col("p") * (F.col("cum_neg") + 0.5 * F.col("neg")))
            / (F.sum("p") * F.sum("neg")), 6).alias("auc"))


_COMPRESSION_BANDS_ORACLE = """
WITH base AS (
    SELECT lang, octet_length(encode(text)) AS blen FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CASE WHEN blen > 0 THEN 1 END), 0) AS BIGINT)
           AS n_ratio_valid,
       CAST(0 AS BIGINT) AS n_outside_envelope,
       CAST(least(4, coalesce(sum(CASE WHEN blen > 0 THEN 1 END), 0))
           AS BIGINT) AS n_bands,
       CAST(0 AS BIGINT) AS n_band_inversions
FROM base GROUP BY lang ORDER BY lang
"""


def _compression_parts(spark: SparkSession, sf_dir: str):
    """Shared prefix of the zlib quality entries: per-lang structural
    stats + the valid-ratio frame awaiting band assignment."""
    from ..operators.quality import compression_ratio
    docs = spread(_t(spark, sf_dir, "documents"))
    cr = compression_ratio(docs, "doc_id", "text")
    joined = docs.select(F.col("doc_id").alias("id"), "lang").join(cr, "id")
    outside = (
        F.col("n_compressed").isNotNull()
        & ((F.col("n_compressed")
            > F.col("n_bytes")
            + 5 * F.ceil(F.col("n_bytes") / F.lit(16384)) + 6)
           | (F.col("n_compressed") <= 0)))
    stats = joined.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.col("compression_ratio").isNotNull().cast("int")),
            F.lit(0)).cast("long").alias("n_ratio_valid"),
        F.coalesce(F.sum(outside.cast("int")), F.lit(0))
        .cast("long").alias("n_outside_envelope"))
    valid = joined.where(F.col("compression_ratio").isNotNull())
    return stats, valid


def _bands_report(stats: DataFrame, banded: DataFrame) -> DataFrame:
    """Shared suffix: per-(lang, band) means -> band count + mean
    inversions, joined onto the structural stats. Runs over
    #langs x 4 rows."""
    from pyspark.sql import Window as W
    band_means = (banded.groupBy("lang", "band")
                  .agg(F.avg("compression_ratio").alias("m")))
    wlag = W.partitionBy("lang").orderBy("band")
    bands = (band_means
             .withColumn("prev_m", F.lag("m").over(wlag))
             .groupBy("lang")
             .agg(F.count("*").cast("long").alias("n_bands"),
                  F.sum(F.when(F.col("m") < F.col("prev_m"), 1)
                        .otherwise(0))
                  .cast("long").alias("n_band_inversions")))
    return (stats.join(bands, "lang", "left")
            .select("lang", "n_docs", "n_ratio_valid",
                    "n_outside_envelope",
                    F.coalesce("n_bands", F.lit(0)).alias("n_bands"),
                    F.coalesce("n_band_inversions", F.lit(0))
                    .alias("n_band_inversions"))
            .orderBy("lang"))


@query("compression_ratio_quality", oracle=_COMPRESSION_BANDS_ORACLE)
def compression_ratio_quality(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """STRUCTURAL oracle over the zlib compressibility pipeline
    (r13 verdict #6 — this re-enters the entry into driver rotation;
    it spent r8..r13 parked as the one oracle-less query). DEFLATE
    output lengths have no SQL expression, but hard INVARIANTS of a
    correct run are exactly predictable in vanilla SQL, per language:

    - ``n_docs``: join fan-out guard — the operator emits exactly one
      row per doc, so the post-join count equals ``count(*)``;
    - ``n_ratio_valid``: the ratio is NULL iff the doc is empty, so
      valid ratios == docs with ``octet_length(encode(text)) > 0``;
    - ``n_outside_envelope``: zlib's worst case is stored blocks —
      ``n_compressed <= n_bytes + 5*ceil(n_bytes/16384) + 6`` (RFC
      1951 §3.2.4 stored-block overhead + RFC 1950 header/adler), and
      compressed output is never empty; a correct run has ZERO docs
      outside that envelope (exact integer math on the operator's
      (n_bytes, n_compressed), no FP reconstruction);
    - ``n_bands`` / ``n_band_inversions``: the quality-band machinery
      replayed — ntile(4) quartile bands over the ratio, per-band
      means joined back in band order; ntile yields
      ``least(4, n_valid)`` bands whose means are monotonically
      non-decreasing BY CONSTRUCTION, so inversions == 0 unless the
      ratio column carries NaNs/garbage that breaks ordering.

    The byte-exact per-doc VALUE gate stays the pytest zlib replay
    (tests/test_operators.py); the full value-rich profile remains
    hash-compared against a DuckDB zlib UDF by the local harnesses
    via ``compression_ratio_zlib_profile`` below.

    Since r15 the DECLARED entry runs the whale-proof range-bucketed
    two-phase banding (r14 verdict #1): the per-language ntile(4)
    sorts every valid document of a language in one task — the
    dominant-language whale AQE cannot split. Delegates to
    compression_bands_two_phase — identical result, same oracle."""
    return compression_bands_two_phase(spark, sf_dir)


@query("compression_bands_two_phase", oracle=_COMPRESSION_BANDS_ORACLE)
def compression_bands_two_phase(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """compression_ratio_quality's whale-proof twin — the last
    per-language full-data window re-expressed two-phase. The
    one-window plan's ntile(4) over partitionBy(lang) sorts every
    valid document of a language in one task (the dominant-language
    whale AQE cannot split); here the quartile band comes from
    operators/layout.bucketed_global_rank on the monotone integer
    image floor(compression_ratio * 10^6) (ratio ties can never
    straddle a bucket boundary) + the closed-form ntile_expr. Same
    structural oracle, same shared scorer and combine
    (_compression_parts / _bands_report); the zlib VALUE gate stays
    the pytest byte-exact replay."""
    from ..operators.layout import bucketed_global_rank, ntile_expr
    stats, valid = _compression_parts(spark, sf_dir)
    ranked = bucketed_global_rank(
        valid.withColumn(
            "__ok",
            F.floor(F.col("compression_ratio") * 1_000_000)
            .cast("long")),
        ["lang"], "__ok",
        [F.col("compression_ratio"), F.col("id")],
        rank_col="__rn", size_col="__n")
    banded = ranked.withColumn("band", ntile_expr("__rn", "__n", 4))
    return _bands_report(stats, banded)


@query("compression_ratio_zlib_profile", extra_oracle="""
WITH cr AS (
    SELECT lang,
           CAST(zlib_len(text) AS DOUBLE)
               / nullif(octet_length(encode(text)), 0) AS ratio
    FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ratio), 6) AS mean_ratio,
       CAST(coalesce(sum(CASE WHEN ratio < 0.35 THEN 1 END), 0)
            AS BIGINT) AS n_templated
FROM cr GROUP BY lang ORDER BY lang
""")
def compression_ratio_zlib_profile(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Corpus compressibility profile: per-language doc counts and
    mean zlib compression ratio, plus the count of suspiciously
    compressible docs (< 0.35 — templated/repetitive boilerplate in
    FineWeb-style filtering). One Arrow kernel pass + a tiny keyed
    combine.

    Value oracle: EXTRA_ORACLE — DEFLATE is deterministic for a fixed
    (input, level) but has no SQL expression, so the local harnesses
    register a ``zlib_len`` Python UDF on DuckDB
    (queries/core.register_oracle_udfs) and hash-compare the full
    result at every SF; the driver's vanilla-SQL gate instead
    value-verifies the STRUCTURAL twin above
    (``compression_ratio_quality``). The byte-exact per-doc gate
    remains the pytest zlib replay (tests/test_operators.py)."""
    from ..operators.quality import compression_ratio
    docs = spread(_t(spark, sf_dir, "documents"))
    cr = compression_ratio(docs, "doc_id", "text")
    joined = docs.select(F.col("doc_id").alias("id"), "lang").join(cr, "id")
    return (joined.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 rnd(F.avg("compression_ratio"), 6).alias("mean_ratio"),
                 F.coalesce(
                     F.sum((F.col("compression_ratio") < 0.35)
                           .cast("int")),
                     F.lit(0))  # all-NULL group (every doc empty)
                 .cast("long").alias("n_templated"))
            .orderBy("lang"))


@query("lang_id_prf_report", oracle=f"""
WITH cm AS (
    SELECT lang AS labeled, {_duck_lang_case()} AS predicted,
           count(*) AS n
    FROM documents GROUP BY 1, 2
), langs AS (
    SELECT DISTINCT labeled AS lang FROM cm
), tp AS (
    SELECT labeled AS lang, sum(n) AS v FROM cm
    WHERE labeled = predicted GROUP BY 1
), act AS (
    SELECT labeled AS lang, sum(n) AS v FROM cm GROUP BY 1
), pred AS (
    SELECT predicted AS lang, sum(n) AS v FROM cm GROUP BY 1
)
SELECT l.lang,
       CAST(coalesce(act.v, 0) AS BIGINT) AS n_labeled,
       round(coalesce(tp.v, 0) / nullif(CAST(pred.v AS DOUBLE), 0),
             6) AS precision,
       round(coalesce(tp.v, 0) / nullif(CAST(act.v AS DOUBLE), 0),
             6) AS recall,
       round(2.0 * coalesce(tp.v, 0)
             / nullif(CAST(coalesce(act.v, 0) + coalesce(pred.v, 0)
                           AS DOUBLE), 0), 6) AS f1
FROM langs l
LEFT JOIN tp USING (lang)
LEFT JOIN act ON act.lang = l.lang
LEFT JOIN pred ON pred.lang = l.lang
""")
def lang_id_prf_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the stopword language-ID
    heuristic against the labeled lang column — the classifier
    scorecard a curation pipeline publishes before trusting a cheap
    detector for routing (text_lang_id gives the raw confusion
    matrix; this is its evaluated summary). F1 uses the
    2*TP/(actual+predicted) identity, so no harmonic-mean
    divide-by-zero cases; zero-support classes surface as NULLs via
    nullif on both engines. Everything aggregates the
    |langs|^2-row confusion matrix — the corpus is touched once."""
    d = spread(_t(spark, sf_dir, "documents"))
    cm = (d.select(F.col("lang").alias("labeled"),
                   predicted_lang(F.col("text")).alias("predicted"))
          .groupBy("labeled", "predicted").agg(F.count("*").alias("n")))
    cm = cm.localCheckpoint(eager=False)  # tiny; feeds four subtrees
    tp = (cm.where(F.col("labeled") == F.col("predicted"))
          .groupBy(F.col("labeled").alias("lang"))
          .agg(F.sum("n").alias("tp")))
    act = (cm.groupBy(F.col("labeled").alias("lang"))
           .agg(F.sum("n").alias("act")))
    pred = (cm.groupBy(F.col("predicted").alias("lang"))
            .agg(F.sum("n").alias("pred")))
    langs = act.select("lang")
    j = (langs.join(tp, "lang", "left")
         .join(act, "lang", "left")
         .join(pred, "lang", "left")
         .select("lang",
                 F.coalesce("tp", F.lit(0)).alias("tp"),
                 F.coalesce("act", F.lit(0)).alias("act"),
                 F.coalesce("pred", F.lit(0)).alias("pred")))
    return j.select(
        "lang", F.col("act").cast("long").alias("n_labeled"),
        rnd(F.col("tp") / F.nullif(F.col("pred").cast("double"),
                                   F.lit(0.0)), 6).alias("precision"),
        rnd(F.col("tp") / F.nullif(F.col("act").cast("double"),
                                   F.lit(0.0)), 6).alias("recall"),
        rnd(2.0 * F.col("tp")
            / F.nullif((F.col("act") + F.col("pred")).cast("double"),
                       F.lit(0.0)), 6).alias("f1"))


def _html_oracle() -> str:
    """Splice the SAME pass list the Spark expression uses into a
    nested regexp_replace chain — single source of truth."""
    from ..functions.text import HTML_STRIP_PASSES
    expr = "text"
    for pat, rep in HTML_STRIP_PASSES:
        # DuckDB string literals take no backslash escapes — splice
        # the regex verbatim, quoting only single quotes
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"""
WITH corpus AS (
    SELECT i AS rec_id,
           '<html><head><title>Doc ' || i || '</title>'
           || '<script>var x = ' || i || ';</script>'
           || '<style>p {{color: #' || i || '}}</style></head>'
           || '<body><h1>Heading ' || i || '</h1>'
           || '<p class="lead">Para &amp; sample ' || (i * 7) || '</p>'
           || '<!-- hidden ' || i || ' -->'
           || '<div>tail &lt;' || i || '&gt;&nbsp;end</div>'
           || '</body></html>' AS text
    FROM range(0, 128) t(i)
)
SELECT rec_id,
       md5(trim({expr})) AS text_md5,
       CAST(length(trim({expr})) AS BIGINT) AS n_chars
FROM corpus
"""


@query("html_text_extract", oracle=_html_oracle())
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus text extraction, value-gated byte-for-byte: a
    synthetic HTML corpus (script/style/comment blocks, entities,
    nested tags, per-id variation) runs through the shared
    regexp_replace pass list (functions/text.HTML_STRIP_PASSES) on
    both engines, and the md5 of the extracted visible text must
    match. The chain is pure JVM-side expressions — at 100 TB the
    extraction rides the WARC/crawl scan with no Python boundary."""
    from ..functions.text import html_to_text
    corpus = spark.range(128).select(
        F.col("id").alias("rec_id"),
        F.concat(
            F.lit("<html><head><title>Doc "), F.col("id"),
            F.lit("</title><script>var x = "), F.col("id"),
            F.lit(";</script><style>p {color: #"), F.col("id"),
            F.lit("}</style></head><body><h1>Heading "), F.col("id"),
            F.lit('</h1><p class="lead">Para &amp; sample '),
            F.col("id") * 7,
            F.lit("</p><!-- hidden "), F.col("id"),
            F.lit(" --><div>tail &lt;"), F.col("id"),
            F.lit("&gt;&nbsp;end</div></body></html>"),
        ).alias("text"))
    t = html_to_text(F.col("text"))
    return corpus.select("rec_id",
                         F.md5(t).alias("text_md5"),
                         F.length(t).cast("long").alias("n_chars"))


@query("ngram_diversity_by_source", oracle=f"""
WITH toks AS (
    SELECT source, string_split({_NORM}, ' ') AS t FROM documents
), g AS (
    SELECT source, 1 AS kind, t[i] AS gram
    FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    UNION ALL
    SELECT source, 2, t[i] || ' ' || t[i+1]
    FROM toks, unnest(range(1, len(t))) AS u(i)
    UNION ALL
    SELECT source, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
    FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
), a AS (
    SELECT source, kind, count(*) AS total,
           count(DISTINCT gram) AS uniq
    FROM g GROUP BY 1, 2
)
SELECT source,
       CAST(max(CASE WHEN kind = 1 THEN total END) AS BIGINT) AS n_tokens,
       CAST(max(CASE WHEN kind = 1 THEN uniq END) AS BIGINT) AS uniq_tokens,
       round(CAST(max(CASE WHEN kind = 1 THEN uniq END) AS DOUBLE)
             / max(CASE WHEN kind = 1 THEN total END), 6) AS unigram_ttr,
       round(CAST(max(CASE WHEN kind = 2 THEN uniq END) AS DOUBLE)
             / max(CASE WHEN kind = 2 THEN total END), 6) AS bigram_ttr,
       round(CAST(max(CASE WHEN kind = 3 THEN uniq END) AS DOUBLE)
             / max(CASE WHEN kind = 3 THEN total END), 6) AS trigram_ttr
FROM a GROUP BY source
""")
def ngram_diversity_by_source(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Corpus diversity card: per-source type-token ratios at n=1,2,3
    (distinct n-grams / total n-grams) — the cheap Self-BLEU proxy
    mixture designers read before weighting a source up (low TTR =
    templated/spammy, high = diverse). Grams are built from n fixed
    slices per row (the shingle_array zip trick, non-distinct here
    because the denominator needs raw counts) and the agg is one
    (source, kind, gram)-keyed distinct+count — the inverted-index
    shape, output-linear at 100 TB with uniform md5-free keys (true
    boilerplate grams are exactly what AQE skew split handles).
    A source whose docs are all shorter than n tokens reports NULL
    for that n (no such grams), identically in both engines.
    Plan shape: all three gram widths ride ONE tagged explode (one
    corpus scan, not a 3-branch union), and distinct-vs-total is the
    two-level agg — (source, kind, gram) combine first, then a
    count/sum over the gram groups — so there is no countDistinct
    Expand doubling the exploded stream."""
    # r14: token array layered as a projection column — the three
    # gram widths reference it ~10 times between them and the
    # lambda-bearing trees are exempt from codegen subexpression
    # elimination, so the inlined form re-tokenized per reference.
    docs = (spread(_t(spark, sf_dir, "documents"))
            .select("source", tokens(F.col("text")).alias("__toks")))
    toks = F.col("__toks")

    def grams(n: int):
        if n == 1:
            return toks
        width = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        shifted = [F.slice(toks, i + 1, width).alias(f"t{i}")
                   for i in range(n)]
        sh = F.transform(
            F.arrays_zip(*shifted),
            lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]))
        return F.when(F.size(toks) >= n, sh) \
                .otherwise(F.array().cast("array<string>"))

    def tag(k: int):
        # NB: a two-parameter lambda would make transform() pass the
        # ARRAY INDEX as the second argument — close over k instead
        return lambda x: F.struct(F.lit(k).alias("kind"),
                                  x.alias("gram"))

    tagged = F.concat(*[F.transform(grams(k), tag(k))
                        for k in (1, 2, 3)])
    g = (docs.select("source", F.explode(tagged).alias("kg"))
         .select("source", F.col("kg.kind").alias("kind"),
                 F.col("kg.gram").alias("gram")))
    per_gram = g.groupBy("source", "kind", "gram").agg(
        F.count(F.lit(1)).alias("c"))
    a = per_gram.groupBy("source", "kind").agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("uniq"))

    def ttr(k: int, name: str):
        u = F.max(F.when(F.col("kind") == k, F.col("uniq")))
        t = F.max(F.when(F.col("kind") == k, F.col("total")))
        return rnd(u.cast("double") / t, 6).alias(name)

    return a.groupBy("source").agg(
        F.max(F.when(F.col("kind") == 1, F.col("total")))
         .cast("long").alias("n_tokens"),
        F.max(F.when(F.col("kind") == 1, F.col("uniq")))
         .cast("long").alias("uniq_tokens"),
        ttr(1, "unigram_ttr"), ttr(2, "bigram_ttr"),
        ttr(3, "trigram_ttr"))


@query("quality_calibration_bins", oracle=f"""
WITH scored AS (
    SELECT CAST(len({_TOKS}) AS BIGINT) AS s,
           CAST(lang = 'en' AS INT) AS y
    FROM documents
), g AS (
    SELECT s, count(*) AS n, sum(y) AS pos FROM scored GROUP BY s
), c AS (
    SELECT s, n, pos,
           sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum,
           sum(n) OVER () AS total
    FROM g
)
SELECT CAST((cum - n) * 10 // total AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_scores,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(min(s) AS BIGINT) AS min_score,
       CAST(max(s) AS BIGINT) AS max_score,
       round(CAST(sum(pos) AS DOUBLE) / sum(n), 6) AS pos_rate
FROM c GROUP BY 1
""")
def quality_calibration_bins(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Reliability diagram for a quality score (the calibration
    companion to quality_score_auc, same score/label: token count vs
    lang='en'): decile bins by cumulative doc count with bin edges
    snapped to score-value boundaries (first-fit, so a heavily-tied
    score value never straddles two bins), each bin reporting its
    score range and observed positive rate. Like the AUC entry this
    is the HISTOGRAM method — the only windowed stage runs over
    |distinct score values| rows after a map-side combine, never a
    per-row global rank, and the bin id is integer arithmetic
    ((cum-n)*10 DIV total), exact in both engines at any scale."""
    from pyspark.sql import Window as W
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.size(tokens(F.col("text"))).cast("long").alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"))
    g = scored.groupBy("s").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("y").alias("pos"))
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, 0)
    c = g.select("s", "n", "pos",
                 F.sum("n").over(w).alias("cum"),
                 F.sum("n").over(W.partitionBy()).alias("total"))
    return (c.groupBy(F.expr("CAST(((cum - n) * 10) DIV total AS BIGINT)")
                      .alias("bin"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_scores"),
                 F.sum("n").cast("long").alias("n_docs"),
                 F.min("s").cast("long").alias("min_score"),
                 F.max("s").cast("long").alias("max_score"),
                 rnd(F.sum("pos").cast("double") / F.sum("n"), 6)
                 .alias("pos_rate")))


@query("domain_unigram_js", oracle=f"""
WITH tk AS (
    SELECT source, unnest(string_split({_NORM}, ' ')) AS tok
    FROM documents
), d AS (
    SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2
), tot AS (
    SELECT source, sum(c) AS t FROM d GROUP BY 1
), dist AS (
    SELECT d.source, d.tok, CAST(d.c AS DOUBLE) / tot.t AS p
    FROM d JOIN tot USING (source)
), pairs AS (
    SELECT a.source AS s1, b.source AS s2
    FROM (SELECT DISTINCT source FROM documents) a,
         (SELECT DISTINCT source FROM documents) b
    WHERE a.source < b.source
), l AS (
    SELECT p.s1, p.s2, d.tok, d.p AS p1
    FROM pairs p JOIN dist d ON d.source = p.s1
), r AS (
    SELECT p.s1, p.s2, d.tok, d.p AS p2
    FROM pairs p JOIN dist d ON d.source = p.s2
), m AS (
    SELECT coalesce(l.s1, r.s1) AS s1, coalesce(l.s2, r.s2) AS s2,
           coalesce(l.p1, 0) AS p1, coalesce(r.p2, 0) AS p2
    FROM l FULL OUTER JOIN r
      ON l.s1 = r.s1 AND l.s2 = r.s2 AND l.tok = r.tok
)
SELECT s1, s2,
       CAST(count(*) AS BIGINT) AS n_union_tokens,
       CAST(sum(CASE WHEN p1 > 0 AND p2 > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared_tokens,
       round(sum(0.5 * (CASE WHEN p1 > 0
                             THEN p1 * ln(2 * p1 / (p1 + p2))
                             ELSE 0 END
                      + CASE WHEN p2 > 0
                             THEN p2 * ln(2 * p2 / (p1 + p2))
                             ELSE 0 END)), 2) AS js_divergence
FROM m GROUP BY 1, 2
""")
def domain_unigram_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain similarity matrix: Jensen-Shannon divergence between
    every source pair's unigram distributions — the standard check
    before merging or reweighting domains in a training mix (JS=0
    identical, ln2 disjoint). Per-token contributions are identical
    doubles in both engines (same counts, same division, same ln);
    only the final sum's partial order differs, so the divergence is
    reported at 2dp (the engine-parity rule for order-sensitive
    derived moments) while the union/overlap vocabulary counts stay
    integer-exact. Scale: distributions are one (source, tok) agg;
    the pair expansion joins the per-source distribution (vocab-
    sized, NOT corpus-sized) against a #sources^2 pair dim — at 100
    TB the corpus is touched once (the distribution frame is
    materialized via the engine-standard gate before fanning out to
    both pair sides) and everything after is vocabulary-bound."""
    from pyspark.sql import Window as W

    from ..sources.registry import materialize_auto
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select("source", F.explode(tokens(F.col("text")))
                     .alias("tok"))
    d = tk.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    dist = materialize_auto(d.withColumn(
        "p", F.col("c").cast("double")
        / F.sum("c").over(W.partitionBy("source"))).drop("c"))
    srcs = dist.select("source").distinct()
    pairs = (srcs.select(F.col("source").alias("s1"))
             .join(srcs.select(F.col("source").alias("s2")),
                   F.col("s1") < F.col("s2")))
    l = pairs.join(dist.select(F.col("source").alias("s1"), "tok",
                               F.col("p").alias("p1")), "s1")
    r = pairs.join(dist.select(F.col("source").alias("s2"), "tok",
                               F.col("p").alias("p2")), "s2")
    m = (l.join(r, ["s1", "s2", "tok"], "full_outer")
         .select("s1", "s2",
                 F.coalesce("p1", F.lit(0.0)).alias("p1"),
                 F.coalesce("p2", F.lit(0.0)).alias("p2")))
    term = 0.5 * (
        F.when(F.col("p1") > 0,
               F.col("p1") * F.log(2 * F.col("p1")
                                   / (F.col("p1") + F.col("p2"))))
         .otherwise(0.0)
        + F.when(F.col("p2") > 0,
                 F.col("p2") * F.log(2 * F.col("p2")
                                     / (F.col("p1") + F.col("p2"))))
           .otherwise(0.0))
    return m.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_tokens"),
        F.sum(((F.col("p1") > 0) & (F.col("p2") > 0)).cast("int"))
         .cast("long").alias("n_shared_tokens"),
        rnd(F.sum(term), 2).alias("js_divergence"))


@query("doc_length_percentiles_by_source", oracle=f"""
WITH scored AS (
    SELECT source, CAST(len({_TOKS}) AS BIGINT) AS s FROM documents
), g AS (
    SELECT source, s, count(*) AS c FROM scored GROUP BY 1, 2
), cum AS (
    SELECT source, s, c,
           sum(c) OVER (PARTITION BY source ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY source) AS n
    FROM g
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(min(s) AS BIGINT) AS min_tokens,
       CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN s END)
            AS BIGINT) AS p50_tokens,
       CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN s END)
            AS BIGINT) AS p90_tokens,
       CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN s END)
            AS BIGINT) AS p99_tokens,
       CAST(max(s) AS BIGINT) AS max_tokens
FROM cum GROUP BY source
""")
def doc_length_percentiles_by_source(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Data-card staple: EXACT token-length percentiles per source
    (p50/p90/p99 by the nearest-rank convention, rank = ceil(p*n)
    computed as integer arithmetic so both engines agree with no
    float boundary). Same histogram method as the calibration bins:
    one (source, length) combine, then windows over the per-source
    DISTINCT-length histogram — never a per-row sort, so at 100 TB
    the wide stage carries |sources| x |distinct lengths| rows. The
    exact answer at percentile extremes (p99.9 tail audits) is where
    approx_percentile's error bound bites; this plan makes exactness
    as cheap as the sketch for integer-valued scores."""
    from pyspark.sql import Window as W
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("s"))
    g = scored.groupBy("source", "s").agg(F.count(F.lit(1)).alias("c"))
    cum = g.select(
        "source", "s",
        F.sum("c").over(W.partitionBy("source").orderBy("s")
                        .rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("c").over(W.partitionBy("source")).alias("n"))

    def pct(mult: int, div: int, name: str):
        r = F.expr(f"({mult} * n + {mult}) DIV {div}")
        return (F.min(F.when(F.col("cum") >= r, F.col("s")))
                .cast("long").alias(name))

    return cum.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.min("s").cast("long").alias("min_tokens"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"),
                     F.col("s"))).cast("long").alias("p50_tokens"),
        pct(9, 10, "p90_tokens"),
        pct(99, 100, "p99_tokens"),
        F.max("s").cast("long").alias("max_tokens"))


@query("cms_token_estimates", oracle=f"""
WITH t AS (
    SELECT unnest({_TOKS}) AS tok FROM documents
), pos AS (
    SELECT tok, j,
           ('0x' || substring(md5(tok || ':' || j), 1, 7))::BIGINT
               % 1024 AS p
    FROM t, unnest([0, 1, 2]) AS tj(j)
), sketch AS (
    SELECT j, p, count(*) AS cnt FROM pos GROUP BY 1, 2
), exact AS (
    SELECT tok, count(*) AS n FROM t GROUP BY 1
    ORDER BY n DESC, tok LIMIT 20
), ep AS (
    SELECT tok, n, j,
           ('0x' || substring(md5(tok || ':' || j), 1, 7))::BIGINT
               % 1024 AS p
    FROM exact, unnest([0, 1, 2]) AS tj(j)
)
SELECT ep.tok AS tok,
       CAST(min(ep.n) AS BIGINT) AS n_exact,
       CAST(min(s.cnt) AS BIGINT) AS n_cms,
       CAST(min(s.cnt) - min(ep.n) AS BIGINT) AS overcount
FROM ep JOIN sketch s USING (j, p)
GROUP BY ep.tok
""")
def cms_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch (3 x 1024) frequency estimates for the exact
    top-20 tokens (operators/selection.py:cms_token_counts). The
    md5-derived cell layout makes the sketch bit-reproducible, so
    the per-token overcount — normally only bounded in expectation —
    is here an exact integer the DuckDB replay must match: a
    value-gated sketch, completing the engine's sketch canon (HLL
    distincts, GK quantiles, Misra-Gries heavy hitters, MinHash /
    SimHash / SRP similarity, Bloom membership, CMS frequency)."""
    from ..operators.selection import cms_token_counts
    docs = _t(spark, sf_dir, "documents")
    return cms_token_counts(docs, "text", width=1024, depth=3, k=20)


@query("conformal_quality_coverage", oracle=f"""
WITH scored AS (
    SELECT doc_id,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
               ::BIGINT % 2 = 0 AS is_calib,
           round(0.4 * least(1.0, CAST(len({_TOKS}) AS DOUBLE) / 100.0)
               + 0.3 * (1.0 - CAST(length(regexp_replace(text,
                             '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                             / length(text))
               + 0.3 * (CAST(len(list_filter({_TOKS},
                              t -> list_contains([{_EN_SW}], t)))
                             AS DOUBLE) / len({_TOKS})), 4) AS s
    FROM documents
), nc AS (
    SELECT count(*) AS n_calib FROM scored WHERE is_calib
), kth AS (
    SELECT greatest(1, (n_calib + 1) // 10) AS k, n_calib FROM nc
), hist AS (
    SELECT s, count(*) AS c FROM scored WHERE is_calib GROUP BY s
), cum AS (
    SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM hist
), thr AS (
    SELECT min(s) AS q_hat FROM cum, kth WHERE cum >= kth.k
)
SELECT CAST(kth.n_calib AS BIGINT) AS n_calib,
       CAST(kth.k AS BIGINT) AS k,
       thr.q_hat AS q_hat,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN t.s >= thr.q_hat THEN 1 ELSE 0 END)
            AS BIGINT) AS n_test_covered,
       round(10000.0 * sum(CASE WHEN t.s >= thr.q_hat
                           THEN 1 ELSE 0 END) / count(*)) / 10000.0
           AS coverage,
       abs(1.0 * sum(CASE WHEN t.s >= thr.q_hat THEN 1 ELSE 0 END)
           / count(*) - 0.9) <= 0.08 AS coverage_near_target
FROM scored t, thr, kth WHERE NOT t.is_calib
GROUP BY kth.n_calib, kth.k, thr.q_hat
""")
def conformal_quality_coverage(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the quality score (Vovk's
    distribution-free guarantee, the modern ML-ops answer to "what
    threshold keeps 90% of typical documents?"): an md5-deterministic
    half of the corpus calibrates, q_hat = the k-th smallest
    calibration score with k = floor((n+1) * alpha) at alpha = 0.1
    (nearest-rank over the score histogram — integer arithmetic, no
    float quantile), and the held-out half's measured coverage
    P(score >= q_hat) lands near 1 - alpha WITHOUT any distribution
    assumption — the gate pins |coverage - 0.9| <= 0.08, verified at
    all three SFs. Scale: one score scan, one histogram combine; the
    threshold is a broadcast scalar. The unpartitioned cumulative
    window (Spark warns "No Partition Defined for Window") runs over
    the ROUNDED-SCORE HISTOGRAM — scores round to 4 decimals in
    [0, 1], so the frame is <= 10^4 rows at any corpus size, not the
    corpus itself; the warning is benign and the site is pinned in
    tests/test_plan_quality.py's global-window audit."""
    from pyspark.sql import Window as W
    d = spread(_t(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    quality = (
        0.4 * F.least(F.lit(1.0), F.size(toks).cast("double") / 100.0)
        + 0.3 * (1.0 - punct_ratio(F.col("text")))
        + 0.3 * stopword_ratio(F.col("text"), "en"))
    scored = d.select(
        ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                             1, 6), 16, 10).cast("long") % 2) == 0)
        .alias("is_calib"),
        rnd(quality, 4).alias("s"))
    calib = scored.where("is_calib")
    nc = calib.agg(F.count(F.lit(1)).alias("n_calib")).select(
        "n_calib",
        F.greatest(F.lit(1), F.expr("(n_calib + 1) DIV 10")).alias("k"))
    hist = calib.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.select(
        "s", F.sum("c").over(W.orderBy("s")
                             .rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"))
    thr = (cum.crossJoin(F.broadcast(nc))
           .where(F.col("cum") >= F.col("k"))
           .agg(F.min("s").alias("q_hat")))
    test = scored.where(~F.col("is_calib"))
    covered = F.sum((F.col("s") >= F.col("q_hat")).cast("int"))
    return (test.crossJoin(F.broadcast(thr)).crossJoin(F.broadcast(nc))
            .groupBy("n_calib", "k", "q_hat")
            .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
                 covered.cast("long").alias("n_test_covered"),
                 rnd(covered / F.count(F.lit(1)), 4).alias("coverage"),
                 (F.abs(covered / F.count(F.lit(1)) - 0.9) <= 0.08)
                 .alias("coverage_near_target"))
            .select(F.col("n_calib").cast("long").alias("n_calib"),
                    F.col("k").cast("long").alias("k"), "q_hat",
                    "n_test", "n_test_covered", "coverage",
                    "coverage_near_target"))


@query("url_canonicalization", oracle="""
WITH d AS (
    SELECT doc_id, lang, doc_id % 6 AS i,
           CAST(doc_id % 50 AS VARCHAR) AS hn,
           CAST(doc_id AS VARCHAR) AS ds
    FROM documents
)
SELECT doc_id,
       CASE i
           WHEN 0 THEN 'https://example' || hn || '.com/docs/'
                       || lang || '/' || ds || '?a=1&b=2'
           WHEN 1 THEN 'http://example' || hn || '.com/docs/'
                       || lang || '/' || ds
           WHEN 2 THEN 'https://sub.example' || hn || '.co.uk/p/'
                       || ds || '?x=9'
           WHEN 3 THEN 'https://example' || hn || '.com/'
           WHEN 4 THEN 'https://example' || hn || '.com:8443/a/'
                       || ds || '?ref=v' || ds
       END AS url_norm,
       CASE WHEN i = 2 THEN 'sub.example' || hn || '.co.uk'
            WHEN i <> 5 THEN 'example' || hn || '.com' END AS host,
       CASE WHEN i = 2 THEN 'example' || hn || '.co.uk'
            WHEN i <> 5 THEN 'example' || hn || '.com' END AS domain
FROM d
""")
def url_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over a synthetic recrawl corpus: each doc
    cycles through the noisy-variant families a crawler actually
    emits (case-shuffled scheme/host, www + default ports, tracking
    params + unsorted query + fragment, userinfo, second-level ccTLD
    registries, content-selecting `ref` kept vs `ref_src` stripped,
    trailing-slash/empty-path, unparseable garbage -> NULL). The
    Spark side must PARSE (try_parse_url expression pipeline,
    functions/web.py — pure JVM, no Python stage); the oracle
    CONSTRUCTS the expected canonical form analytically from the
    same fields, so the parse->normalize pipeline is value-gated
    end-to-end. Scale: a projection inside whole-stage codegen —
    URL-keyed crawl dedup pays zero shuffle until its final groupBy."""
    from ..functions.web import (_psl_rules, _raw_host,
                                 host_label_candidates,
                                 psl_domain_from_candidates,
                                 registered_domain, url_normalize_fields,
                                 url_normalize_from_fields)

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        (F.col("doc_id") % 6).alias("i"),
        (F.col("doc_id") % 50).cast("string").alias("hn"),
        F.col("doc_id").cast("string").alias("ds"))
    raw = (
        F.when(F.col("i") == 0, F.concat(
            F.lit("HTTPS://WWW.Example"), F.col("hn"),
            F.lit(".COM:443/docs/"), F.col("lang"), F.lit("/"),
            F.col("ds"), F.lit("/?utm_source=mail&b=2&a=1#frag")))
        .when(F.col("i") == 1, F.concat(
            F.lit("http://example"), F.col("hn"), F.lit(".com:80/docs/"),
            F.col("lang"), F.lit("/"), F.col("ds")))
        .when(F.col("i") == 2, F.concat(
            F.lit("https://user:pw@sub.example"), F.col("hn"),
            F.lit(".co.uk/p/"), F.col("ds"), F.lit("?gclid=1&x=9")))
        .when(F.col("i") == 3, F.concat(
            F.lit("https://example"), F.col("hn"), F.lit(".com")))
        .when(F.col("i") == 4, F.concat(
            F.lit("https://example"), F.col("hn"), F.lit(".com:8443/a/"),
            F.col("ds"), F.lit("?ref=v"), F.col("ds"),
            F.lit("&ref_src=tw")))
        .otherwise(F.concat(F.lit("not a url "), F.col("ds"))))
    # r14 layered projections (guide §4 per-row work): the URL string,
    # the five try_parse_url extractions, the raw host and its PSL
    # candidate array each materialize ONCE as projection columns.
    # The inline form re-built the when-chain URL and RE-PARSED it at
    # every reference — the assembled tree holds lambdas (tracking-
    # param filter, PSL probes), which exempts it from codegen
    # subexpression elimination, and the PSL probe lambdas re-parsed
    # the URL per candidate element. Was the heaviest registry entry
    # (1.08 s at sf0.1); expression-per-field identical, same oracle
    # hash at both SFs.
    rules = _psl_rules()
    if rules is None:  # no PSL readable: keep the reference tree
        from ..functions.web import url_host, url_normalize
        return d.select(
            "doc_id",
            url_normalize(raw).alias("url_norm"),
            url_host(raw).alias("host"),
            registered_domain(raw).alias("domain"))
    s1 = d.select("doc_id", raw.alias("__url"))
    f = url_normalize_fields(F.col("__url"))
    s2 = s1.select(
        "doc_id",
        f["scheme"].alias("__scheme"), f["host"].alias("__host"),
        f["auth"].alias("__auth"), f["raw_path"].alias("__path"),
        f["raw_query"].alias("__q"),
        _raw_host(F.col("__url")).alias("__rawhost"))
    s3 = s2.select(
        "doc_id", "__scheme", "__host", "__auth", "__path", "__q",
        "__rawhost",
        host_label_candidates(F.col("__rawhost")).alias("__cands"))
    return s3.select(
        "doc_id",
        url_normalize_from_fields(
            F.col("__scheme"), F.col("__host"), F.col("__auth"),
            F.col("__path"), F.col("__q")).alias("url_norm"),
        F.col("__host").alias("host"),
        psl_domain_from_candidates(
            F.col("__rawhost"), F.col("__cands"), rules).alias("domain"))


@query("registered_domain_rollup", oracle="""
WITH d AS (
    SELECT doc_id, doc_id % 8 AS i,
           CAST(doc_id % 50 AS VARCHAR) AS hn
    FROM documents
), dom AS (
    SELECT doc_id,
           CASE i
               WHEN 0 THEN 'example' || hn || '.com'
               WHEN 1 THEN 'example' || hn || '.co.uk'
               WHEN 2 THEN 'example' || hn || '.com.br'
               WHEN 3 THEN 'user' || hn || '.github.io'
               WHEN 4 THEN 'city.kawasaki.jp'
               WHEN 5 THEN 'x' || hn || '.other.kawasaki.jp'
               WHEN 6 THEN 'foo' || hn || '.bar.bd'
           END AS domain
    FROM d
)
SELECT domain,
       count(*) AS n_docs,
       min(doc_id) AS first_doc
FROM dom GROUP BY domain
""")
def registered_domain_rollup(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Registrable-domain rollup over a synthetic crawl whose hosts
    cycle through every Public Suffix List rule FORM: plain gTLD,
    multi-label ccTLD registries (.co.uk, .com.br), the private
    section (user github.io subdomains are registration boundaries),
    an exception rule (!city.kawasaki.jp), a wildcard rule
    (*.kawasaki.jp -> x.other.kawasaki.jp is itself registrable), a
    wildcard-only TLD (*.bd), and unparseable garbage (-> NULL
    group). The Spark side PARSES with the packaged-PSL
    ``registered_domain`` matcher (functions/web.py — pure InSet
    codegen, no join/Python stage); the oracle CONSTRUCTS the
    expected registrable domain analytically per family, so the full
    official algorithm (longest match + exception override +
    implicit *) is value-gated end-to-end. Scale: per-domain crawl
    budgeting/dedup keying is one codegen projection + one groupBy —
    the only shuffle is the final rollup."""
    from ..functions.web import (_psl_rules, _raw_host,
                                 host_label_candidates,
                                 psl_domain_from_candidates,
                                 registered_domain)

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("i"),
        (F.col("doc_id") % 50).cast("string").alias("hn"))
    url = (
        F.when(F.col("i") == 0, F.concat(
            F.lit("https://www.Example"), F.col("hn"), F.lit(".COM/a")))
        .when(F.col("i") == 1, F.concat(
            F.lit("https://sub.example"), F.col("hn"), F.lit(".co.uk/p")))
        .when(F.col("i") == 2, F.concat(
            F.lit("http://a.example"), F.col("hn"), F.lit(".com.br/")))
        .when(F.col("i") == 3, F.concat(
            F.lit("https://user"), F.col("hn"), F.lit(".github.io/repo")))
        .when(F.col("i") == 4, F.lit("https://ward.city.kawasaki.jp/x"))
        .when(F.col("i") == 5, F.concat(
            F.lit("https://x"), F.col("hn"),
            F.lit(".other.kawasaki.jp/")))
        .when(F.col("i") == 6, F.concat(
            F.lit("https://deep.foo"), F.col("hn"), F.lit(".bar.bd/")))
        .otherwise(F.concat(F.lit("nota url "), F.col("doc_id"))))
    # r14: URL / host / PSL-candidate array layered as projection
    # columns (same re-parse-per-probe mechanism as
    # url_canonicalization — see there).
    rules = _psl_rules()
    if rules is None:  # no PSL readable: keep the reference tree
        dom = d.select("doc_id", registered_domain(url).alias("domain"))
    else:
        s1 = d.select("doc_id", _raw_host(url).alias("__rawhost"))
        s2 = s1.select(
            "doc_id", "__rawhost",
            host_label_candidates(F.col("__rawhost")).alias("__cands"))
        dom = s2.select(
            "doc_id",
            psl_domain_from_candidates(
                F.col("__rawhost"), F.col("__cands"), rules)
            .alias("domain"))
    return (dom
            .groupBy("domain")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("doc_id").alias("first_doc")))
