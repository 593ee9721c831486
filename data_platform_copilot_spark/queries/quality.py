"""Repetition-filter quality signals over the documents table,
value-verified against a DuckDB oracle replaying the identical gram
arithmetic (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.quality import repetition_signals
from .core import _t, query, rnd

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), g AS (
    SELECT doc_id, 1 AS kind, t[i] AS gram
    FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    UNION ALL
    SELECT doc_id, 2, t[i] || ' ' || t[i+1]
    FROM toks, unnest(range(1, len(t))) AS u(i)
    UNION ALL
    SELECT doc_id, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
    FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
), f AS (
    SELECT doc_id, kind, gram, count(*) AS c FROM g GROUP BY 1, 2, 3
)
SELECT doc_id,
       round(CAST(max(CASE WHEN kind = 1 THEN c END) AS DOUBLE)
             / sum(CASE WHEN kind = 1 THEN c END), 4) AS top_token_share,
       round(CAST(max(CASE WHEN kind = 2 THEN c END) AS DOUBLE)
             / sum(CASE WHEN kind = 2 THEN c END), 4) AS top_bigram_share,
       round(1.0 - CAST(count(CASE WHEN kind = 3 THEN 1 END) AS DOUBLE)
             / sum(CASE WHEN kind = 3 THEN c END), 4) AS dup_trigram_frac
FROM f
GROUP BY doc_id
"""


@query("text_repetition_signals", oracle=_ORACLE)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition filters: top-token share,
    top-bigram share, duplicate-trigram fraction per document."""
    sig = repetition_signals(_t(spark, sf_dir, "documents"),
                             "doc_id", "text")
    return sig.select(
        sig["id"].alias("doc_id"),
        rnd("top_token_share", 4).alias("top_token_share"),
        rnd("top_bigram_share", 4).alias("top_bigram_share"),
        rnd("dup_trigram_frac", 4).alias("dup_trigram_frac"),
    )


_CHUNK, _OVERLAP = 32, 8
_STEP = _CHUNK - _OVERLAP


@query("doc_chunking", oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), starts AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, {_STEP})) AS start
    FROM toks
)
SELECT doc_id,
       CAST((start - 1) / {_STEP} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_token,
       CAST(len(list_slice(t, start, start + {_CHUNK} - 1))
            AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(t, start, start + {_CHUNK} - 1), ' '))
           AS chunk_fp
FROM starts
""")
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (32-token windows, 8-token overlap):
    every window's position, length and content fingerprint
    value-verify against DuckDB replaying the identical slicing."""
    from ..operators.quality import chunk_documents
    from pyspark.sql import functions as F
    ch = chunk_documents(_t(spark, sf_dir, "documents"),
                         "doc_id", "text",
                         chunk_tokens=_CHUNK, overlap=_OVERLAP)
    return ch.select(
        ch["id"].alias("doc_id"), "chunk_idx", "start_token", "n_tokens",
        F.md5("chunk_text").alias("chunk_fp"))


@query("pii_redaction", oracle="""
WITH corpus AS (
    SELECT i AS rec_id,
           'contact user' || i || ' at user' || i ||
           '@example.com or +1-555-' || (1000 + i % 9000) ||
           ' from host 10.' || (i % 256) || '.' || ((i * 7) % 256) ||
           '.' || ((i * 13) % 256) AS text
    FROM range(0, 200) t(i)
)
, s1 AS (
    SELECT rec_id, text,
           regexp_replace(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
               '<EMAIL>', 'g') AS t1
    FROM corpus
), s2 AS (
    SELECT rec_id, text, t1,
           regexp_replace(t1,
               '\\+?[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS t2
    FROM s1
)
-- progressive counting (kind k counted AFTER replacing kinds before
-- it) so each count equals the replacements actually made — mirrors
-- operators/quality.redact_pii exactly
SELECT rec_id,
       CAST(len(regexp_extract_all(text,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(t1,
           '\\+?[0-9][0-9-]{6,}[0-9]')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t2,
           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
           AS BIGINT) AS n_ips,
       md5(regexp_replace(t2,
           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
           '<IP>', 'g')) AS redacted_fp
FROM s2
""")
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a deterministic synthetic corpus (emails,
    phones, IPs planted per row): per-kind counts and the md5 of the
    redacted text value-verify that both engines found and replaced
    the exact same spans."""
    from pyspark.sql import functions as F

    from ..operators.quality import redact_pii
    corpus = (spark.range(200)
              .select(F.col("id").alias("rec_id"),
                      F.concat(
                          F.lit("contact user"), F.col("id"),
                          F.lit(" at user"), F.col("id"),
                          F.lit("@example.com or +1-555-"),
                          (F.lit(1000) + F.col("id") % 9000),
                          F.lit(" from host 10."), F.col("id") % 256,
                          F.lit("."), (F.col("id") * 7) % 256,
                          F.lit("."), (F.col("id") * 13) % 256,
                      ).alias("text")))
    out = redact_pii(corpus, "text")
    return out.select("rec_id", "n_emails", "n_phones", "n_ips",
                      F.md5("redacted").alias("redacted_fp"))


_HEXP = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) * {16 ** (5 - i)}"
    for i in range(6))


@query("chunk_packing", oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), starts AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, {_STEP})) AS start
    FROM toks
), ch AS (
    SELECT doc_id,
           CAST((start - 1) / {_STEP} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(t, start, start + {_CHUNK} - 1))
                AS BIGINT) AS n_tokens,
           ({_HEXP}) % 8 AS shard
    FROM starts
), o AS (
    SELECT doc_id, chunk_idx, n_tokens, shard,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS token_offset
    FROM ch
)
SELECT doc_id, chunk_idx,
       CAST(shard AS BIGINT) AS shard,
       CAST(token_offset AS BIGINT) AS token_offset,
       CAST(floor(token_offset / 512) AS BIGINT) AS bin
FROM o
""")
def chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut packing of the 32-token chunks into 512-token
    training bins across 8 deterministic shards; every chunk's shard,
    token offset and bin value-verify against DuckDB replaying the
    identical cumsum."""
    from ..operators.quality import chunk_documents, pack_chunks
    ch = chunk_documents(_t(spark, sf_dir, "documents"),
                         "doc_id", "text",
                         chunk_tokens=_CHUNK, overlap=_OVERLAP)
    packed = pack_chunks(ch, "id", "chunk_idx", "n_tokens",
                         capacity=512, shards=8)
    return packed.select(
        packed["id"].alias("doc_id"), "chunk_idx", "shard",
        "token_offset", "bin")


_GOPHER_STOPS = ("'the','be','to','of','and','a','in','that','have',"
                 "'with'")

# Spark's array_intersect preserves first-array order; DuckDB's
# list_intersect makes no order promise — only the SIZE is compared,
# so both are safe here.
_GQF = f"""
WITH t AS (
    SELECT doc_id, {_NORM} AS norm,
           string_split({_NORM}, ' ') AS toks
    FROM documents
), m AS (
    SELECT doc_id,
           len(toks) AS n,
           list_sum(list_transform(toks, x -> length(x)))::DOUBLE
               / len(toks) AS mean_len,
           (length(norm) - length(replace(norm, '#', ''))
            + len(regexp_extract_all(norm, '\\.\\.\\.')))::DOUBLE
               / len(toks) AS sym_ratio,
           len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
               / len(toks) AS alpha_frac,
           len(list_intersect(toks, [{_GOPHER_STOPS}])) AS stop_hits
    FROM t
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       round(mean_len, 4) AS mean_word_len,
       n >= 30 AND n <= 100000 AS ok_word_count,
       mean_len >= 3.0 AND mean_len <= 10.0 AS ok_mean_word_len,
       sym_ratio <= 0.1 AS ok_symbol_ratio,
       alpha_frac >= 0.8 AS ok_alpha_words,
       stop_hits >= 1 AS ok_stopwords,
       (n >= 30 AND n <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
           AND sym_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 1
           AS keep
FROM m
"""


@query("quality_filter_gopher", oracle=_GQF)
def quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-ensemble quality filter (Rae et al. 2021 §A1.1)
    over the documents table. Operator defaults are the paper's
    thresholds; this entry adapts min_words to 30 and min_stopwords
    to 1 so the synthetic corpus (10-100 words/doc, 0-2 distinct
    stopwords) yields a genuine keep/drop split in both engines.
    Every rule is its own audited boolean; pure codegen expressions,
    zero shuffles."""
    from ..operators.quality import gopher_quality_filter
    out = gopher_quality_filter(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        min_words=30, min_stopwords=1)
    return out.select(
        "doc_id", "n_words", rnd("mean_word_len", 4).alias("mean_word_len"),
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_alpha_words", "ok_stopwords", "keep")


_TOKS_Q = f"string_split({_NORM}, ' ')"

_DECON_SQL = f"""
WITH norm AS (
    SELECT doc_id, {_TOKS_Q} AS t FROM documents
), corpus AS (
    SELECT doc_id, t FROM norm
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, list_concat(['zzz'], t) AS t
    FROM norm WHERE doc_id % 97 = 0
), cg AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS fp
    FROM corpus, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE len(t) >= 13
), eg AS (
    SELECT DISTINCT md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS fp
    FROM norm, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE doc_id % 97 = 0 AND len(t) >= 13
), h AS (
    SELECT doc_id, count(*) AS c FROM cg JOIN eg USING (fp) GROUP BY 1
)
SELECT c.doc_id AS doc_id,
       CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_ngrams,
       coalesce(h.c, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN h USING (doc_id)
"""


@query("decontamination", oracle=_DECON_SQL)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C 13-gram rule)
    with PLANTED contamination: the eval split is doc_id % 97 == 0;
    each eval doc re-enters the corpus prefixed with one token, so
    its interior 13-grams survive verbatim and the planted copies
    must flag. Eval docs themselves self-match (a training corpus
    containing its own benchmark is exactly what the rule exists to
    catch); docs under 13 words emit no grams and report 0."""
    from pyspark.sql import functions as F

    from ..operators.quality import decontaminate
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 97 == 0)
    planted = eval_df.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.col("text")).alias("text"))
    corpus = docs.select("doc_id", "text").unionByName(planted)
    out = decontaminate(corpus, "doc_id", "text",
                        eval_df, "doc_id", "text", n=13)
    return out.select(out["id"].alias("doc_id"), "n_hit_ngrams",
                      "contaminated")


_DSIR_BUCKETS, _DSIR_K = 64, 100

_DSIR_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang = 'en' AS tgt, string_split({_NORM}, ' ') AS t
    FROM documents
), bg AS (
    SELECT doc_id, tgt,
           ('0x' || substring(md5(t[i] || ' ' || t[i+1]), 1, 8))::BIGINT
               % {_DSIR_BUCKETS} AS bucket
    FROM toks, unnest(range(1, len(t))) AS u(i)
), dist AS (
    SELECT bucket,
           sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc,
           count(*) AS rc
    FROM bg GROUP BY 1
), tot AS (
    SELECT sum(tc) AS tt, sum(rc) AS rt FROM dist
), scored AS (
    SELECT bucket,
           ln((tc + 1.0) / (tt + {_DSIR_BUCKETS}))
         - ln((rc + 1.0) / (rt + {_DSIR_BUCKETS})) AS logratio
    FROM dist CROSS JOIN tot
)
-- per-INSTANCE sum (not per-bucket c * ratio): both engines then sum
-- the identical multiset of doubles, so the 4-decimal rounding sees
-- the same value on both sides.
SELECT bg.doc_id AS doc_id,
       round(sum(s.logratio), 4) AS dsir_logweight,
       CAST(count(*) AS BIGINT) AS n_bigrams
FROM bg JOIN scored s USING (bucket)
GROUP BY 1
ORDER BY sum(s.logratio) DESC, doc_id
LIMIT {_DSIR_K}
"""


@query("dsir_importance_resample", oracle=_DSIR_SQL)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169):
    hashed-bigram importance weights targeting the English slice of
    the corpus (p_target = lang='en' docs, p_raw = all docs); top-100
    docs by log-weight are the selected subset. The DuckDB oracle
    replays the identical md5 bucketing, add-1 smoothing and
    log-ratio arithmetic."""
    from pyspark.sql import functions as F

    from ..operators.selection import importance_resample_dsir
    out = importance_resample_dsir(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        target=F.col("lang") == "en",
        n_buckets=_DSIR_BUCKETS, k=_DSIR_K)
    return out.select(out["id"].alias("doc_id"),
                      rnd("dsir_logweight", 4).alias("dsir_logweight"),
                      "n_bigrams")


@query("unigram_logprob_score", oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
    FROM documents
), tk AS (
    SELECT doc_id, tok FROM toks WHERE length(tok) > 0
), vocab AS (
    SELECT tok, count(*) AS ct FROM tk GROUP BY 1
), tot AS (
    SELECT sum(ct) AS n_total FROM vocab
), dt AS (
    SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2
)
SELECT dt.doc_id AS doc_id,
       CAST(sum(dt.c) AS BIGINT) AS n_tokens,
       round(sum(dt.c * ln(CAST(v.ct AS DOUBLE) / tot.n_total))
             / sum(dt.c), 4) AS avg_logprob
FROM dt JOIN vocab v USING (tok) CROSS JOIN tot
GROUP BY 1
""")
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal (CCNet-class pipelines filter
    on LM perplexity; the engine-internal stand-in scores each doc's
    mean token log-probability under the corpus's own unigram MLE).
    Token-keyed shuffle join — the vocab is deliberately NOT
    broadcast: at web scale it is its own big table."""
    from ..operators.selection import unigram_logprob_scores
    out = unigram_logprob_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(out["id"].alias("doc_id"), "n_tokens",
                      rnd("avg_logprob", 4).alias("avg_logprob"))


_BM25_TERMS = ("hash", "merge", "scan", "join")
_BM25_K = 20

@query("bm25_topk_docs", oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
    FROM documents
), tk AS (
    SELECT doc_id, tok FROM toks WHERE length(tok) > 0
), doclen AS (
    SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1
), corpus AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen
), tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM tk WHERE tok IN {_BM25_TERMS!r}
    GROUP BY 1, 2
), dft AS (
    SELECT tok, count(*) AS dft FROM tf GROUP BY 1
), s AS (
    SELECT tf.doc_id,
           ln(1.0 + (c.n_docs - d.dft + 0.5) / (d.dft + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl)) AS s
    FROM tf
    JOIN dft d USING (tok)
    JOIN doclen l USING (doc_id)
    CROSS JOIN corpus c
)
SELECT doc_id, round(sum(s), 4) AS bm25,
       CAST(count(*) AS BIGINT) AS n_hits
FROM s GROUP BY 1
ORDER BY sum(s) DESC, doc_id
LIMIT {_BM25_K}
""")
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 sparse retrieval (Robertson/Zaragoza 2009 formulation,
    Lucene idf) for a fixed operator-vocabulary query over the
    documents table — the full-text upgrade of the reference's
    token-overlap RAG retrieval (src/chain.py:36-47). The oracle
    replays tf, df, length normalization and the positive idf
    exactly."""
    from ..operators.selection import bm25_topk
    out = bm25_topk(_t(spark, sf_dir, "documents"), "doc_id", "text",
                    list(_BM25_TERMS), k=_BM25_K)
    return out.select(out["id"].alias("doc_id"),
                      rnd("bm25", 4).alias("bm25"), "n_hits")


_FUZZY_THRESHOLD = 0.5

@query("decontamination_fuzzy", oracle=f"""
WITH norm AS (
    SELECT doc_id, {_TOKS_Q} AS t FROM documents
), corpus AS (
    SELECT doc_id, t FROM norm
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, list_concat(['zzz'], t) AS t
    FROM norm WHERE doc_id % 97 = 0
), sh_c AS (
    SELECT DISTINCT doc_id AS id,
           concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM corpus, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
    WHERE len(t) >= 3
      AND length(concat_ws(' ', t[i], t[i+1], t[i+2])) > 0
), sh_e AS (
    SELECT DISTINCT doc_id AS eid,
           concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM norm, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
    WHERE doc_id % 97 = 0 AND len(t) >= 3
      AND length(concat_ws(' ', t[i], t[i+1], t[i+2])) > 0
), cs AS (SELECT id, count(*) AS csize FROM sh_c GROUP BY 1),
es AS (SELECT eid, count(*) AS esize FROM sh_e GROUP BY 1),
cm AS (
    SELECT id, eid, count(*) AS common
    FROM sh_c JOIN sh_e USING (shingle) GROUP BY 1, 2
), jac AS (
    SELECT id,
           CAST(common AS DOUBLE) / (csize + esize - common) AS jaccard
    FROM cm JOIN cs USING (id) JOIN es USING (eid)
    WHERE CAST(common AS DOUBLE) / (csize + esize - common)
          >= {_FUZZY_THRESHOLD}
), per_doc AS (
    SELECT id, count(*) AS n_eval_matches, max(jaccard) AS mx
    FROM jac GROUP BY 1
)
SELECT c.doc_id AS doc_id,
       CAST(coalesce(p.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       round(p.mx, 4) AS max_jaccard,
       coalesce(p.n_eval_matches, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN per_doc p ON p.id = c.doc_id
""")
def decontamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate benchmark decontamination (trigram-shingle
    Jaccard >= 0.5 against the eval split) over the SAME planted
    corpus as the exact 13-gram entry: each planted copy ('zzz '
    prefix, +1000000 id) is a lightly-edited eval duplicate — the
    case the verbatim rule exists to catch and the fuzzy rule must
    also catch, while short/clean docs stay unflagged."""
    from pyspark.sql import functions as F

    from ..operators.quality import decontaminate_fuzzy
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 97 == 0)
    planted = eval_df.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.col("text")).alias("text"))
    corpus = docs.select("doc_id", "text").unionByName(planted)
    out = decontaminate_fuzzy(corpus, "doc_id", "text",
                              eval_df, "doc_id", "text",
                              n=3, threshold=_FUZZY_THRESHOLD)
    return out.select(out["id"].alias("doc_id"), "n_eval_matches",
                      rnd("max_jaccard", 4).alias("max_jaccard"),
                      "contaminated")


@query("snapshot_diff_documents", oracle="""
WITH old AS (
    SELECT doc_id, text, lang, source FROM documents
), new AS (
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END
               AS text,
           lang, source
    FROM documents WHERE doc_id % 29 <> 0
    UNION ALL
    SELECT doc_id + 2000000, text, lang, source
    FROM documents WHERE doc_id % 41 = 0
), o AS (
    SELECT doc_id,
           md5(CASE WHEN text IS NULL THEN 'n'
                    ELSE length(text) || ':' || text END
            || CASE WHEN lang IS NULL THEN 'n'
                    ELSE length(lang) || ':' || lang END
            || CASE WHEN source IS NULL THEN 'n'
                    ELSE length(source) || ':' || source END) AS old_fp
    FROM old
), n AS (
    SELECT doc_id,
           md5(CASE WHEN text IS NULL THEN 'n'
                    ELSE length(text) || ':' || text END
            || CASE WHEN lang IS NULL THEN 'n'
                    ELSE length(lang) || ':' || lang END
            || CASE WHEN source IS NULL THEN 'n'
                    ELSE length(source) || ':' || source END) AS new_fp
    FROM new
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_fp, new_fp,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp <> new_fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n USING (doc_id)
""")
def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (the crawl-over-crawl change feed every
    incremental training-data pipeline starts from): documents vs a
    deterministically perturbed next snapshot — every 29th doc
    removed, every 13th edited, every 41st re-added under a new id.
    Row status and both content fingerprints value-verify against
    DuckDB replaying the identical length-prefixed md5 encoding."""
    from pyspark.sql import functions as F

    from ..operators.scd import snapshot_diff
    docs = _t(spark, sf_dir, "documents")
    old = docs.select("doc_id", "text", "lang", "source")
    new = (old.where(F.col("doc_id") % 29 != 0)
           .withColumn("text",
                       F.when(F.col("doc_id") % 13 == 0,
                              F.concat(F.col("text"), F.lit(" v2")))
                       .otherwise(F.col("text")))
           .unionByName(old.where(F.col("doc_id") % 41 == 0)
                        .withColumn("doc_id",
                                    F.col("doc_id") + 2000000)))
    return snapshot_diff(old, new, ["doc_id"], ["text", "lang", "source"])


_SUB_K, _SUB_MINLEN = 5, 10

_SUBSTR_SQL = f"""
WITH ev AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t
    FROM documents WHERE doc_id % 89 = 0
), planted AS (
    SELECT doc_id + 3000000 AS doc_id,
           'qq ww ' || array_to_string(t[6:19], ' ') || ' ee rr' AS text
    FROM ev WHERE len(t) >= 19
), corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id, text FROM planted
), ct AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM corpus
), cg AS (
    SELECT doc_id AS id, i - 1 AS pos,
           md5(array_to_string(t[i:i+{_SUB_K - 1}], ' ')) AS fp
    FROM ct, unnest(range(1, len(t) - {_SUB_K} + 2)) AS u(i)
), eg AS (
    SELECT doc_id AS eid, i - 1 AS epos,
           md5(array_to_string(t[i:i+{_SUB_K - 1}], ' ')) AS fp
    FROM ev, unnest(range(1, len(t) - {_SUB_K} + 2)) AS u(i)
), m AS (
    SELECT id, eid, pos, pos - epos AS diag
    FROM cg JOIN eg USING (fp)
), isl AS (
    SELECT id, eid, diag, pos,
           pos - row_number() OVER (PARTITION BY id, eid, diag
                                    ORDER BY pos) AS g
    FROM m
), runs AS (
    SELECT id, eid, count(*) + {_SUB_K - 1} AS run
    FROM isl GROUP BY id, eid, diag, g
), pair_best AS (
    SELECT id, eid, max(run) AS run
    FROM runs GROUP BY id, eid
    HAVING max(run) >= {_SUB_MINLEN}
), per_doc AS (
    SELECT id, CAST(count(*) AS BIGINT) AS n_eval_matches,
           CAST(max(run) AS BIGINT) AS max_substring_tokens
    FROM pair_best GROUP BY id
)
SELECT c.doc_id,
       coalesce(p.n_eval_matches, 0) AS n_eval_matches,
       coalesce(p.max_substring_tokens, 0) AS max_substring_tokens,
       coalesce(p.n_eval_matches, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN per_doc p ON c.doc_id = p.id
"""


@query("decontamination_substring", oracle=_SUBSTR_SQL)
def decontamination_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-offset substring decontamination (Lee et al. 2022
    suffix-array class, distributed as k-gram diagonal chaining)
    with PLANTED contamination: the eval split is doc_id % 89 == 0;
    a 14-token INTERIOR slice of each long-enough eval doc re-enters
    the corpus wrapped in junk tokens — offsets differ on both sides
    (slice starts at eval token 5, planted token 2), which is
    exactly what the fixed-alignment 13-gram rule cannot see and
    this operator must. DuckDB replays the identical k=5 gram /
    min_len=10 chaining, so run lengths value-verify."""
    from pyspark.sql import functions as F

    from ..operators.quality import decontaminate_substring
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 89 == 0)
    from ..functions.text import normalize_text
    toks = F.split(normalize_text(F.col("text")), " ")
    planted = (eval_df.where(F.size(toks) >= 19)
               .select((F.col("doc_id") + 3000000).alias("doc_id"),
                       F.concat(F.lit("qq ww "),
                                F.array_join(F.slice(toks, 6, 14), " "),
                                F.lit(" ee rr")).alias("text")))
    corpus = docs.select("doc_id", "text").unionByName(planted)
    out = decontaminate_substring(corpus, "doc_id", "text",
                                  eval_df, "doc_id", "text",
                                  min_len=_SUB_MINLEN, k=_SUB_K)
    return out.select(out["id"].alias("doc_id"), "n_eval_matches",
                      "max_substring_tokens", "contaminated")


_JM_LAM = 0.75  # exact binary double, as is 1-lam = 0.25

@query("bigram_logprob_score", oracle=f"""
WITH ct AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), tk AS (
    SELECT doc_id, unnest(t) AS tok FROM ct
), tknn AS (
    SELECT doc_id, tok FROM tk WHERE length(tok) > 0
), bg AS (
    SELECT doc_id, t[i] AS w1, t[i+1] AS w2
    FROM ct, unnest(range(1, len(t))) AS u(i)
    WHERE length(t[i]) > 0 AND length(t[i+1]) > 0
), cb AS (
    SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2
), cu AS (
    SELECT tok, count(*) AS cu FROM tknn GROUP BY 1
), tot AS (
    SELECT count(*) AS n_total FROM tknn
), dbg AS (
    SELECT doc_id, w1, w2, count(*) AS c FROM bg GROUP BY 1, 2, 3
)
SELECT dbg.doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       round(sum(c * ln({_JM_LAM} * cb.cb / cu1.cu
                        + {1.0 - _JM_LAM} * cu2.cu / tot.n_total))
             / sum(c), 4) AS avg_logprob
FROM dbg
JOIN cb ON dbg.w1 = cb.w1 AND dbg.w2 = cb.w2
JOIN cu cu1 ON dbg.w1 = cu1.tok
JOIN cu cu2 ON dbg.w2 = cu2.tok
CROSS JOIN tot
GROUP BY 1
""")
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM scoring (the
    context-aware rung above `unigram_logprob_score` on the
    CCNet-class perplexity-filter ladder), self-scored over the
    documents corpus; DuckDB replays the identical count joins and
    lam=0.75 mixture, so per-doc means value-verify."""
    from ..operators.selection import bigram_logprob_scores
    out = bigram_logprob_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text", lam=_JM_LAM)
    return out.select(out["id"].alias("doc_id"), "n_bigrams",
                      rnd("avg_logprob", 4).alias("avg_logprob"))


_VC_SIZES = (50, 100, 1000)

@query("vocab_coverage_curve", oracle=f"""
WITH tk AS (
    SELECT unnest(string_split({_NORM}, ' ')) AS tok FROM documents
), tknn AS (
    SELECT tok FROM tk WHERE length(tok) > 0
), freq AS (
    SELECT tok, count(*) AS c FROM tknn GROUP BY 1
), cc AS (
    SELECT c, count(*) AS n_types FROM freq GROUP BY 1
), cum AS (
    SELECT c, n_types,
           coalesce(sum(n_types) OVER (ORDER BY c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS types_above,
           coalesce(sum(n_types * c) OVER (ORDER BY c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS inst_above
    FROM cc
), tot AS (
    SELECT count(*) AS total_types, sum(c) AS total_inst FROM freq
), sizes(v) AS (
    VALUES {", ".join(f"({v})" for v in _VC_SIZES)}
), hit AS (
    SELECT v, inst_above + (v - types_above) * c AS covered
    FROM sizes, cum
    WHERE types_above < v AND v <= types_above + n_types
)
SELECT CAST(s.v AS BIGINT) AS v,
       CAST(least(s.v, tot.total_types) AS BIGINT) AS n_types,
       CAST(coalesce(hit.covered, tot.total_inst) AS BIGINT)
           AS covered_instances,
       round(CAST(coalesce(hit.covered, tot.total_inst) AS DOUBLE)
             / tot.total_inst, 4) AS coverage
FROM sizes s LEFT JOIN hit ON s.v = hit.v CROSS JOIN tot
""")
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget coverage curve over the documents corpus:
    fraction of token instances the top-V frequency-ranked types
    cover, for three candidate vocabulary sizes — computed from the
    count-of-counts table (no global vocab sort; see the operator
    docstring for why that matters at web scale). DuckDB replays the
    identical count-class arithmetic."""
    from ..operators.selection import vocab_coverage
    out = vocab_coverage(_t(spark, sf_dir, "documents"),
                         "doc_id", "text", _VC_SIZES)
    return out.select("v", "n_types", "covered_instances",
                      rnd("coverage", 4).alias("coverage"))


@query("packing_efficiency_report", oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), starts AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, {_STEP})) AS start
    FROM toks
), ch AS (
    SELECT doc_id,
           CAST((start - 1) / {_STEP} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(t, start, start + {_CHUNK} - 1))
                AS BIGINT) AS n_tokens,
           ({_HEXP}) % 8 AS shard
    FROM starts
), o AS (
    SELECT shard, n_tokens,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS token_offset
    FROM ch
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(token_offset // 512) + 1 AS BIGINT) AS n_bins,
       round(CAST(sum(n_tokens) AS DOUBLE)
             / ((max(token_offset // 512) + 1) * 512), 4) AS utilization
FROM o GROUP BY shard
""")
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing QA: per training shard, how many 512-token bins the
    concat-and-cut packing opened and what fraction of their capacity
    carries real tokens — the padding-waste number that prices a
    packing policy before a training run. Pure composition over
    pack_chunks (one shard-keyed window), value-verified end to end."""
    from pyspark.sql import functions as F

    from ..operators.quality import chunk_documents, pack_chunks
    ch = chunk_documents(_t(spark, sf_dir, "documents"), "doc_id", "text",
                         chunk_tokens=_CHUNK, overlap=_OVERLAP)
    packed = pack_chunks(ch, "id", "chunk_idx", "n_tokens",
                         capacity=512, shards=8)
    return (packed.groupBy(F.col("shard").cast("long").alias("shard"))
            .agg(F.count("*").alias("n_chunks"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 (F.max("bin") + 1).cast("long").alias("n_bins"),
                 rnd(F.sum("n_tokens").cast("double")
                     / ((F.max("bin") + 1) * 512), 4).alias("utilization")))


@query("streaming_decontamination_gate", oracle=rf"""
WITH norm AS (
    SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
), cg AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS fp
    FROM norm, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE len(t) >= 13
), eg AS (
    SELECT DISTINCT md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS fp
    FROM norm, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE doc_id % 97 = 0 AND len(t) >= 13
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_ngrams
FROM cg JOIN eg USING (fp) GROUP BY 1
""")
def streaming_decontamination_gate(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """STREAMING entry under the value oracle: documents flow through
    Structured Streaming's stream-static broadcast join against the
    eval 13-gram set (the production ingest-gate shape) and the
    materialized per-doc hit counts must hash-match the batch SQL —
    the first registry row where the driver verifies a streaming
    pipeline's VALUES, not just stream==batch in pytest."""
    from ..streaming.events import run_streaming_decontamination
    return run_streaming_decontamination(spark, sf_dir, n=13)


@query("decontamination_embedding", oracle="""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), eval_set AS (
    SELECT vec_id AS eval_id,
           list_transform(list_zip(v, range(0, len(v))),
                          p -> p[1] * (1 + 0.0002 * (p[2] % 5))) AS ev
    FROM base WHERE vec_id % 37 = 0
), hits AS (
    SELECT c.vec_id, e.eval_id,
           list_dot_product(c.v, e.ev) /
           (sqrt(list_dot_product(c.v, c.v)) *
            sqrt(list_dot_product(e.ev, e.ev))) AS cos
    FROM base c CROSS JOIN eval_set e
)
SELECT vec_id,
       CAST(count(*) AS BIGINT) AS n_eval_hits,
       round(max(cos), 4) AS max_cosine
FROM hits WHERE cos >= 0.99 GROUP BY vec_id
""")
def decontamination_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding-space rung
    of the decontamination ladder (exact 13-gram -> fuzzy trigram ->
    substring -> THIS): flag training vectors whose cosine to any
    eval-set vector exceeds 0.99, catching paraphrases/translations
    that share no n-grams with the benchmark. The eval set is planted
    (every 37th vector, per-element scaling cycle — the shared
    planted-dupe idiom) so both engines replay the identical corpus
    and the flags are value-verified.

    Scale design: real eval sets are SMALL (benchmarks are thousands
    of rows vs a 100 TB corpus), so the right plan is a broadcast of
    the eval vectors and ONE corpus scan — no LSH, no shuffle of the
    corpus, no join exchange at all; per-row work is |eval| dot
    products in an Arrow-free JVM expression only when |eval| is
    tiny, else the blocked-gemm operator (dedup.embedding pathway)
    takes over."""
    from pyspark.sql import functions as F

    from ..functions.vectors import cosine_similarity

    from ..sources.registry import spread
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # the corpus side pays |eval| dot products per row — spread the
    # unsplittable single-row-group scan before the broadcast join;
    # the eval side stays tiny and unspread
    base = spread(emb.select("vec_id", v.alias("v")))
    eval_set = (emb.select("vec_id", v.alias("v"))
                .where(F.col("vec_id") % 37 == 0)
                .select(F.col("vec_id").alias("eval_id"),
                        F.transform("v", lambda x, i: x * (
                            F.lit(1.0) + F.lit(0.0002) * (i % 5)))
                        .alias("ev")))
    scored = (base.crossJoin(F.broadcast(eval_set))
              .withColumn("cos", cosine_similarity(F.col("v"),
                                                   F.col("ev")))
              .where(F.col("cos") >= 0.99))
    return (scored.groupBy("vec_id")
            .agg(F.count("*").alias("n_eval_hits"),
                 rnd(F.max("cos"), 4).alias("max_cosine")))


@query("fim_transform_documents", oracle="""
WITH u AS (
    SELECT doc_id, text, length(text) AS L,
           (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_a'),
                               1, 6))::BIGINT + 0.5) / 16777216.0 AS u1,
           (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_b'),
                               1, 6))::BIGINT + 0.5) / 16777216.0 AS u2
    FROM documents WHERE doc_id < 200 AND length(text) >= 20
), cuts AS (
    SELECT doc_id, text, L,
           1 + CAST(floor(least(u1, u2) * (L - 1)) AS BIGINT) AS c1,
           1 + CAST(floor(greatest(u1, u2) * (L - 1)) AS BIGINT) AS c2
    FROM u
)
SELECT doc_id,
       CAST(c1 - 1 AS BIGINT) AS len_prefix,
       CAST(c2 - c1 AS BIGINT) AS len_middle,
       CAST(L - c2 + 1 AS BIGINT) AS len_suffix,
       md5('<PRE>' || substring(text, 1, c1 - 1)
           || '<SUF>' || substring(text, c2, L - c2 + 1)
           || '<MID>' || substring(text, c1, c2 - c1)) AS fim_md5
FROM cuts
""")
def fim_transform_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): each
    document splits at two DETERMINISTIC cut points (md5-uniform
    draws — the same no-RNG idiom as the samplers, so every engine/
    partitioning produces the identical reordering) and re-serializes
    in PSM order <PRE>prefix<SUF>suffix<MID>middle. Verified by
    value: the md5 of the transformed string must match DuckDB's
    byte-for-byte, plus the three segment lengths. Pure string
    expressions — the transform rides the scan at any scale."""
    from pyspark.sql import functions as F
    docs = (_t(spark, sf_dir, "documents")
            .where((F.col("doc_id") < 200) & (F.length("text") >= 20)))
    ln = F.length("text")

    def u(salt: str):
        return (F.conv(F.substring(F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 6),
            16, 10).cast("double") + 0.5) / 16777216.0

    u1, u2 = u("_a"), u("_b")
    c1 = (F.lit(1) + F.floor(F.least(u1, u2) * (ln - 1))).cast("long")
    c2 = (F.lit(1) + F.floor(F.greatest(u1, u2) * (ln - 1))).cast("long")
    prefix = F.expr("substring(text, 1, c1 - 1)")
    middle = F.expr("substring(text, c1, c2 - c1)")
    suffix = F.expr("substring(text, c2, L - c2 + 1)")
    return (docs.select("doc_id", "text", ln.alias("L"),
                        c1.alias("c1"), c2.alias("c2"))
            .select("doc_id",
                    (F.col("c1") - 1).cast("long").alias("len_prefix"),
                    (F.col("c2") - F.col("c1")).cast("long")
                    .alias("len_middle"),
                    (F.col("L") - F.col("c2") + 1).cast("long")
                    .alias("len_suffix"),
                    F.md5(F.concat(F.lit("<PRE>"), prefix,
                                   F.lit("<SUF>"), suffix,
                                   F.lit("<MID>"), middle))
                    .alias("fim_md5")))


def _funnel_oracle() -> str:
    """Composed oracle for the end-to-end curation funnel: the
    quality stage SPLICES the quality_filter_gopher oracle verbatim
    (single source of truth for the rule thresholds — nested WITH
    inside a derived table is legal in DuckDB); dedup/decontaminate/
    sample stages replay the operators' documented md5 rules."""
    from .core import ORACLE
    gopher = ORACLE["quality_filter_gopher"]
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
WITH gq AS (
    SELECT doc_id FROM ({gopher}) WHERE keep
), s1 AS (
    SELECT d.doc_id, d.text FROM documents d JOIN gq USING (doc_id)
), fp AS (
    SELECT doc_id, md5({norm}) AS f FROM s1
), s2 AS (
    SELECT s1.doc_id, s1.text FROM s1 JOIN (
        SELECT doc_id FROM (
            SELECT doc_id,
                   doc_id = min(doc_id) OVER (PARTITION BY f) AS k
            FROM fp
        ) WHERE k
    ) kk USING (doc_id)
), tok2 AS (
    SELECT doc_id, string_split({norm}, ' ') AS t FROM s2
), cg AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS g
    FROM tok2, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE len(t) >= 13
), ev AS (
    SELECT string_split({norm}, ' ') AS t
    FROM documents WHERE doc_id % 97 = 0
), eg AS (
    SELECT DISTINCT md5(array_to_string(list_slice(t, i, i + 12), ' '))
               AS g
    FROM ev, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE len(t) >= 13
), bad AS (
    SELECT DISTINCT cg.doc_id FROM cg JOIN eg USING (g)
), s3 AS (
    SELECT doc_id FROM s2
    WHERE doc_id NOT IN (SELECT doc_id FROM bad)
), s4 AS (
    SELECT doc_id FROM s3
    WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
           % 1000000) < 500000
)
SELECT '0_raw' AS stage,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
UNION ALL SELECT '1_quality',
       CAST((SELECT count(*) FROM s1) AS BIGINT)
UNION ALL SELECT '2_dedup',
       CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL SELECT '3_decontam',
       CAST((SELECT count(*) FROM s3) AS BIGINT)
UNION ALL SELECT '4_sample',
       CAST((SELECT count(*) FROM s4) AS BIGINT)
"""


@query("pipeline_curation_funnel", oracle=_funnel_oracle())
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one entry — quality filter ->
    exact-dedup keepers -> 13-gram decontamination -> deterministic
    50% sample — reporting the doc count surviving each stage (the
    funnel every corpus build publishes). Each stage CALLS the real
    operator (gopher_quality_filter, exact_duplicates, decontaminate,
    deterministic_sample), so this is the integration proof that the
    individually-verified pieces compose; the oracle splices the
    gopher oracle verbatim and replays the md5 rules of the rest.
    Plan: the post-filter survivor frames (s1, s2) each feed three or
    more downstream subtrees (the next stage's operator, its join
    back, and the stage count), so they are shared via
    ``materialize_auto`` instead of letting every consumer re-derive
    them from the scan — this cuts the funnel's parquet scans of
    documents from 20 to a handful; at 100 TB the progressively
    shrinking survivor sets are exactly the frames cheap enough to
    cache."""
    from pyspark.sql import functions as F

    from ..operators.dedup import exact_duplicates
    from ..operators.quality import decontaminate, gopher_quality_filter
    from ..operators.sampling import deterministic_sample
    from ..sources.registry import materialize_auto
    docs = _t(spark, sf_dir, "documents")
    gq = gopher_quality_filter(docs, "doc_id", "text",
                               min_words=30, min_stopwords=1)
    s1 = materialize_auto(
        docs.join(gq.where("keep").select("doc_id"), "doc_id"))
    keep2 = (exact_duplicates(s1, "doc_id", "text")
             .where(~F.col("is_duplicate")).select("doc_id"))
    s2 = materialize_auto(s1.join(keep2, "doc_id"))
    eval_df = docs.where(F.col("doc_id") % 97 == 0)
    flags = decontaminate(s2, "doc_id", "text",
                          eval_df, "doc_id", "text", n=13)
    s3 = s2.join(flags.where(~F.col("contaminated"))
                 .select(F.col("id").alias("doc_id")), "doc_id")
    s4 = deterministic_sample(s3, "doc_id", 0.5)

    def stage(name, df):
        return df.agg(F.lit(name).alias("stage"),
                      F.count("*").cast("long").alias("n_docs"))
    return (stage("0_raw", docs)
            .unionAll(stage("1_quality", s1))
            .unionAll(stage("2_dedup", s2))
            .unionAll(stage("3_decontam", s3))
            .unionAll(stage("4_sample", s4)))


@query("kappa_quality_rules", oracle="""
WITH t AS (
    SELECT doc_id,
           len(string_split(trim(regexp_replace(lower(text),
               '\\s+', ' ', 'g')), ' ')) AS n,
           length(text) AS L
    FROM documents
), flags AS (
    SELECT CAST(n >= 30 AS INT) AS a,
           CAST(L >= 150 AS INT) AS b
    FROM t
), c AS (
    SELECT sum(a * b) AS yy,
           sum(a * (1 - b)) AS yn,
           sum((1 - a) * b) AS ny,
           sum((1 - a) * (1 - b)) AS nn,
           CAST(count(*) AS DOUBLE) AS n
    FROM flags
)
SELECT CAST(yy AS BIGINT) AS both_keep,
       CAST(yn + ny AS BIGINT) AS disagree,
       round((yy + nn) / n, 6) AS p_observed,
       round(((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / (n * n),
             6) AS p_chance,
       round(((yy + nn) / n
              - ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / (n * n))
             / (1 - ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn))
                / (n * n)), 6) AS kappa
FROM c
""")
def kappa_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two quality rules — word-count >= 30 vs
    char-length >= 150 — the chance-corrected agreement that tells
    you whether a cheap proxy rule can stand in for an expensive one
    (raw accuracy overstates agreement when both rules mostly say
    keep). One conditional-aggregate pass builds the 2x2 table;
    everything after is scalar arithmetic."""
    from pyspark.sql import functions as F

    from ..functions.text import tokens as toks_fn
    docs = _t(spark, sf_dir, "documents")
    a = (F.size(toks_fn(F.col("text"))) >= 30).cast("int")
    b = (F.length("text") >= 150).cast("int")
    c = docs.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.col("a") * F.col("b")).alias("yy"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("yn"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("ny"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("nn"),
        F.count("*").cast("double").alias("n"))
    po = (F.col("yy") + F.col("nn")) / F.col("n")
    pc = ((F.col("yy") + F.col("yn")) * (F.col("yy") + F.col("ny"))
          + (F.col("ny") + F.col("nn")) * (F.col("yn") + F.col("nn"))) \
        / (F.col("n") * F.col("n"))
    return c.select(
        F.col("yy").cast("long").alias("both_keep"),
        (F.col("yn") + F.col("ny")).cast("long").alias("disagree"),
        rnd(po, 6).alias("p_observed"),
        rnd(pc, 6).alias("p_chance"),
        rnd((po - pc) / (1 - pc), 6).alias("kappa"))


@query("ngram_novelty_deciles", oracle=f"""
WITH tok AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), grams AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS g
    FROM tok, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE len(t) >= 13
), freq AS (
    SELECT g, count(*) AS n_docs_with FROM grams GROUP BY g
), novelty AS (
    SELECT gr.doc_id,
           CAST(sum(CASE WHEN f.n_docs_with = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS nov
    FROM grams gr JOIN freq f USING (g)
    GROUP BY gr.doc_id
)
SELECT least(CAST(floor(nov * 10) AS BIGINT), 9) AS novelty_decile,
       CAST(count(*) AS BIGINT) AS n_docs
FROM novelty GROUP BY 1 ORDER BY 1
""")
def ngram_novelty_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document novelty profile: per doc, the fraction of its
    DISTINCT 13-grams that occur in no other document, bucketed into
    deciles — the corpus-health histogram behind memorization and
    boilerplate audits (a mass at decile 0 means the corpus is
    template-dominated; mass at 9 means mostly unique prose). Same
    gram canonicalization as the decontamination family (md5 of the
    space-joined window over normalized tokens). Plan: explode to
    distinct (doc, gram), gram-keyed count (map-side combine), join
    back, doc-keyed ratio, 10-row histogram — the inverted-index
    shape, no pairwise work, no per-row driver state."""
    from pyspark.sql import functions as F

    from ..functions.text import tokens
    from ..sources.registry import spread
    docs = spread(_t(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    grams = (docs.select("doc_id", toks.alias("t"))
             .where(F.size("t") >= 13)
             .select("doc_id", F.explode(F.transform(
                 F.sequence(F.lit(1), F.size("t") - 12),
                 lambda i: F.md5(F.concat_ws(
                     " ", F.slice("t", i, F.lit(13)))))).alias("g"))
             .distinct())
    freq = grams.groupBy("g").agg(F.count("*").alias("n_docs_with"))
    novelty = (grams.join(freq, "g")
               .groupBy("doc_id")
               .agg((F.sum((F.col("n_docs_with") == 1).cast("int"))
                     .cast("double") / F.count("*")).alias("nov")))
    return (novelty
            .select(F.least(F.floor(F.col("nov") * 10).cast("long"),
                            F.lit(9).cast("long")).alias("novelty_decile"))
            .groupBy("novelty_decile")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .orderBy("novelty_decile"))


@query("unicode_nfc_normalization", oracle="""
WITH corpus AS (
    SELECT i AS rec_id,
           CASE i % 4
               WHEN 0 THEN 'cafe' || chr(769) || ' menu ' || i
               WHEN 1 THEN 'plain ascii text ' || i
               WHEN 2 THEN chr(65) || chr(778) || 'ngstrom unit ' || i
               ELSE chr(64257) || 'le system ' || i
           END AS text
    FROM range(0, 64) t(i)
)
SELECT rec_id,
       CAST(text = nfc_normalize(text) AS BOOLEAN) AS was_normal,
       CAST(length(text) AS BIGINT) AS cp_before,
       CAST(length(nfc_normalize(text)) AS BIGINT) AS cp_after,
       md5(nfc_normalize(text)) AS nfc_md5
FROM corpus
""")
def unicode_nfc_normalization(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization, value-gated cross-engine: a
    synthetic corpus plants decomposed accents (e + U+0301), a
    combining ring (A + U+030A) and a ligature (U+FB01) alongside
    plain ASCII; Spark normalizes via the stdlib's full Unicode
    algorithm inside an Arrow kernel, DuckDB replays with its native
    nfc_normalize, and the md5 of the normalized text plus the
    codepoint counts must agree byte-for-byte. (NFC recomposes the
    accent pairs — codepoint count drops — but leaves the ligature,
    which is a COMPATIBILITY (NFKC) decomposition, untouched: the
    was_normal split pins that distinction.)"""
    from pyspark.sql import functions as F

    from ..operators.quality import normalize_unicode
    # r14: 2 partitions, not defaultParallelism — a 64-row fixture on
    # 32 slices scheduled 32 near-empty Python tasks for the
    # normalize stage (0.487 -> 0.275 s min-of-7; the operator itself
    # inherits real callers' partitioning, this is fixture shape)
    corpus = spark.range(0, 64, 1, 2).select(
        F.col("id").alias("rec_id"),
        F.when(F.col("id") % 4 == 0,
               F.concat(F.lit("café menu "), F.col("id")))
        .when(F.col("id") % 4 == 1,
              F.concat(F.lit("plain ascii text "), F.col("id")))
        .when(F.col("id") % 4 == 2,
              F.concat(F.lit("Ångstrom unit "), F.col("id")))
        .otherwise(F.concat(F.lit("ﬁle system "), F.col("id")))
        .alias("text"))
    out = normalize_unicode(corpus, "text", form="NFC")
    return out.select(
        "rec_id", "was_normal",
        F.length("text").cast("long").alias("cp_before"),
        F.length("text_norm").cast("long").alias("cp_after"),
        F.md5("text_norm").alias("nfc_md5"))


@query("corpus_data_card_stats", oracle=f"""
WITH d AS (
    SELECT lang, source,
           CAST(len({_TOKS_Q}) AS BIGINT) AS n_toks,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
)
SELECT CASE WHEN GROUPING(lang) = 0 THEN 'lang:' || lang
            WHEN GROUPING(source) = 0 THEN 'source:' || source
            ELSE 'overall' END AS section,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       round(CAST(sum(n_toks) AS DOUBLE) / nullif(count(*), 0), 2)
           AS mean_tokens,
       CAST(max(n_toks) AS BIGINT) AS max_tokens,
       CAST(min(n_toks) AS BIGINT) AS min_tokens
FROM d
GROUP BY GROUPING SETS ((lang), (source), ())
""")
def corpus_data_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data-card composition stats (operators/datacard.py):
    overall + per-language + per-source doc/token/char totals in ONE
    corpus scan via GROUPING SETS — the reduce side is #langs +
    #sources + 1 rows, so the shuffle is constant-size at any corpus
    scale. Feeds render_data_card's markdown (the corpus-level
    analogue of the reference's DQ report, src/dq.py:176-198)."""
    from ..operators.datacard import corpus_stats
    return corpus_stats(_t(spark, sf_dir, "documents"))


_CCNET_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
    FROM documents
), tk AS (
    SELECT doc_id, tok FROM toks WHERE length(tok) > 0
), vocab AS (
    SELECT tok, count(*) AS ct FROM tk GROUP BY 1
), tot AS (
    SELECT sum(ct) AS n_total FROM vocab
), dt AS (
    SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2
), scored AS (
    SELECT dt.doc_id,
           CAST(sum(dt.c) AS BIGINT) AS n_tokens,
           round(sum(dt.c * ln(CAST(v.ct AS DOUBLE) / tot.n_total))
                 / sum(dt.c), 4) AS lp
    FROM dt JOIN vocab v USING (tok) CROSS JOIN tot
    GROUP BY 1
), bucketed AS (
    SELECT d.lang, s.n_tokens, s.lp,
           ntile(3) OVER (PARTITION BY d.lang
                          ORDER BY s.lp DESC, s.doc_id) AS b
    FROM scored s JOIN documents d USING (doc_id)
)
SELECT lang,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
              ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(min(lp), 4) AS min_logprob,
       round(max(lp), 4) AS max_logprob
FROM bucketed
GROUP BY 1, 2
"""


@query("ccnet_perplexity_buckets", oracle=_CCNET_ORACLE)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail corpus split (Wenzek 2020): per-language
    perplexity terciles under the corpus's own unigram LM, the
    standard quality stratification CommonCrawl pipelines feed into
    sampling weights. The tercile order key is the 4dp-ROUNDED score
    plus doc_id — a deterministic total order both engines reproduce
    exactly (raw doubles could differ by 1 ULP across partial-sum
    orders and flip a boundary row). Scale: the scorer is a
    token-keyed shuffle join (vocab deliberately not broadcast) and
    the output is #langs x 3 rows.

    Since r15 the DECLARED entry runs the whale-proof range-bucketed
    two-phase tercile (r14 verdict #1): language is the canonical
    whale key — English is most of CommonCrawl, and a per-language
    ntile sorts every document of a language in one task (AQE cannot
    split a window partition; 1.14x at K=100 with a 90%-'en' corpus,
    structural bound grows with the skew). Delegates to
    ccnet_buckets_two_phase — identical result, same oracle."""
    return ccnet_buckets_two_phase(spark, sf_dir)


@query("ccnet_buckets_two_phase", oracle=_CCNET_ORACLE)
def ccnet_buckets_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ccnet_perplexity_buckets' whale-proof twin. The one-window
    plan's per-language ntile sorts EVERY document of a language in
    one task — and language is the canonical whale key (English is
    most of CommonCrawl; AQE cannot split a window partition). Here
    the tercile comes from operators/layout.bucketed_global_rank — a
    range-bucketed two-phase global rank on (lp DESC, doc_id) — plus
    the closed-form ntile_expr. The bucket image is
    floor(-lp * 10^4): lp is already 4dp-rounded, so the negated
    scaled value is a monotone non-decreasing integer image of the
    DESC order and lp-ties can never straddle a bucket boundary.
    Same oracle, same scorer, same combine."""
    from pyspark.sql import functions as F

    from ..operators.layout import bucketed_global_rank, ntile_expr
    from ..operators.selection import unigram_logprob_scores
    docs = _t(spark, sf_dir, "documents")
    scored = unigram_logprob_scores(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "n_tokens",
        rnd("avg_logprob", 4).alias("lp"))
    b = scored.join(docs.select("doc_id", "lang"), "doc_id")
    r = bucketed_global_rank(
        b.withColumn("__ok",
                     F.floor(-F.col("lp") * 10000).cast("long")),
        ["lang"], "__ok", [F.col("lp").desc(), F.col("doc_id")],
        rank_col="__rn", size_col="__n")
    t = ntile_expr("__rn", "__n", 3)
    return (r.groupBy(
                "lang",
                F.when(t == 1, "head")
                 .when(t == 2, "middle")
                 .otherwise("tail").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 rnd(F.min("lp"), 4).alias("min_logprob"),
                 rnd(F.max("lp"), 4).alias("max_logprob")))


_SHARD_TOKENS = 4096


@query("output_shard_plan", oracle=f"""
WITH d AS (
    SELECT doc_id,
           CAST(len({_TOKS_Q}) AS BIGINT) AS n_toks
    FROM documents
), cum AS (
    SELECT doc_id, n_toks,
           sum(n_toks) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cs
    FROM d
), assigned AS (
    SELECT doc_id, n_toks,
           CAST((cs - n_toks) // {_SHARD_TOKENS} AS BIGINT) AS shard_id
    FROM cum
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM assigned
GROUP BY 1
""")
def output_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-planning: assign docs (in doc_id order) to output shards
    of ~{_SHARD_TOKENS} whitespace tokens — the sizing pass before a
    partitioned write of webdataset/parquet training shards, so every
    output file lands near the target size regardless of doc-length
    skew. shard_id = floor(exclusive-prefix-sum / target): a doc
    straddling a boundary stays in the shard it started in
    (first-fit, standard shard-writer semantics).

    Scale (r11 verdict item 3 — no global unpartitioned window): the
    global running sum is a TWO-PHASE DISTRIBUTED PREFIX SUM. Docs
    are bucketed by deterministic fixed-width doc_id ranges (P value
    buckets from one broadcast min/max row — deterministic across
    branch re-evaluations, unlike repartitionByRange's per-job
    boundary sampling), phase 1 computes the P per-bucket token
    subtotals (a P-row aggregate; its exclusive cumsum window runs
    over P ROWS, not the table), phase 2 broadcasts those offsets
    back and finishes with a PER-BUCKET running-sum window
    (partitionBy bucket — every partition bounded by the bucket
    width). Identical output to the single-window formulation for
    any input; the oracle keeps the naive global-window SQL as an
    independent spec."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.text import token_count
    from ..operators.layout import add_range_bucket, bucket_offsets
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_toks"))
    db = add_range_bucket(d, "doc_id", 32)
    offs = bucket_offsets(db, F.col("n_toks"))
    # phase 2: per-bucket running sum + broadcast offset
    wloc = (Window.partitionBy("__rb").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    assigned = (db.join(F.broadcast(offs), "__rb")
                .select("doc_id", "n_toks",
                        F.floor((F.col("__rb_off")
                                 + F.sum("n_toks").over(wloc)
                                 - F.col("n_toks"))
                                / _SHARD_TOKENS).cast("long")
                        .alias("shard_id")))
    return (assigned.groupBy("shard_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_toks").cast("long").alias("n_tokens"),
                 F.min("doc_id").cast("long").alias("first_doc"),
                 F.max("doc_id").cast("long").alias("last_doc")))


_BLOOM_M, _BLOOM_K = 1 << 16, 3

_BLOOM_SQL = f"""
WITH norm AS (
    SELECT doc_id, {_TOKS_Q} AS t FROM documents
), cg AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS fp
    FROM norm, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE len(t) >= 13
), eg AS (
    SELECT DISTINCT md5(array_to_string(list_slice(t, i, i + 12), ' ')) AS fp
    FROM norm, unnest(range(1, len(t) - 11)) AS u(i)
    WHERE doc_id % 97 = 0 AND len(t) >= 13
), bits AS (
    SELECT DISTINCT
           ('0x' || substring(md5(fp || ':' || j), 1, 7))::BIGINT
               % {_BLOOM_M} AS p
    FROM eg, unnest([0, 1, 2]) AS tj(j)
), pc AS (
    SELECT doc_id, fp,
           ('0x' || substring(md5(fp || ':' || j), 1, 7))::BIGINT
               % {_BLOOM_M} AS p
    FROM cg, unnest([0, 1, 2]) AS tj(j)
), cand AS (
    SELECT doc_id, fp FROM pc JOIN bits USING (p)
    GROUP BY doc_id, fp HAVING count(*) = {_BLOOM_K}
), agg AS (
    SELECT c.doc_id,
           count(*) AS n_cand,
           sum(CASE WHEN eg.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
    FROM cand c LEFT JOIN eg ON c.fp = eg.fp
    GROUP BY 1
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(n_cand, 0) AS BIGINT) AS n_candidate_grams,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit_ngrams,
       coalesce(n_cand, 0) > 0 AS bloom_candidate,
       coalesce(n_hit, 0) > 0 AS contaminated,
       coalesce(n_cand, 0) > 0 AND coalesce(n_hit, 0) = 0
           AS false_positive
FROM documents d LEFT JOIN agg USING (doc_id)
"""


@query("decontamination_bloom_prefilter", oracle=_BLOOM_SQL)
def decontamination_bloom_prefilter(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """13-gram decontamination through a Bloom-filter prefilter
    (operators/quality.py:bloom_decontaminate): eval split is
    doc_id % 97 == 0; corpus grams are screened against the m=2^16,
    k=3 position bitmap of the eval grams, and only surviving
    candidates reach the exact fingerprint verify. Zero false
    negatives by construction (positions are a pure function of the
    gram fingerprint); the per-doc false-positive flags are
    deterministic given (m, k) and the oracle replays the identical
    md5 position formulas — a value-gated Bloom filter. The exact
    rule's hits here must equal ``decontamination``'s hit set on the
    same corpus (pytest cross-check), while the bitmap is 8 KB
    against megabytes of fingerprints at full-harness scale."""
    from pyspark.sql import functions as F

    from ..operators.quality import bloom_decontaminate
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 97 == 0)
    out = bloom_decontaminate(docs, "doc_id", "text",
                              eval_df, "doc_id", "text",
                              n=13, m_bits=_BLOOM_M, k=_BLOOM_K)
    return out.select(out["id"].alias("doc_id"), "n_candidate_grams",
                      "n_hit_ngrams", "bloom_candidate", "contaminated",
                      "false_positive")


@query("padding_waste_batching", oracle=f"""
WITH lens AS (
    SELECT doc_id,
           CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), sorted_b AS (
    SELECT 'length_sorted' AS policy, n_tokens,
           (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // 32
               AS batch_id
    FROM lens
), shuffled_b AS (
    SELECT 'shuffled' AS policy, n_tokens,
           (row_number() OVER (
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) // 32
               AS batch_id
    FROM lens
), batches AS (
    SELECT policy, batch_id, count(*) AS bn,
           max(n_tokens) AS mx, sum(n_tokens) AS s
    FROM (SELECT * FROM sorted_b UNION ALL SELECT * FROM shuffled_b)
    GROUP BY 1, 2
)
SELECT policy,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(s) AS BIGINT) AS total_tokens,
       CAST(sum(bn * mx) AS BIGINT) AS padded_tokens,
       CAST(sum(bn * mx - s) AS BIGINT) AS wasted_tokens,
       round(10000.0 * sum(bn * mx - s) / nullif(sum(bn * mx), 0))
           / 10000.0 AS waste_rate
FROM batches GROUP BY policy
""")
def padding_waste_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-throughput audit: padding waste of fixed-size-32
    batches when examples are padded to the batch max, under
    length-sorted batching vs a deterministic shuffle — the number
    that justifies length-bucketed batching in every trainer (sorted
    batching puts similar lengths together, so bn*max ~= sum and
    waste collapses; shuffled batching pays the long-tail max per
    batch). Exact integer accounting, value-gated. Scale: one token
    count per doc + a |docs|-row window per policy; at 100 TB the
    sort-batch would be built per output shard (window partitioned
    by the shard key the trainer reads), making the global window
    here the small-frame special case of the shard-local plan."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from ..functions.text import tokens
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long")
        .alias("n_tokens"))
    def batched(policy: str, order_cols) -> DataFrame:
        w = W.orderBy(*order_cols)
        return lens.select(
            F.lit(policy).alias("policy"), "n_tokens",
            F.floor((F.row_number().over(w) - 1) / 32).alias("batch_id"))
    sorted_b = batched("length_sorted", [F.col("n_tokens"), F.col("doc_id")])
    shuffled_b = batched(
        "shuffled", [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")])
    batches = (sorted_b.unionAll(shuffled_b)
               .groupBy("policy", "batch_id")
               .agg(F.count(F.lit(1)).alias("bn"),
                    F.max("n_tokens").alias("mx"),
                    F.sum("n_tokens").alias("s")))
    return (batches.groupBy("policy").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("s").cast("long").alias("total_tokens"),
        F.sum(F.col("bn") * F.col("mx")).cast("long")
        .alias("padded_tokens"),
        F.sum(F.col("bn") * F.col("mx") - F.col("s")).cast("long")
        .alias("wasted_tokens"),
        rnd(F.sum(F.col("bn") * F.col("mx") - F.col("s"))
            / F.nullif(F.sum(F.col("bn") * F.col("mx")), F.lit(0)), 4)
        .alias("waste_rate")))
