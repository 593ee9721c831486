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
