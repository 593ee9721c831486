"""A21/A22 — retrieval + plan maker (reference src/chain.py:66-108).

``similar_fields`` scores schema-doc lines by token overlap with the
question (top-5, lexicographic tie-break). The docs are tiny, so the
driver-side version is the right tool; ``similar_fields_distributed``
is the same operator as a Spark job for catalog-scale corpora
(thousands of tables), and the embedding upgrade path is
operators/similarity.py over a field-description embedding column.
"""

from __future__ import annotations

import re

from ..catalog.naming import normalize_question

_TOKEN_RE = re.compile(r"[A-Za-zА-Яа-я0-9_]+")


def _tokens(s: str) -> set[str]:
    return {t.lower() for t in _TOKEN_RE.findall(s)}


def similar_fields(question: str, schema_docs: str, topk: int = 5) -> list[str]:
    """Top-k schema-doc lines by |question-tokens ∩ line-tokens|;
    ties break lexicographically (reference src/chain.py:70-86)."""
    q = _tokens(normalize_question(question))
    scored = []
    for line in schema_docs.splitlines():
        line = line.strip()
        if not line:
            continue
        overlap = len(q & _tokens(line))
        if overlap > 0:
            scored.append((-overlap, line))
    scored.sort()
    return [line for _, line in scored[:topk]]


def similar_fields_distributed(spark, question: str, schema_docs: str,
                               topk: int = 5) -> list[str]:
    """Same operator as a Spark job: explode question tokens x doc
    lines, join on token, count overlap. For catalogs large enough
    that the docs don't fit on the driver."""
    from pyspark.sql import functions as F
    q = list(_tokens(normalize_question(question)))
    lines = [(ln.strip(),) for ln in schema_docs.splitlines() if ln.strip()]
    if not lines or not q:
        return []
    docs = spark.createDataFrame(lines, ["line"])
    toks = docs.select(
        "line",
        F.explode(F.array_distinct(F.split(
            F.lower(F.regexp_replace("line", r"[^A-Za-zА-Яа-я0-9_]+", " ")),
            " "))).alias("tok")).where(F.col("tok") != "")
    qdf = spark.createDataFrame([(t,) for t in q], ["tok"])
    return [
        r["line"]
        for r in (toks.join(F.broadcast(qdf), "tok")
                  .groupBy("line").agg(F.count("*").alias("overlap"))
                  .orderBy(F.desc("overlap"), "line")
                  .limit(topk).collect())
    ]


def make_plan(question: str, schema_docs: str = "") -> str:
    """A22: bullet plan — goal, matched fields, time-filter heuristic,
    output advice (reference src/chain.py:89-108)."""
    q = normalize_question(question)
    fields = similar_fields(q, schema_docs) if schema_docs else []
    bullets = [f"- Goal: answer \"{q}\" with one Spark SQL SELECT."]
    if fields:
        bullets.append("- Relevant schema lines:")
        bullets += [f"  - {f}" for f in fields]
    if re.search(r"\b(19|20)\d{2}\b|\b(year|month|week|day|quarter)\b", q,
                 re.IGNORECASE):
        bullets.append("- Apply a time filter (half-open range on the "
                       "timestamp column).")
    bullets.append("- Keep the column list explicit, alias aggregates, "
                   "add a reasonable LIMIT.")
    return "\n".join(bullets)
