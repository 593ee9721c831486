"""Corpus data card: one-scan composition stats + a markdown report.

The corpus-level analogue of the per-table DQ report (dq/report.py,
reference ``src/dq.py:176-198``): where the reference renders rule
results for ONE warehouse table, a training-data pipeline documents a
whole corpus — size, token counts, and language/source composition —
in the style of Datasheets for Datasets (Gebru et al. 2018) and
dataset cards.

Scale design: the stats frame is computed with GROUPING SETS
``((lang), (source), ())`` so the overall, per-language, and
per-source aggregates share ONE corpus scan and ONE shuffle whose
reduce-side cardinality is ``#langs + #sources + 1`` (tiny at any
corpus size; partial aggregation combines map-side). The markdown
renderer collects only that bounded stats frame — never corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def corpus_stats(docs: DataFrame,
                 lang_col: str = "lang",
                 source_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Long-format corpus composition stats.

    Output: one row per section — ``overall``, ``lang:<x>``,
    ``source:<y>`` — with doc / whitespace-token / char totals,
    mean tokens per doc (2 dp), and min/max doc length in tokens.
    """
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_toks"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    grouped = per_doc.groupingSets(
        [["lang"], ["source"], []], "lang", "source")
    agg = grouped.agg(
        F.grouping("lang").alias("g_lang"),
        F.grouping("source").alias("g_source"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(F.sum("n_toks").cast("double")
                / F.nullif(F.count(F.lit(1)), F.lit(0)), 2)
         .alias("mean_tokens"),
        F.max("n_toks").cast("long").alias("max_tokens"),
        F.min("n_toks").cast("long").alias("min_tokens"),
    )
    section = (
        F.when(agg["g_lang"] == 0,
               F.concat(F.lit("lang:"), F.col("lang")))
         .when(agg["g_source"] == 0,
               F.concat(F.lit("source:"), F.col("source")))
         .otherwise(F.lit("overall")))
    return agg.select(
        section.alias("section"),
        "n_docs", "n_tokens", "n_chars",
        "mean_tokens", "max_tokens", "min_tokens")


def render_data_card(stats_rows,
                     title: str = "Corpus Data Card",
                     extra_sections: dict[str, str] | None = None) -> str:
    """Markdown data card from collected ``corpus_stats`` rows.

    ``stats_rows``: list of Rows/dicts with the corpus_stats schema
    (bounded: #langs + #sources + 1). ``extra_sections`` lets callers
    append pre-rendered audit sections (dedup rate, quality bands,
    drift) without this module re-running them.
    """
    rows = [r.asDict() if hasattr(r, "asDict") else dict(r)
            for r in stats_rows]
    by_sec = {r["section"]: r for r in rows}
    overall = by_sec.get("overall")

    lines = [f"# {title}", ""]
    if overall is None:
        lines.append("_No documents._")
        return "\n".join(lines)

    lines += [
        "## Overview",
        "",
        f"- **Documents**: {overall['n_docs']:,}",
        f"- **Whitespace tokens**: {overall['n_tokens']:,}",
        f"- **Characters**: {overall['n_chars']:,}",
        f"- **Tokens per doc**: mean {overall['mean_tokens']}, "
        f"min {overall['min_tokens']}, max {overall['max_tokens']}",
        "",
    ]
    for prefix, heading in (("lang:", "Language composition"),
                            ("source:", "Source composition")):
        members = sorted(
            (r for r in rows if r["section"].startswith(prefix)),
            key=lambda r: (-r["n_docs"], r["section"]))
        if not members:
            continue
        lines += [f"## {heading}", "",
                  "| group | docs | share | tokens | mean tokens |",
                  "|---|---|---|---|---|"]
        for r in members:
            share = 100.0 * r["n_docs"] / overall["n_docs"]
            lines.append(
                f"| {r['section'][len(prefix):]} | {r['n_docs']:,} "
                f"| {share:.1f}% | {r['n_tokens']:,} "
                f"| {r['mean_tokens']} |")
        lines.append("")
    for heading, body in (extra_sections or {}).items():
        lines += [f"## {heading}", "", body, ""]
    return "\n".join(lines).rstrip() + "\n"


def corpus_data_card(docs: DataFrame, **kwargs) -> str:
    """End-to-end: compute stats (one scan) and render the card."""
    return render_data_card(corpus_stats(docs).collect(), **kwargs)
