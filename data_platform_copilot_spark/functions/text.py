"""Text-analysis column expressions (north-star extension, SURVEY.md §7.8).

Everything here is a pure Column expression built from JVM-side
built-ins — no Python UDFs — so the whole text pipeline stays inside
whole-stage codegen and scales linearly with the documents table.

Design for 100 TB: tokenization, quality scoring, language ID, and
fingerprinting are all embarrassingly parallel scalar expressions
(no shuffle at all); only downstream dedup/grouping shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the n-gram/stopword language
# heuristic. Chosen for orthogonality between languages rather than
# linguistic completeness — the operator contract is "deterministic
# heuristic", mirrored exactly in the DuckDB oracle.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "para", "en", "que"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}


def normalize_text(c: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokenization of normalized text -> array<string>."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(c) > 0,
                  F.length(stripped) / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``
    (frequency-weighted, not set-based)."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    toks = tokens(c)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0,
                  hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_scores(c: Column) -> Column:
    """map<lang, distinct-stopword-overlap> — the language-ID signal.

    Set-overlap (distinct hits) keeps the score order-insensitive
    and bounded, which makes the argmax stable across engines."""
    toks = tokens(c)
    entries = []
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        entries.append(F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.array_intersect(toks, sw)).alias("score")))
    return F.array(*entries)


def lang_score(c: Column, lang: str) -> Column:
    """Distinct-stopword overlap between the text's tokens and one
    language's stopword list."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens(c), sw))


def predicted_lang(c: Column) -> Column:
    """Argmax of per-language stopword overlap; ties resolve to the
    lexicographically first language code, all-zero scores -> 'und'.

    Implemented as a greatest-comparison chain (langs visited in lex
    order) — trivially mirrored in the DuckDB oracle."""
    langs = sorted(LANG_STOPWORDS)
    scores = {lang: lang_score(c, lang) for lang in langs}
    expr = F.lit("und")
    # Build the chain back-to-front so earlier (lex-smaller) langs win ties.
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        rest = [scores[x] for x in langs[i + 1:]]
        cond = scores[lang] > 0
        if rest:
            cond = cond & (scores[lang] >= F.greatest(*rest) if len(rest) > 1
                           else scores[lang] >= rest[0])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of the canonical form.
    md5 is identical across engines, making fingerprints
    oracle-comparable (unlike engine-native hash functions)."""
    return F.md5(normalize_text(c))


# HTML extraction: shared pattern list so the Spark expression chain
# and the DuckDB oracle replay the IDENTICAL passes in the identical
# order. RE2 (DuckDB) has no backreferences, so script/style are
# separate patterns; entity decoding runs tags-first and decodes
# &amp; LAST (decoding it earlier would double-decode "&amp;lt;").
HTML_STRIP_PASSES: list[tuple[str, str]] = [
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&(nbsp|#160);", " "),
    (r"&amp;", "&"),
    (r"\s+", " "),
]


def html_to_text(col: Column) -> Column:
    """Boilerplate-free visible text from raw HTML — the extraction
    stage of every web-corpus pipeline (script/style/comment blocks
    dropped, tags stripped, core entities decoded, whitespace
    collapsed). Pure JVM-side regexp_replace chain: rides the scan
    at any scale, no UDF; DuckDB value-verifies each pass
    (queries/text.py html_text_extract)."""
    out = col
    for pat, rep in HTML_STRIP_PASSES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)
