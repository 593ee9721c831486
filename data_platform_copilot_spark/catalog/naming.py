"""A19/A20 — identifier and question normalizers.

Behavioral spec from reference src/utils.py:7-80 (schema-name
normalizer: lowercase, Cyrillic transliteration + diacritic
folding, non-alphanumerics to underscores, collapse runs, no digit
prefix, 63-char cap, fallback name) and src/chain.py:58-63
(question normalizer). Implemented fresh for Spark SQL database
identifiers.
"""

from __future__ import annotations

import re
import unicodedata

MAX_IDENT_LEN = 63
FALLBACK_NAME = "schema_default"

# GOST-style Cyrillic transliteration (ru/uk letters commonly seen in
# dataset names).
_CYRILLIC = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "y", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "yu", "я": "ya",
    "і": "i", "ї": "yi", "є": "ye", "ґ": "g",
}


def _transliterate(s: str) -> str:
    out = []
    for ch in s:
        if ch in _CYRILLIC:
            out.append(_CYRILLIC[ch])
            continue
        # diacritic folding: é -> e, ü -> u, ...
        decomp = unicodedata.normalize("NFKD", ch)
        out.append("".join(c for c in decomp if not unicodedata.combining(c)))
    return "".join(out)


def normalize_schema_name(name: str) -> str:
    """Human name -> safe Spark database identifier.

    >>> normalize_schema_name("My Sales Data!")
    'my_sales_data'
    >>> normalize_schema_name("Продажи 2024")
    'prodazhi_2024'
    >>> normalize_schema_name("42 things")
    'n42_things'
    >>> normalize_schema_name("???")
    'schema_default'
    """
    s = _transliterate((name or "").lower())
    s = re.sub(r"[^a-z0-9]+", "_", s)
    s = re.sub(r"_+", "_", s).strip("_")
    if not s:
        return FALLBACK_NAME
    if s[0].isdigit():
        s = f"n{s}"
    return s[:MAX_IDENT_LEN].rstrip("_") or FALLBACK_NAME


def normalize_question(q: str) -> str:
    """A20: collapse whitespace + RU year-token folding
    (reference src/chain.py:58-63)."""
    q = re.sub(r"\s+", " ", (q or "").strip())
    q = re.sub(r"\b(г\.|года|год)\b", "year", q)
    return q
