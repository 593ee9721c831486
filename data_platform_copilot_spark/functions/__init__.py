from .text import (
    LANG_STOPWORDS,
    doc_fingerprint,
    lang_scores,
    normalize_text,
    punct_ratio,
    stopword_ratio,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm
from .web import registered_domain, url_host, url_normalize

__all__ = [
    "LANG_STOPWORDS",
    "cosine_similarity",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "lang_scores",
    "normalize_text",
    "punct_ratio",
    "registered_domain",
    "url_host",
    "url_normalize",
    "stopword_ratio",
    "tokens",
]
