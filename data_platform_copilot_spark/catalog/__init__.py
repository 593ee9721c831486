from .naming import normalize_schema_name
from .namespaces import NamespaceManager
from .schema_docs import build_markdown, write_schema_docs
from .tables import TableManager

__all__ = [
    "NamespaceManager",
    "TableManager",
    "build_markdown",
    "normalize_schema_name",
    "write_schema_docs",
]
