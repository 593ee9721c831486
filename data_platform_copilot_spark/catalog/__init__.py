from .naming import normalize_schema_name
from .namespaces import NamespaceManager
from .schema_docs import build_markdown, write_schema_docs
from .tables import TableManager
from .views import ViewManager, create_demo_views

__all__ = [
    "NamespaceManager",
    "TableManager",
    "ViewManager",
    "build_markdown",
    "create_demo_views",
    "normalize_schema_name",
    "write_schema_docs",
]
