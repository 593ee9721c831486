from .sql_runner import (
    IncorrectQuestionError,
    extract_sql_from_markdown,
    is_safe,
    sql_run,
    validate_sql,
)
from .time_travel import (
    register_versioned_table,
    registered_versioned_tables,
    rewrite_as_of,
    table_history,
)

__all__ = [
    "IncorrectQuestionError",
    "extract_sql_from_markdown",
    "is_safe",
    "sql_run",
    "validate_sql",
    "register_versioned_table",
    "registered_versioned_tables",
    "rewrite_as_of",
    "table_history",
]
