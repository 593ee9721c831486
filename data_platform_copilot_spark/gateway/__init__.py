from .sql_runner import (
    IncorrectQuestionError,
    extract_sql_from_markdown,
    is_safe,
    sql_run,
    validate_sql,
)

__all__ = [
    "IncorrectQuestionError",
    "extract_sql_from_markdown",
    "is_safe",
    "sql_run",
    "validate_sql",
]
