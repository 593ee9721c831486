"""A23/A24 — NL -> Spark SQL generation chain.

Reference shape (src/chain.py:7-55): SYSTEM prompt with injected
schema docs + one few-shot, a ``Q: ... SQL:`` user turn, and a refine
step that re-asks with feedback at a tighter row limit. Retargeted:
the generated dialect is **Spark SQL** and the few-shot is the
flagship revenue-by-nation query over this warehouse.
"""

from __future__ import annotations

from .provider import CompletionProvider

SYSTEM_PROMPT = """You are a senior analytics engineer writing Spark SQL.

Rules:
- Output exactly one SELECT statement in a ```sql fenced block.
- Spark SQL dialect. No DML/DDL, no multiple statements, no comments.
- Use an explicit column list; alias every aggregate/computed column.
- Prefer simple equi-joins; filter with half-open timestamp ranges
  (ts >= 'YYYY-01-01' AND ts < 'YYYY+1-01-01').
- Always end with a reasonable LIMIT (default {row_limit}).

Warehouse schema:
{schema_docs}

Example
Q: revenue by nation for 1997, top 5
SQL:
```sql
SELECT n_name AS nation, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
GROUP BY 1
ORDER BY revenue DESC
LIMIT 5
```"""

DEFAULT_ROW_LIMIT = 200
REFINE_ROW_LIMIT = 100  # reference src/chain.py:54


async def nl_to_sql(provider: CompletionProvider, question: str,
                    schema_docs: str, row_limit: int = DEFAULT_ROW_LIMIT) -> str:
    """Generate Spark SQL (markdown) for a question."""
    system = SYSTEM_PROMPT.format(schema_docs=schema_docs,
                                  row_limit=row_limit)
    return await provider.complete(system, f"Q: {question}\nSQL:")


async def refine(provider: CompletionProvider, question: str,
                 previous_sql_md: str, feedback: str,
                 schema_docs: str) -> str:
    """Re-generate with feedback appended (reference src/chain.py:42-55)."""
    hinted = (f"{question}\n\nThe previous attempt was:\n{previous_sql_md}\n"
              f"Feedback: {feedback}\nReturn a corrected query.")
    return await nl_to_sql(provider, hinted, schema_docs,
                           row_limit=REFINE_ROW_LIMIT)
