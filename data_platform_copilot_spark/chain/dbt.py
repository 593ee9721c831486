"""A26-A28 — dbt model generation + atomic file materialization.

Reference: src/dbt_generator.py (two-block prompt -> SQL + schema.yml
with not_null/unique tests, block extraction, model-name sanitizer,
yaml name-injection fallback) and src/io_utils.py:6-24 (tempfile +
move per file). Dialect retargeted to Spark SQL.
"""

from __future__ import annotations

import re
import shutil
import tempfile
from pathlib import Path

from .provider import CompletionProvider

DBT_SYSTEM = """You generate dbt models for a Spark SQL warehouse.

Return EXACTLY two fenced blocks and nothing else:
1. ```sql — one SELECT statement (Spark SQL dialect, no DML/DDL).
2. ```yaml — a dbt schema.yml with `version: 2`, the model under
   `models:`, and at least one not_null and one unique column test.
"""

_SQL_BLOCK = re.compile(r"```sql\s*(.*?)```", re.DOTALL | re.IGNORECASE)
_YAML_BLOCK = re.compile(r"```ya?ml\s*(.*?)```", re.DOTALL | re.IGNORECASE)


def sanitize_model_name(name: str) -> str:
    """Lowercase snake-case identifier (reference dbt_generator.py:65-73)."""
    s = re.sub(r"[^a-z0-9_]+", "_", (name or "").lower()).strip("_")
    s = re.sub(r"_+", "_", s)
    if not s:
        s = "model"
    if s[0].isdigit():
        s = f"m_{s}"
    return s[:63]


def extract_blocks(md: str) -> tuple[str, str]:
    sql_m, yml_m = _SQL_BLOCK.search(md or ""), _YAML_BLOCK.search(md or "")
    if not sql_m or not yml_m:
        raise ValueError("expected one ```sql and one ```yaml block")
    return sql_m.group(1).strip(), yml_m.group(1).strip()


def ensure_model_name(yml: str, model_name: str) -> str:
    """Inject/overwrite the model name in the yaml if missing
    (reference dbt_generator.py:103-117)."""
    if re.search(rf"-\s*name:\s*{re.escape(model_name)}\b", yml):
        return yml
    if re.search(r"-\s*name:\s*\S+", yml):
        return re.sub(r"(-\s*name:\s*)\S+", rf"\g<1>{model_name}", yml,
                      count=1)
    return f"version: 2\nmodels:\n  - name: {model_name}\n" + yml


async def generate_dbt_model(provider: CompletionProvider, question: str,
                             model_name: str,
                             schema_docs: str = "") -> tuple[str, str, str]:
    """-> (model_name, sql, schema_yml)."""
    name = sanitize_model_name(model_name)
    user = (f"Warehouse schema:\n{schema_docs}\n\n"
            f"Model name: {name}\nBusiness question: {question}")
    md = await provider.complete(DBT_SYSTEM, user)
    sql, yml = extract_blocks(md)
    return name, sql, ensure_model_name(yml, name)


def write_files_atomic(root: str | Path,
                       files: dict[str, str]) -> dict[str, str]:
    """A28: write each file via tempfile + move (reference
    src/io_utils.py:6-24). Returns {relpath: abspath}."""
    root = Path(root)
    out = {}
    for rel, content in files.items():
        dest = root / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        fd = tempfile.NamedTemporaryFile(
            "w", delete=False, dir=dest.parent, suffix=".tmp",
            encoding="utf-8")
        with fd as fh:
            fh.write(content)
        shutil.move(fd.name, dest)
        out[rel] = str(dest)
    return out
