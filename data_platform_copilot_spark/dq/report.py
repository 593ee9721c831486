"""A13 — markdown DQ report (reference src/dq.py:176-198).

Engine-agnostic string building: summary line, per-rule status lines,
profile excerpt with top-3 values per column.
"""

from __future__ import annotations

from typing import Any

from .rules import RuleResult


def render_markdown_report(table: str,
                           profile: dict[str, dict[str, Any]],
                           results: list[RuleResult]) -> str:
    passed = sum(1 for r in results if r.passed)
    lines = [
        f"# Data Quality Report — `{table}`",
        "",
        f"**Summary: {passed}/{len(results)} rules passed**",
        "",
        "## Rules",
    ]
    for r in results:
        icon = "✅" if r.passed else "❌"
        detail = ", ".join(f"{k}={v}" for k, v in r.details.items())
        lines.append(f"- {icon} `{r.rule}` — {detail}")
    lines += ["", "## Profile (excerpt)"]
    for col, prof in profile.items():
        lines.append(
            f"- `{col}` ({prof['dtype']}): count={prof['count']}, "
            f"nulls={prof['nulls']}, distinct={prof['distinct']}")
        top = prof.get("top_values", [])[:3]
        if top:
            tops = ", ".join(f"{t['value']!r}×{t['count']}" for t in top)
            lines.append(f"  - top: {tops}")
    return "\n".join(lines)
