"""A25 — plan/generate/execute/refine agent loop.

Control flow parity with reference src/route/chat.py:75-184:
plan -> generate -> safety gate (refine when unsafe) -> execute;
non-empty result wins; empty result refines with "broader filters";
execution error refines with the error text; bounded by ``max_steps``
(default 2); fallback = last ok candidate re-run, else last
candidate. Telemetry: generation ms, execution ms, retries, last
error (A32 metrics registry).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from ..gateway import (
    IncorrectQuestionError,
    extract_sql_from_markdown,
    is_safe,
    sql_run,
)
from ..metrics import REGISTRY
from .chain import nl_to_sql, refine
from .plan import make_plan
from .provider import CompletionProvider

DEFAULT_MAX_STEPS = 2  # reference src/route/chat.py:58


@dataclass
class AgentResult:
    plan: str
    candidates: list[dict[str, str]] = field(default_factory=list)
    chosen_sql: str | None = None
    rows: list[dict[str, Any]] = field(default_factory=list)
    explain: str | None = None
    telemetry: dict[str, Any] = field(default_factory=dict)


async def agent_answer(spark: SparkSession, provider: CompletionProvider,
                       question: str, schema_docs: str,
                       max_steps: int = DEFAULT_MAX_STEPS) -> AgentResult:
    REGISTRY.inc("ai_agent_requests")
    res = AgentResult(plan=make_plan(question, schema_docs))
    retries, last_error = 0, None

    t0 = time.perf_counter()
    sql_md = await nl_to_sql(provider, question, schema_docs)
    gen_ms = (time.perf_counter() - t0) * 1000
    sql = extract_sql_from_markdown(sql_md)
    ok, reason = is_safe(sql)
    res.candidates.append({"sql": sql, "status": "draft" if ok
                           else f"unsafe:{reason}"})
    if not ok:
        retries += 1
        sql_md = await refine(provider, question, sql_md,
                              f"unsafe SQL ({reason}); fix it", schema_docs)
        sql = extract_sql_from_markdown(sql_md)

    exec_ms = 0.0
    for step in range(max_steps):
        ok, reason = is_safe(sql)
        if not ok:
            last_error = f"unsafe: {reason}"
            res.candidates.append({"sql": sql, "status": f"unsafe:{reason}"})
            retries += 1
            sql_md = await refine(provider, question, sql_md,
                                  f"unsafe SQL ({reason})", schema_docs)
            sql = extract_sql_from_markdown(sql_md)
            continue
        t1 = time.perf_counter()
        try:
            run = sql_run(spark, sql)
            exec_ms += (time.perf_counter() - t1) * 1000
        except IncorrectQuestionError as exc:
            exec_ms += (time.perf_counter() - t1) * 1000
            last_error = str(exc)
            res.candidates.append({"sql": sql, "status": f"error:{exc}"})
            retries += 1
            sql_md = await refine(provider, question, sql_md,
                                  f"execution error: {exc}", schema_docs)
            sql = extract_sql_from_markdown(sql_md)
            continue
        if run.preview:
            res.candidates.append({"sql": sql, "status": "ok"})
            res.chosen_sql, res.rows, res.explain = sql, run.preview, run.plan
            break
        res.candidates.append({"sql": sql, "status": "ok:empty"})
        retries += 1
        sql_md = await refine(provider, question, sql_md,
                              "query returned no rows; use broader filters",
                              schema_docs)
        sql = extract_sql_from_markdown(sql_md)
    else:
        # fallback: last candidate that executed ok, else last candidate
        for cand in reversed(res.candidates):
            if cand["status"].startswith("ok"):
                try:
                    run = sql_run(spark, cand["sql"])
                    res.chosen_sql = cand["sql"]
                    res.rows, res.explain = run.preview, run.plan
                    break
                except IncorrectQuestionError:
                    continue
        if res.chosen_sql is None and res.candidates:
            res.chosen_sql = res.candidates[-1]["sql"]

    REGISTRY.observe_ms("ai_sql_generation_ms", gen_ms)
    REGISTRY.observe_ms("ai_sql_exec_ms", exec_ms)
    res.telemetry = {"gen_ms": round(gen_ms, 2), "exec_ms": round(exec_ms, 2),
                     "retries": retries, "last_error": last_error}
    return res
