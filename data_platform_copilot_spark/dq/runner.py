"""A12 — DQ orchestrator (reference src/dq.py:153-172).

sample -> profile -> dispatch rules by type; unknown rule type yields
a failed result (reference src/dq.py:171). Returns the profile, the
rule results, and a <=50-row sample preview (reference src/dq.py:172).

Fidelity note (SURVEY.md §3.3): the reference runs every check on the
<=200k-row sample. We preserve that by default (rules run on the
sampled DataFrame), but ``full_table=True`` runs rules on the whole
table — the natural Spark improvement, since our rules are aggregate
pushdowns rather than in-memory pandas.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Any

from pyspark.sql import SparkSession

from .profiler import profile_df
from .rules import (
    DEFAULT_MAX_AGE_HOURS,
    DEFAULT_SIGMA,
    RuleResult,
    check_anomaly_zscore,
    check_freshness,
    check_not_null,
    check_range,
    check_unique,
)
from .sampler import fetch_table_sample

PREVIEW_ROWS = 50  # reference src/dq.py:172


@dataclass
class DQRule:
    """Mirrors the reference's pydantic DQRule (src/route/chat.py:300-306)."""
    type: str
    column: str | None = None
    min: float | None = None
    max: float | None = None
    max_age_hours: float = DEFAULT_MAX_AGE_HOURS
    sigma: float = DEFAULT_SIGMA


def run_checks(spark: SparkSession, table: str,
               rules: list[DQRule],
               where: str | None = None,
               sample_limit: int | None = None,
               full_table: bool = False,
               now: datetime | None = None) -> dict[str, Any]:
    """Run profile + rules; returns dict(profile, results, sample_rows)."""
    sample = fetch_table_sample(spark, table, where, sample_limit)
    if full_table:
        target = spark.table(table)
        if where:
            from pyspark.sql import functions as F
            target = target.where(F.expr(where))
    else:
        target = sample

    profile = profile_df(sample)

    results: list[RuleResult] = []
    for rule in rules:
        if rule.type == "not_null":
            results.append(check_not_null(target, rule.column))
        elif rule.type == "unique":
            results.append(check_unique(target, rule.column))
        elif rule.type == "range":
            results.append(check_range(target, rule.column,
                                       rule.min, rule.max))
        elif rule.type == "freshness":
            results.append(check_freshness(target, rule.column,
                                           rule.max_age_hours, now=now))
        elif rule.type == "anomaly_zscore":
            results.append(check_anomaly_zscore(target, rule.column,
                                                rule.sigma))
        else:
            # unknown rule type -> failed result (reference src/dq.py:171)
            results.append(RuleResult(
                rule=f"{rule.type}({rule.column})", passed=False,
                details={"error": f"unknown rule type: {rule.type}"}))

    sample_rows = sample.limit(PREVIEW_ROWS).toPandas().to_dict(orient="records")
    return {"profile": profile, "results": results, "sample_rows": sample_rows}
