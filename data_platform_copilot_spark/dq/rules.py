"""A7-A11 — the five data-quality rules (reference src/dq.py:94-149).

Reference quirks deliberately preserved (SURVEY.md §5):
- ``unique``: dupes = total_rows - countDistinct(col); distinct
  ignores NULLs while the total doesn't, so every NULL counts as a
  duplicate (reference src/dq.py:103-106).
- ``anomaly_zscore``: POPULATION std (ddof=0); zero variance or no
  data auto-passes (reference src/dq.py:139-141).
- ``range``: violation rate is over TOTAL rows, not non-null rows
  (reference src/dq.py:115).

Each rule is a constant number of Spark aggregates over the input
DataFrame — no collects of data rows, so they run unchanged on a
full 100 TB table (the reference could only check a 200k sample).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import settings

DEFAULT_MAX_AGE_HOURS = 24.0  # reference src/dq.py:167
DEFAULT_SIGMA = settings.data_quality.default_sigma  # reference src/config.py:197


@dataclass
class RuleResult:
    rule: str
    passed: bool
    details: dict[str, Any] = field(default_factory=dict)


def check_not_null(df: DataFrame, column: str) -> RuleResult:
    """A7: pass iff zero NULLs (reference src/dq.py:94-98)."""
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col(column).isNull().cast("long")).alias("nulls"),
    ).collect()[0]
    total, nulls = row["total"], int(row["nulls"] or 0)
    return RuleResult(
        rule=f"not_null({column})",
        passed=nulls == 0,
        details={"nulls": nulls, "total": total,
                 "null_rate_pct": round(100.0 * nulls / total, 4) if total else 0.0},
    )


def check_unique(df: DataFrame, column: str) -> RuleResult:
    """A8: dupes = total - distinct(non-null); NULLs count as dupes."""
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct(F.col(column)).alias("distinct"),
    ).collect()[0]
    total, distinct = row["total"], int(row["distinct"] or 0)
    dupes = total - distinct
    return RuleResult(
        rule=f"unique({column})",
        passed=dupes == 0,
        details={"duplicates": dupes, "total": total, "distinct": distinct},
    )


def check_range(df: DataFrame, column: str,
                min_value: float | None = None,
                max_value: float | None = None) -> RuleResult:
    """A9: count non-null values outside [min, max]; rate over total."""
    c = F.col(column)
    viol = F.lit(False)
    if min_value is not None:
        viol = viol | (c < F.lit(min_value))
    if max_value is not None:
        viol = viol | (c > F.lit(max_value))
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((c.isNotNull() & viol).cast("long")).alias("violations"),
    ).collect()[0]
    total, violations = row["total"], int(row["violations"] or 0)
    return RuleResult(
        rule=f"range({column})",
        passed=violations == 0,
        details={"violations": violations, "total": total,
                 "min": min_value, "max": max_value,
                 "violation_rate_pct": round(100.0 * violations / total, 4)
                 if total else 0.0},
    )


def check_freshness(df: DataFrame, column: str,
                    max_age_hours: float = DEFAULT_MAX_AGE_HOURS,
                    now: datetime | None = None) -> RuleResult:
    """A10: max(to_timestamp(col)) age vs now; fail when nothing parses.

    ``now`` is injectable for deterministic tests/oracles; defaults to
    wall-clock UTC like the reference (pd.Timestamp.utcnow)."""
    # try_to_timestamp = pandas to_datetime(errors="coerce") parity:
    # malformed strings become NULL instead of raising (ANSI mode).
    row = df.agg(
        F.max(F.try_to_timestamp(F.col(column))).alias("max_ts")).collect()[0]
    max_ts = row["max_ts"]
    if max_ts is None:
        return RuleResult(rule=f"freshness({column})", passed=False,
                          details={"error": "no parseable timestamps"})
    now = now or datetime.now(timezone.utc)
    if max_ts.tzinfo is None:
        max_ts = max_ts.replace(tzinfo=timezone.utc)
    age_hours = (now - max_ts).total_seconds() / 3600.0
    return RuleResult(
        rule=f"freshness({column})",
        passed=age_hours <= max_age_hours,
        details={"max_ts": max_ts.isoformat(),
                 "age_hours": round(age_hours, 4),
                 "max_age_hours": max_age_hours},
    )


def check_anomaly_zscore(df: DataFrame, column: str,
                         sigma: float = DEFAULT_SIGMA) -> RuleResult:
    """A11: |x - mean| / std_pop > sigma outlier count; two aggregate
    passes (stats, then filtered count) — the distributed equivalent
    of the reference's in-memory two-step."""
    c = F.col(column)
    stats = df.agg(F.mean(c).alias("mu"),
                   F.stddev_pop(c).alias("sd"),
                   F.count(c).alias("n")).collect()[0]
    mu, sd, n = stats["mu"], stats["sd"], stats["n"]
    if not n or sd is None or sd == 0.0:
        # no data / no variance -> auto-pass (reference src/dq.py:139-141)
        return RuleResult(rule=f"anomaly_zscore({column})", passed=True,
                          details={"outliers": 0, "n": n or 0,
                                   "mean": mu, "std": sd, "sigma": sigma})
    outliers = df.where(F.abs((c - F.lit(mu)) / F.lit(sd)) > sigma).count()
    return RuleResult(
        rule=f"anomaly_zscore({column})",
        passed=outliers == 0,
        details={"outliers": outliers, "n": n, "mean": mu, "std": sd,
                 "sigma": sigma},
    )
