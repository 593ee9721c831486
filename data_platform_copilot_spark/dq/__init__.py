from .profiler import profile_df
from .report import render_markdown_report
from .rules import (
    RuleResult,
    check_anomaly_zscore,
    check_freshness,
    check_not_null,
    check_range,
    check_unique,
)
from .runner import DQRule, run_checks
from .sampler import fetch_table_sample

__all__ = [
    "DQRule",
    "RuleResult",
    "check_anomaly_zscore",
    "check_freshness",
    "check_not_null",
    "check_range",
    "check_unique",
    "fetch_table_sample",
    "profile_df",
    "render_markdown_report",
    "run_checks",
]
