"""Zero-extra-scan DQ: metrics that ride a production job.

The reference profiles by pulling a sample into pandas
(`/root/reference/src/dq.py:20-79` — a separate read, bounded at
200k rows). Spark's `Dataset.observe` attaches aggregate metrics to
ANY frame so they are collected DURING whatever action the pipeline
already runs (a parquet write, a count, a streaming batch) — the DQ
numbers come from the full data for free, no second scan, no sample
bias. This is the production-pipeline shape for continuous DQ at
100 TB: the observation expressions ride the existing job's partial
aggregation, adding only a few accumulator-merged values per task.

Only aggregate expressions are allowed by Spark (no distinct, no
percentiles — those need a dedicated pass; see `dq/profiler.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def observed_profile(df: DataFrame,
                     columns: list[str] | None = None,
                     ) -> tuple[DataFrame, Observation]:
    """Attach a row-count / null-count / numeric-range observation.

    Returns (observed_df, observation). Run any action on
    observed_df (write, count, foreachBatch body), then read
    ``observation.get`` — a dict with ``n_rows``, per-column
    ``nulls_<col>``, and ``min_<col>`` / ``max_<col>`` /
    ``sum_<col>`` for numeric columns.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
        if isinstance(fields[c], _NUMERIC):
            metrics.append(F.min(c).alias(f"min_{c}"))
            metrics.append(F.max(c).alias(f"max_{c}"))
            metrics.append(F.sum(c).alias(f"sum_{c}"))
    obs = Observation()
    return df.observe(obs, *metrics), obs


def check_observed(metrics: dict, rules: dict[str, tuple]) -> list[dict]:
    """Evaluate simple threshold rules against observed metrics.

    ``rules`` maps a metric name to ("<=" | ">=" | "==", bound).
    Returns one dict per rule: {metric, op, bound, value, passed} —
    the same pass/fail report shape as `dq/rules.py`, but fed from
    ride-along observation values instead of a dedicated scan.
    """
    out = []
    ops = {"<=": lambda v, b: v <= b,
           ">=": lambda v, b: v >= b,
           "==": lambda v, b: v == b}
    for metric, (op, bound) in rules.items():
        value = metrics.get(metric)
        passed = value is not None and ops[op](value, bound)
        out.append({"metric": metric, "op": op, "bound": bound,
                    "value": value, "passed": bool(passed)})
    return out
