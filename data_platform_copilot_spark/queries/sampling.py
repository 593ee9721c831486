"""Sampling queries: deterministic hash sample (oracle-verified) and
seeded stratified sample (statistical check in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import (
    deterministic_sample,
    deterministic_stratified_sample,
)
from .core import _t, query

# DuckDB: md5-hex-prefix -> integer via positional polynomial
_HEX_POLY = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) * {16 ** (5 - i)}"
    for i in range(6))


@query("deterministic_hash_sample", oracle=f"""
SELECT c_custkey AS customer_id, c_mktsegment AS segment
FROM customer
WHERE ({_HEX_POLY}) % 1000000 < 100000
""")
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample selected purely by md5(key) — exactly re-derivable
    in any engine (the eval-holdout selection pattern); value-verified
    row-for-row against the oracle."""
    cust = _t(spark, sf_dir, "customer")
    return (deterministic_sample(cust, "c_custkey", 0.10)
            .select(F.col("c_custkey").alias("customer_id"),
                    F.col("c_mktsegment").alias("segment")))


_FRACTIONS = {"BUILDING": 0.5, "MACHINERY": 0.2, "AUTOMOBILE": 0.1,
              "FURNITURE": 0.1, "HOUSEHOLD": 0.05}

_CUTOFF_CASE = "CASE c_mktsegment " + " ".join(
    f"WHEN '{seg}' THEN {int(frac * 1_000_000)}"
    for seg, frac in _FRACTIONS.items()) + " END"


@query("stratified_sample_counts", oracle=f"""
SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_sampled
FROM customer
WHERE ({_HEX_POLY}) % 1000000 < {_CUTOFF_CASE}
GROUP BY 1
""")
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment sampling at different rates (class balancing) via
    the deterministic md5 rule — the sampled set is exactly
    re-derivable in any engine, so counts per stratum value-verify
    against DuckDB replaying the identical predicate."""
    cust = _t(spark, sf_dir, "customer")
    return (deterministic_stratified_sample(
                cust, "c_mktsegment", "c_custkey", _FRACTIONS)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_sampled")))
