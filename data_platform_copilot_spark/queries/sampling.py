"""Sampling queries: deterministic hash sample (oracle-verified) and
seeded stratified sample (statistical check in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import deterministic_sample, stratified_sample
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


@query("stratified_sample_counts")  # seeded RNG: rows-only check
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Bernoulli sampling at different rates (class
    balancing); sampled counts per stratum. Seeded but engine-specific
    RNG -> no value oracle; fraction accuracy asserted in tests."""
    cust = _t(spark, sf_dir, "customer")
    fractions = {"BUILDING": 0.5, "MACHINERY": 0.2, "AUTOMOBILE": 0.1,
                 "FURNITURE": 0.1, "HOUSEHOLD": 0.05}
    return (stratified_sample(cust, "c_mktsegment", fractions)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_sampled")))
