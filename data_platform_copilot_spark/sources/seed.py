"""Deterministic demo-events seeder.

The reference's HTTP corpus declares ``POST /demo/seed/events
{"rows": N}`` (reference query.http:164-169) but ships no handler;
the intended table shape is the documented events schema (reference
src/schema_docs.py:8-17: event_id, user_id, event_type in
view/click/purchase/signup/refund, amount, event_ts, country,
device, source). This module implements the intended behavior
Spark-first: ``spark.range(n)`` plus hash-derived column expressions
— fully distributed (no driver-side row building), deterministic
(same n -> byte-identical table, no RNG state), and linear in n, so
seeding 150k rows and seeding 1B rows are the same plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ("view", "click", "purchase", "signup", "refund")
# cumulative percentage buckets: 50/25/15/7/3
_TYPE_CUTS = (50, 75, 90, 97, 100)
COUNTRIES = ("US", "GB", "DE", "FR", "BR", "IN", "JP")
DEVICES = ("mobile", "desktop", "tablet")
SOURCES = ("ads", "organic", "email", "social")

_BASE_TS = "2024-01-01 00:00:00"
_SPAN_S = 30 * 86_400  # events spread across 30 days


def _h(tag: str) -> Column:
    """Uniform non-negative hash stream derived from (id, tag)."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(tag)))


def _pick(options: tuple[str, ...], tag: str) -> Column:
    return F.element_at(F.array(*[F.lit(o) for o in options]),
                        (_h(tag) % len(options) + 1).cast("int"))


def seed_events(spark: SparkSession, rows: int) -> DataFrame:
    """Build the deterministic demo events table (reference schema)."""
    if rows <= 0:
        raise ValueError("rows must be positive")
    bucket = _h("type") % 100
    etype = F.lit(EVENT_TYPES[-1])
    for name, cut in reversed(list(zip(EVENT_TYPES, _TYPE_CUTS))[:-1]):
        etype = F.when(bucket < cut, F.lit(name)).otherwise(etype)
    monetary = F.col("event_type").isin("purchase", "refund")
    return (
        spark.range(rows)
        .withColumn("event_type", etype)
        .select(
            F.col("id").alias("event_id"),
            (_h("user") % F.lit(max(rows // 30, 1))).alias("user_id"),
            "event_type",
            F.when(monetary, (_h("amt") % 100_000) / F.lit(100.0))
             .otherwise(F.lit(0.0)).alias("amount"),
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(_BASE_TS))
                + _h("ts") % _SPAN_S).alias("event_ts"),
            _pick(COUNTRIES, "country").alias("country"),
            _pick(DEVICES, "device").alias("device"),
            _pick(SOURCES, "source").alias("source"),
        )
    )
