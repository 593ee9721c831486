"""Vector math over array<float> columns — JVM-side, no UDFs.

``F.zip_with`` + ``F.aggregate`` fold the arithmetic inside codegen;
casting to double first keeps the accumulation precision identical
to the DuckDB oracle (which computes over doubles).

Scale note: these are per-row scalar expressions (no shuffle);
similarity *search* built on them shuffles only in the pairing stage
(see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (sequential left fold, same
    accumulation order as the oracle's list_dot_product)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
