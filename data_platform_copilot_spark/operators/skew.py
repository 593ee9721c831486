"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; explicit salting remains the tool when one build-side key
is so hot that even split partitions overwhelm a task, or when AQE is
unavailable (streaming joins, some cluster configs).

Mechanics: the probe (large, skewed) side gets a deterministic salt
in [0, S) derived from hashing its other columns; the build side is
replicated S times (explode) so every salted key finds its match.
Equality with the plain join is property-tested.

At 100 TB: apply ONLY to keys detected as hot (pre-aggregate a key
histogram, salt the top-k keys, union with the unsalted remainder) —
blanket salting multiplies the build side by S.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(large: DataFrame, small: DataFrame, key: str,
                salts: int = 8, how: str = "inner") -> DataFrame:
    """Join ``large`` to ``small`` on ``key`` with salt fan-out.

    Output columns = large's columns + small's non-key columns
    (like a plain ``join(..., on=key)``)."""
    other_cols = [c for c in large.columns if c != key]
    salt_src = F.xxhash64(*[F.col(c) for c in other_cols]) if other_cols \
        else F.xxhash64(F.col(key))
    l_salted = large.withColumn("__salt", F.pmod(salt_src, F.lit(salts)))
    s_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = l_salted.join(s_rep, [key, "__salt"], how)
    return out.drop("__salt")
