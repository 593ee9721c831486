"""Engine-parity numeric column helpers shared by the query pack and
the operators (leaf module: imports nothing from the package)."""

from __future__ import annotations

from pyspark.sql import functions as F


def rnd(c, n: int):
    """DuckDB-compatible rounding: round(x * 10^n) / 10^n.

    Spark's round() applies HALF_UP to the EXACT binary value of x;
    DuckDB scales first, so a value whose scaled double lands exactly
    on .5 (e.g. 0.49824999... * 1e4 == 4982.5) rounds differently.
    Scaling before Spark's round reproduces DuckDB bit-for-bit
    (verified over 200k random values at n=2,4,6) — required for the
    value-hash oracle comparison at every scale factor. THE canonical
    definition: queries/core re-exports it, operators import it here.
    """
    factor = float(10 ** n)
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * factor, 0) / factor
