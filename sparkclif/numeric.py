"""Numeric aggregation helpers — exact, order-independent, codegen-fast.

Hash-matching a DuckDB oracle forbids plain double sums (partial-sum
order differs between engines, and round(..., 4) can flip on the last
ulp). Accumulating in DECIMAL(38,6) is exact but leaves whole-stage
codegen for per-row BigDecimal allocation — measured 4-10x slower than
a long sum at bench scale, with enough GC garbage to slow *subsequent*
queries.

``fixed_sum`` keeps the hot path integral: round the per-row value at
``scale`` decimal digits (exactly what the oracle's ``CAST(x AS
DECIMAL(p, scale))`` does), scale to a LONG, sum longs (exact,
order-independent, codegen), and only then — once per group — divide
back in DECIMAL. Result is bit-identical to decimal accumulation while
every per-row op stays in whole-stage codegen on primitives.

Overflow bound: |sum| * 10^scale must stay under 2^63 ≈ 9.2e18. For
money columns (magnitude ~1e5, scale 6) that is ~9e7 rows *per group*
— far past bench scale. At 100 TB (~5e11 rows) a single global sum
would overflow, so groups above the bound must accumulate in
DECIMAL(38, scale): pass ``big=True`` there. The switch is a per-query
declaration because the engine knows its grouping cardinality, the
helper does not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed_sum(col: Column | str, scale: int = 6, round_to: int = 4, big: bool = False) -> Column:
    """Exact sum of a fixed-point-valued double column, rounded for the
    oracle compare. Equivalent to
    ``round(CAST(sum(CAST(col AS DECIMAL(38, scale))) AS DOUBLE), round_to)``.

    ``big=True`` selects decimal accumulation for groups whose scaled
    sum could exceed 2^63 (see module docstring) — slower, unbounded.
    """
    c = F.col(col) if isinstance(col, str) else col
    if big:
        return F.round(F.sum(c.cast(f"decimal(38,{scale})")).cast("double"), round_to)
    factor = 10**scale
    # Half-away-from-zero via floor arithmetic: Spark's Round on a
    # DOUBLE allocates a BigDecimal per row (measured ~3x on a 10-agg
    # groupBy); floor() stays a primitive inside whole-stage codegen.
    # Values here are fixed-point (exact multiples of 10^-scale) whose
    # scaled double error is << 0.5, so the tie-at-exactly-.5 case the
    # two formulations could disagree on cannot arise.
    v = c * F.lit(float(factor))
    scaled = F.when(v >= 0, F.floor(v + F.lit(0.5))).otherwise(
        -F.floor(-v + F.lit(0.5))
    )
    # one decimal division per GROUP, not per row: exact rescale
    total = F.sum(scaled).cast("decimal(38,0)") / F.lit(factor).cast("decimal(19,0)")
    return F.round(total.cast("double"), round_to)
