"""Cross-engine deterministic float aggregation.

Problem: SUM/AVG over doubles is summation-order-dependent, and Spark and
DuckDB reduce groups in different orders, so ``round(sum(x), 2)`` can land
on opposite sides of a rounding boundary — flaky hash mismatches in the
correctness gate (observed: avg(value) differing in the 4th decimal at the
exact .5 boundary).

Fix: quantize every addend to a *dyadic rational* (an exact multiple of
2^-bits) before aggregating.  IEEE-754 addition of dyadic rationals is
EXACT — hence order-independent — as long as the running sum stays below
2^53 * 2^-bits.  Both engines then compute bit-identical sums, so the final
round() agrees.  The quantization is part of the query semantics (applied
identically on the Spark and oracle side) and its error (2^-(bits+1) per
addend) is far below the rounded output precision.

Bit budgets (value_magnitude * 2^bits * n_rows < 2^53):
- BITS_SMALL = 20  — inputs ≤ ~1e2, group sums ≤ ~8e9.
- BITS_MONEY = 16  — inputs ≤ ~1e6, table-wide sums ≤ ~1.3e11.
- BITS_VAR   = 10  — when addends are *squares* of quantized values
                     (fraction bits double), for stddev/variance.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS_SMALL = 20
BITS_MONEY = 16
BITS_VAR = 10


# All rounding here is the HALF-UP FLOOR FORM floor(x*s + 0.5)/s, never
# round(): engine round() implementations are tie-unsafe against each
# other (Spark = BigDecimal HALF_UP of the double's shortest repr, DuckDB
# = scaled-double, numpy = half-to-even), and a value within one ulp of a
# boundary flips between them — the r02 driver-red failure class.  One
# IEEE multiply + add + floor of the same double is bit-deterministic on
# every engine.  Spark floor(double) returns LONG, so the result is cast
# back to DOUBLE before the divide (DuckDB's floor stays DOUBLE; the
# values are identical either way, but column types must match too).


def dyadic(col: Union[Column, str], bits: int = BITS_SMALL) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scale = 1 << bits
    return F.floor(c * scale + F.lit(0.5)).cast("double") / scale


def dyadic_sql(expr: str, bits: int = BITS_SMALL) -> str:
    scale = 1 << bits
    return f"(CAST(floor(({expr}) * {scale} + 0.5) AS DOUBLE) / {scale})"


def r_out(col: Union[Column, str], digits: int) -> Column:
    """Tie-proof output rounding to ``digits`` decimals (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.floor(c * scale + F.lit(0.5)).cast("double") / F.lit(scale)


def r_out_sql(expr: str, digits: int) -> str:
    """Tie-proof output rounding (oracle side) — identical arithmetic."""
    scale = 10**digits
    return (
        f"(CAST(floor(({expr}) * CAST({scale} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
        f" / CAST({scale} AS DOUBLE))"
    )


def stddev_samp_det(col: Union[Column, str], bits: int = BITS_VAR) -> Column:
    """Deterministic sample stddev: two-pass formula over exact dyadic sums
    (sqrt((sum(x²) - sum(x)²/n) / (n-1))); NULL when n < 2, matching
    stddev_samp.  Use the same formula via stddev_samp_det_sql as oracle."""
    q = dyadic(col, bits)
    n = F.count(F.col(col) if isinstance(col, str) else col)
    sx = F.sum(q)
    sx2 = F.sum(q * q)
    return F.when(n > 1, F.sqrt((sx2 - sx * sx / n) / (n - 1)))


def stddev_samp_det_sql(expr: str, bits: int = BITS_VAR) -> str:
    q = dyadic_sql(expr, bits)
    return (
        f"CASE WHEN count({expr}) > 1 THEN "
        f"sqrt((sum({q} * {q}) - sum({q}) * sum({q}) / count({expr})) / (count({expr}) - 1)) "
        f"END"
    )
