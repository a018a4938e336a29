"""Cross-engine-exact expression helpers.

The driver hash-compares Spark results against DuckDB at the value
level, so floating-point aggregation order matters.  These helpers give
each side a formulation that is *provably identical*, not merely close:

- ``dsum``: per-row cast to DECIMAL (both engines round the double to
  the same decimal value — ties at the 6th decimal of a double product
  are practically impossible), then an exact, order-independent decimal
  SUM, then one deterministic decimal→double cast.
- ``rnd``: ROUND(x, n) applied on BOTH sides for intrinsically
  order-sensitive aggregates (avg/stddev/corr/cosine), absorbing ~1e-9
  cross-engine drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal wide enough for sf-scaled money sums: 600k rows × ~1e5 values
# → ~1e11; decimal(30,6) sums keep 24 integer digits of headroom.
DECIMAL_T = "decimal(30,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact double SUM: decimal-cast per row → SUM → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL_T)).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


def rnd(col: Column | str, alias: str, n: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, n).alias(alias)


def rnd_sql(expr: str, alias: str, n: int = 4) -> str:
    return f"ROUND({expr}, {n}) AS {alias}"
