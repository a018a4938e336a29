"""Operator-query registry: the engine's verifiable surface.

Every operator row in SURVEY.md §2 lands here as a named query:
- ``QUERIES[name]`` — ``(spark, sf_dir) -> DataFrame`` (the Spark-first
  implementation under test), and
- ``ORACLES[name]`` — equivalent ANSI SQL that DuckDB runs on the same
  parquet (omitted for genuinely non-SQL-expressible ops → the driver
  records a weaker rows-only check).

Column-name discipline (driver compares sorted-by-name columns): every
computed column is aliased identically on both sides.

Float discipline (driver value-hash must match exactly):
- SUM over doubles: cast the addend to DECIMAL per row, SUM the decimal
  (order-independent, exact), cast the result to DOUBLE.  Both engines
  produce the identical double. See ``dsum_expr``.
- AVG / stddev / similarity scores: ROUND(x, N) on BOTH sides; the
  residual cross-engine fp difference (~1e-9 relative) is astronomically
  unlikely to straddle a rounding boundary.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator query; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco
