"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key (SURVEY §2 C8 — no native Spark operator).

Strategy (pure DataFrame, one shuffle, no UDF):
  1. tag both sides and union them on (key, ts);
  2. one window per key ordered by (ts, side) — right rows sort before
     left rows at equal ts so ``>=`` (inclusive) semantics hold;
  3. ``last(<right value>, ignorenulls=True)`` over an
     unbounded-preceding frame carries the most recent right value
     forward;
  4. keep only left rows.

Scale: the union shuffles once on the key (same as any keyed join) and
the window is a single sort within each key partition — this is the
textbook distributed as-of plan; no per-row Python, no broadcast
requirement, skew handled by AQE. An ``applyInPandas`` +
``pd.merge_asof`` variant would move every byte through Arrow — only
worth it when per-key data fits memory and the lambda must be Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join; output = left columns + ``asof_<right_ts>`` +
    ``asof_<v>`` for each requested right value column."""
    keys = [on] if isinstance(on, str) else list(on)
    carried = [right_ts, *right_values]

    lt = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(
            *[c for c in left.columns if c not in keys and c != left_ts]
        ).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
    )
    rt = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lt.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    for c in carried:
        unioned = unioned.withColumn(
            f"asof_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("__side") == 1)
    return out.select(
        *keys,
        F.col("__ts").alias(left_ts),
        "__lrow.*",
        *[F.col(f"asof_{c}") for c in carried],
    )
