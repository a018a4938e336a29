"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key (SURVEY §2 C8 — no native Spark operator).

Strategy (pure DataFrame, one shuffle, no UDF):
  1. tag both sides and union them on (key, ts);
  2. one window per key ordered by (ts, side) — right rows sort before
     left rows at equal ts so ``>=`` (inclusive) semantics hold;
  3. ``last(<struct of ALL carried right columns>, ignorenulls=True)``
     over an unbounded-preceding frame carries the most recent right
     ROW forward — one struct, not per-column fills, so every asof_*
     output column comes from the same right row and that row's genuine
     NULL values are preserved (pd.merge_asof semantics; carrying each
     column independently would silently mix rows when the latest right
     row holds a NULL);
  4. keep only left rows and project the struct's fields.

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
    ``asof_<v>`` for each requested right value column.

    NULL-timestamp convention (--nulls sweep): a right row with NULL
    ``right_ts`` can never be "at or before" anything, so it is dropped
    here — under the union's NULLS-FIRST sort it would otherwise pose
    as a match preceding every left row.  A LEFT row with NULL ts keeps
    its row with a NULL match (it sorts first, so its preceding frame
    is empty) — the timeless probe has no as-of answer.

    NULL-key convention (fuzz sweep, seed 7): the as-of join is an
    EQUALITY join on ``on`` — NULL keys never match, exactly like
    `p.k = c.k`.  The union rewrite's partitionBy would otherwise
    group NULL-key probes WITH NULL-key quotes; dropping NULL-key
    right rows restores SQL semantics while NULL-key left rows keep
    their row with a NULL match (their partition holds no right rows).
    """
    keys = [on] if isinstance(on, str) else list(on)
    carried = [right_ts, *right_values]

    right = right.filter(F.col(right_ts).isNotNull())
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    rt = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        # one struct = the whole carried right row; non-null whenever a
        # right row exists, even if every carried value in it is NULL
        F.struct(*[F.col(c) for c in carried]).alias("__rrow"),
    )
    lt = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(
            *[c for c in left.columns if c not in keys and c != left_ts]
        ).alias("__lrow"),
        F.lit(None).cast(rt.schema["__rrow"].dataType).alias("__rrow"),
    )
    rt = rt.withColumn(
        "__lrow", F.lit(None).cast(lt.schema["__lrow"].dataType)
    )

    # __rrow as the final sort key makes ties deterministic: several right
    # rows sharing (key, ts) would otherwise be picked arbitrarily per
    # run; ordering by the carried struct pins the winner to the greatest
    # struct value (documented tie policy — pandas' "last in input order"
    # has no distributed equivalent).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__rrow"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt, allowMissingColumns=False).withColumn(
        "__asof_row", F.last(F.col("__rrow"), ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("__side") == 1)
    return out.select(
        *keys,
        F.col("__ts").alias(left_ts),
        "__lrow.*",
        *[F.col("__asof_row").getField(c).alias(f"asof_{c}") for c in carried],
    )
