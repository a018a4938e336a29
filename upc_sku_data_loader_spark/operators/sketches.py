"""Distributed frequency sketches (reference file:line n/a — empty
tree, SURVEY §0.1; algorithm: Misra & Gries 1982, "Finding repeated
elements", Sci. Comput. Program. 2 — public literature).

Misra-Gries heavy hitters, the mergeable-summary way:

1. **Partial sketch per partition** (`mapInPandas`, Arrow-batched):
   each task streams its rows through an m-counter MG summary.  The
   classic guarantee: a summary built from n_p items undercounts any
   element by at most n_p/m, and every element with true partition
   frequency > n_p/m survives in the summary.
2. **Merge** = plain groupBy-sum of the partial counters: summed
   lower bounds undercount by at most Σ n_p/m = n/m (MG summaries are
   mergeable under counter addition — Agarwal et al., PODS'12).
   Any global element with frequency > n/m is guaranteed present.
3. **Exact recount** of the (≤ m × #partitions, in practice ~m)
   surviving candidates: one semi-join back over the corpus restores
   exact counts, so the final top-k is *exact* whenever the candidate
   set covers the true top-k — which step 2 guarantees when the k-th
   frequency exceeds n/m.  Capacity m is therefore sized ≫ k.

Scale shape: pass 1 is map-only (no shuffle; each task emits ≤ m
rows); the merge shuffles only #tasks × m sketch rows, never the
corpus; the recount is a broadcast semi filter + one keyed agg on the
surviving sliver.  The corpus is scanned twice but never re-shuffled —
at 100 TB the candidate relation is a few thousand rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partial(col: str, capacity: int):
    """mapInPandas fn: one Misra-Gries summary per task."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:  # decrement-all step, drop zeros
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame(
            {"item": list(counters), "lb": list(counters.values())}
        )

    return fn


def heavy_hitters(items: DataFrame, col: str, k: int, capacity: int = 256) -> DataFrame:
    """Exact top-k heavy hitters of ``items[col]`` via MG candidates +
    exact recount.  Returns (item, cnt) — deterministic (ties broken by
    item) and independent of partitioning whenever the k-th true
    frequency exceeds n/capacity (the MG coverage guarantee)."""
    partials = items.select(F.col(col).alias("item")).mapInPandas(
        _mg_partial("item", capacity), schema="item string, lb long"
    )
    candidates = partials.groupBy("item").agg(F.sum("lb").alias("lb"))
    recount = (
        items.select(F.col(col).alias("item"))
        .join(F.broadcast(candidates.select("item")), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return recount.orderBy(F.col("cnt").desc(), "item").limit(k)
