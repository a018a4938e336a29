"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

One warm SparkSession serves the whole suite (BASELINE.md measures the
same way); per-query time is action-to-completion wall clock of a
count-style consume (we avoid toPandas so the measurement is engine
time, not Arrow transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from upc_sku_data_loader_spark import plans  # noqa: F401,E402
from upc_sku_data_loader_spark.registry import QUERIES  # noqa: E402
from upc_sku_data_loader_spark.session import get_spark  # noqa: E402

# Headline queries: the six BASELINE.md shapes, mapped to registry entries.
HEADLINE = {
    "q1_pricing_summary": "d1_agg_hash_grouped",
    "q3_join3_topk": "c1_join_inner_equi",
    "q_window_rank": "e1_win_row_number",
    "q_events_tumbling": "i1_tumbling_window",
    "q_text_wordcount": "k7_term_freq_tfidf",
    "q_embed_knn": "k3_similarity_topk",
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: touch every fixture table once so JIT/IO cache effects are
    # amortized the same way for all queries (BASELINE used a warm session).
    from upc_sku_data_loader_spark.catalog import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for label, qname in HEADLINE.items():
        if qname not in QUERIES:
            continue
        t0 = time.time()
        df = QUERIES[qname](spark, sf_dir)
        n = df.count()
        timings[label] = round(time.time() - t0, 3)
        print(f"# {label} ({qname}): {timings[label]}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
