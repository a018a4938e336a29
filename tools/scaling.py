"""Scale spot-check: wall-times of the shuffle-heavy set-similarity and
dedup operators at a larger SF than the parity gate uses.

These entries are hash-verified at sf0.01; this tool times them at
sf0.1 (10× the rows) so a quadratic candidate blowup or a driver-side
bottleneck shows up as a super-linear wall-time jump rather than
surviving unnoticed until cluster scale.  Results are recorded in
SCALING.md.

Usage:  python tools/scaling.py [--sf DIR] [--reps N] [name ...]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from upc_sku_data_loader_spark import plans  # noqa: F401,E402
from upc_sku_data_loader_spark.registry import QUERIES  # noqa: E402
from upc_sku_data_loader_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "k2_dedup_near_minhash",
    "k18_ngram_jaccard",
    "k36_chunk_dedup_global",
    "k37_dedup_clusters",
    "k4_knn_join",
    "k4b_knn_join_blocked",
    "k44_dup_ngram_coverage",
    "k45_contamination_score",
    "k47_coreset_fps",
    "k40_shard_assign",
    "k49_curriculum_interleave",
    # round-5 additions with data-scale shuffles
    "k50_bm25_topk",
    "k51_pmi_collocations",
    "k54_containment_pairs",
    "t9_mad_outliers",
    "k53_random_projection",
    # data-selection tier (second round-5 batch)
    "k62_cluster_best_keeper",
    "k63_dsir_importance",
    "k68_bpe_merges",
    "c15_join_fuzzy",
    "t10_cusum_changepoint",
    "k64_ccnet_buckets",
    "k69_bpe_encode",
    "d22_count_min_sketch",
    # round-6 additions with data-scale shuffles
    "k71_triangle_count",
    "k72_link_prediction",
    "k73_incremental_dedup",
    "q23_basket_lift",
    "t11_holt_trend",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or DEFAULT

    spark = get_spark(app_name="scaling")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, tuple[float, int]] = {}
    for name in names:
        samples = []
        rows = 0
        for _ in range(args.reps):
            t0 = time.time()
            rows = QUERIES[name](spark, args.sf).count()
            samples.append(time.time() - t0)
        med = round(statistics.median(samples), 3)
        results[name] = (med, rows)
        print(f"{name:32s} median={med:8.3f}s rows={rows}")

    if "k4_knn_join" in results and "k4b_knn_join_blocked" in results:
        bcast, _ = results["k4_knn_join"]
        blocked, _ = results["k4b_knn_join_blocked"]
        ratio = blocked / bcast
        print(f"k4b/k4 ratio: {ratio:.2f}x (gate: <= 2.0)")
        if ratio > 2.0:
            print("FAIL: blocked path exceeds 2x of broadcast path")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
