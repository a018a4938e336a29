"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

One warm SparkSession serves the whole suite (BASELINE.md measures the
same way); per-query time is action-to-completion wall clock of a
count-style consume (we avoid toPandas so the measurement is engine
time, not Arrow transfer).

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 7) and reports
the per-query MEDIAN; the machine shows ±70% wall-clock variance under
co-tenant load, so a single sample is noise (round-2 lesson) and even
a median-of-3 carries the noise band into the artifact (round-4: q1
median 2.122s with spread 1.61s vs a low-load measurement of the same
plan at ~1.0s).  The spread is published alongside ("spread" =
max-min per query) so a noisy run is visible in the JSON rather than
silently inflating a median.
"""

from __future__ import annotations

import json
import os
import statistics
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


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat line 1 — 0,0 if unreadable."""
    try:
        fields = Path("/proc/stat").read_text().splitlines()[0].split()[1:]
        vals = [int(v) for v in fields]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def main() -> int:
    # Sample load BEFORE we start spinning 32 executor threads: the
    # pre-run 1-min loadavg is the co-tenant signal; by end-of-suite the
    # number would mostly measure this bench itself.
    loadavg_start = [round(v, 2) for v in os.getloadavg()]
    steal0, total0 = _cpu_ticks()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: touch every fixture table once so JIT/IO cache effects are
    # amortized the same way for all queries (BASELINE used a warm session).
    from upc_sku_data_loader_spark.catalog import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()

    # Spin up the Python worker pool too: q_embed_knn's mapInPandas pays
    # ~2-4 s of daemon/worker fork + Arrow init on the session's FIRST
    # Python-eval stage, which otherwise lands entirely in its first rep
    # and shows up as a 4 s spread on a 1 s query (round-4 artifact).
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "7")))
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    best: dict[str, float] = {}
    for label, qname in HEADLINE.items():
        if qname not in QUERIES:
            continue
        samples: list[float] = []
        n = 0
        for _ in range(reps):
            t0 = time.time()
            df = QUERIES[qname](spark, sf_dir)
            n = df.count()
            samples.append(time.time() - t0)
        timings[label] = round(statistics.median(samples), 3)
        spread[label] = round(max(samples) - min(samples), 3)
        # The min is the noise-robust engine-cost estimate: host-level
        # steal (invisible to this VM's loadavg) inflates medians with
        # multi-second spreads even on an idle guest; the fastest rep
        # is what the plan costs when the host lets it run.
        best[label] = round(min(samples), 3)
        print(
            f"# {label} ({qname}): median={timings[label]}s "
            f"min={best[label]}s spread={spread[label]}s rows={n} n={reps}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # Hypervisor steal ACROSS the whole suite run: loadavg can't see
    # host-level contention, but /proc/stat's steal field can — steal_pct
    # is the fraction of this guest's CPU time the host gave away while
    # the suite ran (round-5 adjudication: a 2x artifact swing at
    # loadavg 0.2 was pure steal).
    steal1, total1 = _cpu_ticks()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (total1 - total0), 1)
        if total1 > total0
        else None
    )
    # Record run conditions (r5 verdict #5): a co-tenant-inflated artifact
    # should self-document so a 2x swing is adjudicable from the JSON alone
    # (cross-check spreads + loadavg against SCALING.md's low-load medians).
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "qmin": best,
                "spread": spread,
                "reps": reps,
                "loadavg": loadavg_start,
                "steal_pct": steal_pct,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
