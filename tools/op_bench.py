"""Per-operator micro-bench: time registry queries with the noop sink.

Usage:
    python tools/op_bench.py [--sf DIR] [--reps N] [--out FILE] [name ...]

Times each named query (default: all) by building the plan fresh each
rep and consuming it with ``df.write.format("noop").mode("overwrite")
.save()`` — the guide-§1.4 methodology: every column of every row is
computed and discarded, so the number is the computation, not the sink
and not count()'s column-pruned shortcut.  Reports per-query median and
min over ``--reps`` (default 3) to one JSON line per query on stdout
(and ``--out`` if given).

This is the OPTIMIZATION-round measurement harness; ``bench.py`` (the
driver contract) keeps its historical count()-based methodology so its
numbers stay comparable across rounds.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from upc_sku_data_loader_spark import plans  # noqa: F401,E402
from upc_sku_data_loader_spark.registry import QUERIES  # noqa: E402
from upc_sku_data_loader_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    names = args.names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="op_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm fixtures + the Python worker pool the same way bench.py does,
    # so first-query JIT/fork costs don't land on the first name timed.
    from upc_sku_data_loader_spark.catalog import TABLES, load

    for t in TABLES:
        load(spark, args.sf, t).count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    out_f = open(args.out, "w") if args.out else None
    for name in names:
        samples = []
        err = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"op_bench:{name}")
            t0 = time.time()
            try:
                df = QUERIES[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"[:200]
                break
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        rec = {
            "name": name,
            "median": round(statistics.median(samples), 3) if samples else None,
            "min": min(samples) if samples else None,
            "samples": samples,
            "err": err,
        }
        line = json.dumps(rec)
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()
    if out_f:
        out_f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
