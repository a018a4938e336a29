"""Dump ``explain("formatted")`` for registry queries to plans/r<N>/.

Usage:
    python tools/capture_plans.py --tag before [--round 10] [--sf DIR] name ...

Writes ``plans/r<round>/<name>_<tag>.txt`` for each query — the judged
evidence files for optimization-round plan claims.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from upc_sku_data_loader_spark import plans  # noqa: F401,E402
from upc_sku_data_loader_spark.registry import QUERIES  # noqa: E402
from upc_sku_data_loader_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--round", type=int, default=10)
    ap.add_argument("--tag", required=True)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    out_dir = REPO / "plans" / f"r{args.round}"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        if name not in QUERIES:
            print(f"unknown query {name}", file=sys.stderr)
            return 2
        df = QUERIES[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.tag}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
