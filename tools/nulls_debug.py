"""Print both engines' canonical rows for registry entries on a sweep
fixture — the debugging companion to tools/degenerate_sweep.py.

Usage:
    python tools/nulls_debug.py [--mode=nulls|degenerate|extreme|megadoc|nfd] name [name...]
    python tools/nulls_debug.py --mode=fuzz:SEED name [name...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from upc_sku_data_loader_spark import plans  # noqa: F401,E402
from upc_sku_data_loader_spark.registry import QUERIES, ORACLES  # noqa: E402
from upc_sku_data_loader_spark.session import get_spark  # noqa: E402
from tools.parity import canon_rows, duck_connect  # noqa: E402
from tools.degenerate_sweep import (  # noqa: E402
    build, build_extreme, build_megadoc, build_nfd, build_nulls,
)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "nulls"
    for a in sys.argv[1:]:
        if a.startswith("--mode="):
            mode = a.split("=", 1)[1]
    if mode.startswith("fuzz:"):
        from tools.fuzz_sweep import build as build_fuzz

        seed = int(mode.split(":", 1)[1])
        sf_dir = build_fuzz(REPO / ".scratch" / f"fuzz_seed{seed}", seed, 48)
    else:
        builder = {
            "nulls": build_nulls,
            "degenerate": build,
            "extreme": build_extreme,
            "megadoc": build_megadoc,
            "nfd": build_nfd,
        }[mode]
        sf_dir = builder(REPO / ".scratch" / f"degenerate_{mode}"
                         if mode != "degenerate" else REPO / ".scratch" / "degenerate")
    spark = get_spark(app_name="nulls_debug")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)
    for name in args:
        print(f"===== {name} =====")
        try:
            sdf = QUERIES[name](spark, sf_dir)
            scols, srows = canon_rows(sdf.columns, sdf.collect())
            print(f"-- spark ({len(srows)} rows) cols={scols}")
            for r in srows[:40]:
                print("  S", r)
        except Exception as e:  # noqa: BLE001
            print(f"-- spark ERROR: {type(e).__name__}: {str(e)[:500]}")
        sql = ORACLES.get(name)
        if sql is None:
            print("-- no oracle (rows-only)")
            continue
        try:
            cur = con.execute(sql)
            ocols, orows = canon_rows([d[0] for d in cur.description], cur.fetchall())
            print(f"-- duck  ({len(orows)} rows) cols={ocols}")
            for r in orows[:40]:
                print("  D", r)
        except Exception as e:  # noqa: BLE001
            print(f"-- duck ERROR: {type(e).__name__}: {str(e)[:500]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
