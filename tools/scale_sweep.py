"""Full-registry scale sweep: wall-time every registry entry at a base SF
and at an N× replica (tools/make_scale.py output), and flag super-linear
growth.

tools/scaling.py spot-checks the hand-picked shuffle-heavy set; this tool
closes the tail — every remaining entry gets a measured base→scaled wall
ratio so "no super-linear operator" is a swept claim, not a sampled one.
Gate matches SCALING.md: ratio ≤ 30× at 10× rows (generous because several
ops have output that legitimately grows super-linearly under the replica
construction — e.g. near-dup pair counts; see SCALING.md k18 note).

Usage:
    python tools/scale_sweep.py --remaining          # everything not in SCALING.md
    python tools/scale_sweep.py name1 name2 ...      # explicit subset
    python tools/scale_sweep.py --out sweep.jsonl    # append JSONL records
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from upc_sku_data_loader_spark import plans  # noqa: F401,E402
from upc_sku_data_loader_spark.registry import QUERIES  # noqa: E402
from upc_sku_data_loader_spark.session import get_spark  # noqa: E402


def measured_in_scaling_md() -> set[str]:
    """Names already carrying a SCALING.md table row (first column)."""
    names = set()
    md = REPO / "SCALING.md"
    if md.exists():
        for line in md.read_text().splitlines():
            m = re.match(r"\|\s*([a-z][a-z0-9_]+)\s*\|", line)
            if m and m.group(1) in QUERIES:
                names.add(m.group(1))
    return names


def time_one(spark, name: str, sf_dir: str, reps: int) -> tuple[float, int, list[float]]:
    """(best wall, rows, per-rep walls).  For entries with a one-time
    idempotent fixture build (a25's embedded-Derby load), rep 1 pays the
    build and later reps measure the operator alone — so `best` is the
    operator-only number and reps[0] - best approximates the build."""
    walls: list[float] = []
    rows = 0
    for _ in range(reps):
        t0 = time.time()
        rows = QUERIES[name](spark, sf_dir).count()
        walls.append(time.time() - t0)
    return min(walls), rows, walls


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--scaled", default=str(REPO / ".scratch" / "replicas" / "sfscale_10x")
    )
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--gate", type=float, default=30.0)
    ap.add_argument("--remaining", action="store_true",
                    help="sweep every registry entry without a SCALING.md row")
    ap.add_argument("--out", default=None, help="append JSONL records here")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.remaining:
        done = measured_in_scaling_md()
        names = [n for n in QUERIES if n not in done]
    else:
        names = args.names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")
    if args.out and Path(args.out).exists():  # resume: skip recorded names
        swept = {json.loads(line)["name"] for line in Path(args.out).open()}
        names = [n for n in names if n not in swept]
        print(f"# resume: {len(swept)} already in {args.out}, "
              f"{len(names)} to go", flush=True)

    spark = get_spark(app_name="scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = open(args.out, "a") if args.out else None
    offenders: list[tuple[str, float]] = []
    errors: list[tuple[str, str]] = []
    print(f"# sweeping {len(names)} entries: base={args.base} scaled={args.scaled} "
          f"reps={args.reps} gate<={args.gate}x", flush=True)
    for i, name in enumerate(names, 1):
        try:
            t_base, r_base, w_base = time_one(spark, name, args.base, args.reps)
            t_scaled, r_scaled, w_scaled = time_one(spark, name, args.scaled, args.reps)
        except Exception as exc:  # noqa: BLE001 — record and keep sweeping
            msg = str(exc).splitlines()[0][:200]
            errors.append((name, msg))
            print(f"[{i}/{len(names)}] {name}: ERROR {msg}", flush=True)
            continue
        finally:
            # entries are independent — drop blocks persisted inside query
            # builds (e.g. k18) between entries (reps stay warm within one)
            spark.catalog.clearCache()
        ratio = t_scaled / t_base if t_base > 0 else float("inf")
        rec = {"name": name, "base_sec": round(t_base, 3),
               "scaled_sec": round(t_scaled, 3), "ratio": round(ratio, 2),
               "rows_base": r_base, "rows_scaled": r_scaled,
               "reps_base_sec": [round(w, 3) for w in w_base],
               "reps_scaled_sec": [round(w, 3) for w in w_scaled]}
        if out:
            out.write(json.dumps(rec) + "\n")
            out.flush()
        flag = "  <-- OVER GATE" if ratio > args.gate else ""
        print(f"[{i}/{len(names)}] {name}: {t_base:.2f}s -> {t_scaled:.2f}s "
              f"({ratio:.1f}x, rows {r_base} -> {r_scaled}){flag}", flush=True)
        if ratio > args.gate:
            offenders.append((name, ratio))
    if out:
        out.close()
    print(f"\n== {len(names) - len(offenders) - len(errors)} inside gate, "
          f"{len(offenders)} over, {len(errors)} errors (of {len(names)}) ==")
    for name, ratio in sorted(offenders, key=lambda x: -x[1]):
        print(f"  OVER: {name} {ratio:.1f}x")
    for name, msg in errors:
        print(f"  ERR:  {name} {msg}")
    return 1 if offenders or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
