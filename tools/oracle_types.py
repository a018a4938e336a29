"""Sweep every registered DuckDB oracle's *result column types*.

Round-4 verdict root-caused ALL driver hash-fails to oracle output
columns DuckDB types as HUGEINT (``SUM(BIGINT)`` → int128): the
driver's pandas/Arrow fetch renders HUGEINT as float64 (``160.0``)
while Spark emits BIGINT (``160``), so the value-hash mismatches even
though ``fetchall()``-based local parity sees plain ints and passes.

This tool binds the oracle side to the proven-safe type set. Keep in
sync with ``tests/test_contract.py`` (Spark-side ban) — the two
together close the verification gap VERDICT.md r4 #2 describes.

Usage:
    python tools/oracle_types.py [--sf /root/testdata/sf0.001]
Exit 0 iff no oracle emits a banned type; prints offenders as
``name: col -> TYPE``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from upc_sku_data_loader_spark import plans  # noqa: F401,E402
from upc_sku_data_loader_spark.registry import ORACLES  # noqa: E402

# Types the driver's fetch path has proven to round-trip bit-exactly
# against Spark (CORRECTNESS_r01..r04 green entries all stay inside
# this set). Everything else — HUGEINT/UHUGEINT (int128→float64),
# DECIMAL (r1 b2_cast fail), UINTEGER/UBIGINT (unexercised unsigned),
# LIST/STRUCT/MAP/BLOB — is banned at the oracle output edge.
SAFE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE",
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS",
}


def sweep(sf_dir: str) -> list[tuple[str, str, str]]:
    from tools.parity import duck_connect

    con = duck_connect(sf_dir)
    bad: list[tuple[str, str, str]] = []
    for name, sql in sorted(ORACLES.items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) not in SAFE:
                bad.append((name, col, str(typ)))
    return bad


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    offenders = sweep(args.sf)
    for name, col, typ in offenders:
        print(f"{name}: {col} -> {typ}")
    print(
        f"{len(offenders)} banned-type columns in "
        f"{len(set(n for n, _, _ in offenders))} offending oracles "
        f"({len(ORACLES)} swept)"
    )
    sys.exit(1 if offenders else 0)
