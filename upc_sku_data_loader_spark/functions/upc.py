"""UPC / GTIN column functions — the reference repo's namesake domain.

The reference normalizes UPC strings before keying MySQL rows on them
(SURVEY §2 B9/B10 [R-core]; reference file:line n/a — empty tree §0.1).
Everything here is pure column arithmetic (whole-stage-codegen'd JVM
expressions, no UDF), so it vectorizes at any scale, and each builder
has a DuckDB-SQL twin generator so the oracle can mirror it exactly.

GTIN check digit (public GS1 spec): for an N-digit code, from the
RIGHTMOST digit of the body leftwards, weights alternate 3,1,3,1…;
check = (10 - sum % 10) % 10.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def upc_normalize(col: Column | str, width: int = 13) -> Column:
    """Strip non-digits, left-pad with zeros to GTIN width."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(F.regexp_replace(c, "[^0-9]", ""), width, "0")


def upc_normalize_sql(expr: str, width: int = 13) -> str:
    return f"lpad(regexp_replace({expr}, '[^0-9]', '', 'g'), {width}, '0')"


def gtin_check_digit(body: Column | str, body_len: int = 12) -> Column:
    """Check digit for a zero-padded numeric string of ``body_len`` digits."""
    c = F.col(body) if isinstance(body, str) else body
    total: Column = F.lit(0)
    for i in range(1, body_len + 1):  # i = 1-based position from the left
        # position from the right (1-based): body_len - i + 1 → weight 3 if odd
        weight = 3 if (body_len - i + 1) % 2 == 1 else 1
        total = total + F.substring(c, i, 1).cast("int") * F.lit(weight)
    return (10 - (total % 10)) % 10


def gtin_check_digit_sql(expr: str, body_len: int = 12) -> str:
    terms = []
    for i in range(1, body_len + 1):
        weight = 3 if (body_len - i + 1) % 2 == 1 else 1
        terms.append(f"CAST(substring({expr}, {i}, 1) AS INT) * {weight}")
    return f"(10 - ((({' + '.join(terms)}) ) % 10)) % 10"


def synth_raw_upc(key: Column | str) -> Column:
    """Deterministic messy UPC string from an integer key (test fixture
    generator: the fixtures carry no UPC column, so queries synthesize
    one the same way on both engines).

    The key is reduced mod 1000003 BEFORE the Knuth-constant multiply
    (fuzz sweep, seed 7): a snowflake-regime key (~2^62) times the
    32-bit constant overflows int64 — an ANSI ARITHMETIC_OVERFLOW on
    Spark, a BIGINT error on DuckDB.  1e6 * 2654435761 ~ 2.7e15 stays
    comfortably inside, and a million distinct synthetic UPCs is ample
    spread for fixture synthesis.

    Collision caveat (engine-identical, so never a parity issue): keys
    congruent mod 1000003 synthesize the SAME UPC, so any dedup/upsert
    keyed on the synthetic UPC (etl_load_upcs) changes cardinality once
    a fixture carries >= 1000003 distinct part keys (~sf>=10)."""
    k = F.col(key) if isinstance(key, str) else key
    d = F.lpad(
        ((k % 1000003) * 2654435761 % 1000000000000).cast("string"), 12, "0"
    )
    return F.concat(F.substring(d, 1, 4), F.lit("-"), F.substring(d, 5, 8))


def synth_raw_upc_sql(expr: str) -> str:
    return (
        "concat(substring(lpad(CAST((({e} % 1000003) * 2654435761)"
        " % 1000000000000 AS VARCHAR), 12, '0'), 1, 4),"
        " '-',"
        " substring(lpad(CAST((({e} % 1000003) * 2654435761)"
        " % 1000000000000 AS VARCHAR), 12, '0'), 5, 8))"
    ).format(e=expr)
