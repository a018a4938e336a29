"""§2.B Projections / filters / predicates (SURVEY.md §2.B; reference
file:line n/a — empty tree §0.1; reconstructed surface = JSON field
extraction + UPC normalization before MySQL load [R]).

Scale note: every predicate here is a plain Catalyst expression, so it
reaches the parquet scan as a pushed filter (row-group/page skipping)
and the select-list prunes the read schema — verified via
``.explain`` (PushedFilters / ReadSchema) in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.upc import (
    gtin_check_digit,
    gtin_check_digit_sql,
    synth_raw_upc,
    synth_raw_upc_sql,
    upc_normalize,
    upc_normalize_sql,
)
from ..registry import query

# --- B1: projection / rename / derived columns ----------------------------


@query(
    "b1_project",
    oracle="""
    SELECT p_partkey AS part_id,
           upper(p_name) AS name_upper,
           p_retailprice * 1.1 AS list_price,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS retail_cents
    FROM part
    """,
)
def b1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.upper("p_name").alias("name_upper"),
        (F.col("p_retailprice") * 1.1).alias("list_price"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("retail_cents"),
    )


# --- B2: casts -------------------------------------------------------------


@query(
    "b2_cast",
    # The DECIMAL(12,2) cast stays the operator under test, but the value is
    # surfaced as DOUBLE on both sides: Spark renders Decimal('x.60') while
    # DuckDB's pandas client yields float 'x.6', so a raw decimal column
    # hash-mismatches on representation despite identical values (r1 verdict).
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_custkey AS VARCHAR) AS custkey_str,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_floor
    FROM orders
    """,
)
def b2_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_custkey").cast("string").alias("custkey_str"),
        F.col("o_totalprice").cast("bigint").alias("price_floor"),
    )


# --- B3: comparison predicates ---------------------------------------------


@query(
    "b3_filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45.0
      AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_extendedprice < 40000.0
    """,
)
def b3_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45.0)
        & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        & (F.col("l_extendedprice") < 40000.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# --- B4: boolean composition -----------------------------------------------


@query(
    "b4_filter_bool",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_orderpriority = '1-URGENT')
      AND NOT (o_totalprice < 1000.0)
    """,
)
def b4_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_orderpriority") == "1-URGENT"))
        & ~(F.col("o_totalprice") < 1000.0)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


# --- B5: IN-list membership -------------------------------------------------


@query(
    "b5_filter_in",
    oracle="""
    SELECT p_partkey, p_brand, p_type
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#17')
      AND p_type NOT IN ('PROMO')
    """,
)
def b5_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#17")
        & ~F.col("p_type").isin("PROMO")
    ).select("p_partkey", "p_brand", "p_type")


# --- B6: BETWEEN range predicate --------------------------------------------


@query(
    "b6_filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount, l_shipdate
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
    """,
)
def b6_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07)
        & F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1996-12-31").cast("timestamp_ntz"),
        )
    ).select("l_orderkey", "l_linenumber", "l_discount", "l_shipdate")


# --- B7: LIKE / regexp pattern match ----------------------------------------


@query(
    "b7_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%widget%'
       OR regexp_matches(p_name, '^(red|blue) (bolt|gear)$')
    """,
)
def b7_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%")
        | F.col("p_name").rlike("^(red|blue) (bolt|gear)$")
    ).select("p_partkey", "p_name", "p_brand")


# --- B8: null handling (fixtures are null-free → engineer nulls with NULLIF) -


@query(
    "b8_filter_null",
    oracle="""
    WITH w AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'P') AS status_or_null,
             o_totalprice
      FROM orders
    )
    SELECT COUNT(*) AS n_total,
           COUNT(status_or_null) AS n_not_null,
           CAST(SUM(CASE WHEN status_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(CASE WHEN status_or_null IS NOT NULL THEN 1 END) AS n_via_isnotnull
    FROM w
    """,
)
def b8_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    )
    return w.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("status_or_null").alias("n_not_null"),
        F.sum(F.when(F.col("status_or_null").isNull(), 1).otherwise(0)).alias("n_null"),
        F.count(F.when(F.col("status_or_null").isNotNull(), 1)).alias("n_via_isnotnull"),
    )


# --- B9: UPC normalization (the reference's namesake transform) --------------


@query(
    "b9_upc_normalize",
    oracle=f"""
    SELECT p_partkey,
           {synth_raw_upc_sql('p_partkey')} AS raw_upc,
           {upc_normalize_sql(synth_raw_upc_sql('p_partkey'), 13)} AS upc13,
           {upc_normalize_sql(synth_raw_upc_sql('p_partkey'), 14)} AS gtin14
    FROM part
    """,
)
def b9_upc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    raw = synth_raw_upc("p_partkey")
    return p.select(
        "p_partkey",
        raw.alias("raw_upc"),
        upc_normalize(raw, 13).alias("upc13"),
        upc_normalize(raw, 14).alias("gtin14"),
    )


# --- B10: GTIN check-digit validation (pure column arithmetic, no UDF) -------


@query(
    "b10_upc_check_digit",
    oracle=f"""
    WITH u AS (
      SELECT p_partkey,
             {upc_normalize_sql(synth_raw_upc_sql('p_partkey'), 13)} AS upc13
      FROM part
    )
    SELECT p_partkey,
           upc13,
           {gtin_check_digit_sql("substring(upc13, 1, 12)", 12)} AS check_digit,
           CAST({gtin_check_digit_sql("substring(upc13, 1, 12)", 12)} =
                CAST(substring(upc13, 13, 1) AS INT) AS BOOLEAN) AS is_valid
    FROM u
    """,
)
def b10_upc_check_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    u = p.select(
        "p_partkey", upc_normalize(synth_raw_upc("p_partkey"), 13).alias("upc13")
    )
    body = F.substring("upc13", 1, 12)
    check = gtin_check_digit(body, 12)
    return u.select(
        "p_partkey",
        "upc13",
        check.alias("check_digit"),
        (check == F.substring("upc13", 13, 1).cast("int")).alias("is_valid"),
    )


# --- B11: validate-and-quarantine split (single-pass row triage) --------------


@query(
    "b11_validate_quarantine",
    oracle="""
    WITH t AS (
      SELECT lpad(CAST(p_partkey AS VARCHAR), 12, '0') AS upc,
             p_retailprice,
             p_size
      FROM part
    )
    SELECT upc, p_retailprice, p_size,
           CASE
             WHEN p_retailprice <= 0 THEN 'bad_price'
             WHEN p_size < 1 OR p_size > 50 THEN 'bad_size'
             WHEN length(upc) <> 12 THEN 'bad_upc'
             ELSE 'ok'
           END AS status,
           CASE
             WHEN p_retailprice <= 0 THEN 'price must be positive'
             WHEN p_size < 1 OR p_size > 50 THEN 'size out of [1,50]'
             WHEN length(upc) <> 12 THEN 'upc must be 12 digits'
             ELSE NULL
           END AS reason
    FROM t
    """,
)
def b11_validate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row triage in one pass: every record tagged valid/quarantined
    with a machine-readable reason — the load-path pattern where bad
    rows go to a quarantine sink instead of poisoning the batch (the
    first failing rule wins, so reasons are deterministic).  A
    downstream writer would `partitionBy('status')` to split sinks with
    zero extra passes.  Pure CASE expressions, map-only."""
    t = load(spark, sf_dir, "part").select(
        F.lpad(F.col("p_partkey").cast("string"), 12, "0").alias("upc"),
        "p_retailprice",
        "p_size",
    )
    status = (
        F.when(F.col("p_retailprice") <= 0, "bad_price")
        .when((F.col("p_size") < 1) | (F.col("p_size") > 50), "bad_size")
        .when(F.length("upc") != 12, "bad_upc")
        .otherwise("ok")
    )
    reason = (
        F.when(F.col("p_retailprice") <= 0, "price must be positive")
        .when((F.col("p_size") < 1) | (F.col("p_size") > 50), "size out of [1,50]")
        .when(F.length("upc") != 12, "upc must be 12 digits")
        .otherwise(F.lit(None).cast("string"))
    )
    return t.select("upc", "p_retailprice", "p_size", status.alias("status"), reason.alias("reason"))


# --- B12: column statistics profiler ------------------------------------------


@query(
    "b12_column_profile",
    # One row per profiled column: null count, distinct count, min/max
    # rendered through printf so both engines canonicalize doubles and
    # timestamps identically (CAST(double AS VARCHAR) diverges between
    # Java's Double.toString and DuckDB's formatter).
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           printf('%.2f', ROUND(MIN(o_totalprice), 2)),
           printf('%.2f', ROUND(MAX(o_totalprice), 2))
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def b12_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass (deequ/Great-Expectations style): per-column
    null count, distinct count, and canonical min/max over `orders`,
    emitted as one row per column.  The whole profile is ONE aggregate
    over ONE scan — Spark plans the multiple COUNT(DISTINCT)s as a
    single Expand + two-level hash aggregate, so adding columns widens
    the row, it does not add passes.  Doubles are ROUND-ed to 2 dp
    BEFORE printf-style formatting: Java's Formatter is HALF_UP while
    DuckDB printf is round-half-even on the exact binary value, so
    formatting a raw midpoint (0.125) would diverge — formatting an
    already-rounded value cannot."""
    o = load(spark, sf_dir, "orders")
    prof = o.agg(
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("string").alias("mn_key"),
        F.max("o_orderkey").cast("string").alias("mx_key"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        # null-guard: Java's Formatter renders %.2f of NULL as the string
        # "null" (precision-truncated to "nu") while DuckDB printf gives
        # NULL — empty input must profile as NULL min/max on both engines
        F.when(
            F.min("o_totalprice").isNotNull(),
            F.format_string("%.2f", F.round(F.min("o_totalprice"), 2)),
        ).alias("mn_price"),
        F.when(
            F.max("o_totalprice").isNotNull(),
            F.format_string("%.2f", F.round(F.max("o_totalprice"), 2)),
        ).alias("mx_price"),
        (F.count(F.lit(1)) - F.count("o_orderdate")).alias("nn_date"),
        F.countDistinct("o_orderdate").alias("nd_date"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("mn_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("mx_date"),
        (F.count(F.lit(1)) - F.count("o_orderpriority")).alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").alias("mn_prio"),
        F.max("o_orderpriority").alias("mx_prio"),
    )
    return prof.select(
        F.expr(
            "stack(5,"
            " 'o_orderkey', nn_key, nd_key, mn_key, mx_key,"
            " 'o_custkey', nn_cust, nd_cust, mn_cust, mx_cust,"
            " 'o_totalprice', nn_price, nd_price, mn_price, mx_price,"
            " 'o_orderdate', nn_date, nd_date, mn_date, mx_date,"
            " 'o_orderpriority', nn_prio, nd_prio, mn_prio, mx_prio)"
            " AS (col_name, n_nulls, n_distinct, min_repr, max_repr)"
        )
    )


# --- B13: GTIN family conversion (UPC-A → EAN-13 → GTIN-14 case code) ---------


@query(
    "b13_gtin_convert",
    oracle=f"""
    WITH base AS (
      SELECT p_partkey,
             substring({upc_normalize_sql(synth_raw_upc_sql('p_partkey'), 12)},
                       1, 11) AS body11
      FROM part
    ),
    built AS (
      SELECT p_partkey, body11,
             body11 || CAST({gtin_check_digit_sql('body11', 11)} AS VARCHAR)
               AS upc_a
      FROM base
    ),
    cased AS (
      SELECT p_partkey, upc_a,
             '0' || upc_a AS ean13,
             '1' || '0' || body11 AS body13
      FROM built
    )
    SELECT p_partkey, upc_a, ean13,
           body13 || CAST({gtin_check_digit_sql('body13', 13)} AS VARCHAR)
             AS gtin14_case
    FROM cased
    """,
)
def b13_gtin_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GTIN family conversion, the namesake domain op: rebuild a valid
    UPC-A from the 11-digit body (recomputed mod-10 check digit),
    extend to EAN-13 by leading zero (check digit provably unchanged —
    GS1 weights count from the RIGHT, so a leading 0 adds 0×weight),
    and derive the GTIN-14 case code with packaging-indicator digit 1,
    whose check digit MUST be recomputed (the indicator shifts every
    weight).  Pure codegen'd column arithmetic — no UDF, map-only."""
    body11 = F.substring(upc_normalize(synth_raw_upc("p_partkey"), 12), 1, 11)
    p = load(spark, sf_dir, "part").select("p_partkey", body11.alias("body11"))
    upc_a = F.concat(
        F.col("body11"), gtin_check_digit("body11", 11).cast("string")
    )
    built = p.select("p_partkey", "body11", upc_a.alias("upc_a"))
    body13 = F.concat(F.lit("10"), F.col("body11"))
    return built.select(
        "p_partkey",
        "upc_a",
        F.concat(F.lit("0"), F.col("upc_a")).alias("ean13"),
        F.concat(
            body13, gtin_check_digit(body13, 13).cast("string")
        ).alias("gtin14_case"),
    )


# --- B14: sentinel-value normalization ----------------------------------------
# Real feeds encode "missing" a dozen ways ('', 'N/A', 'NULL', '-',
# whitespace padding) and none of them is SQL NULL; every aggregate,
# join, and distinct over such a column silently fragments.  The
# fixture column is clean, so the op first plants the sentinels
# deterministically (doc_id mod 7 — identical on both engines), then
# normalizes: TRIM, case-insensitive sentinel→NULL, and reports the
# rescue accounting a data-quality dashboard shows.


@query(
    "b14_sentinel_normalize",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             CASE doc_id % 7
               WHEN 0 THEN ''
               WHEN 1 THEN 'N/A'
               WHEN 2 THEN 'NULL'
               WHEN 3 THEN ' ' || source || ' '
               ELSE source
             END AS raw
      FROM documents
    ),
    norm AS (
      SELECT doc_id, raw,
             CASE WHEN trim(raw) = '' OR upper(trim(raw)) IN ('N/A', 'NULL', '-')
                  THEN NULL ELSE trim(raw) END AS source_norm
      FROM planted
    )
    SELECT COALESCE(source_norm, '∅NULL') AS source_norm,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN source_norm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulled,
           CAST(SUM(CASE WHEN source_norm IS NOT NULL AND raw <> source_norm
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed
    FROM norm
    GROUP BY 1
    """,
)
def b14_sentinel_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel-value normalization: TRIM + case-insensitive mapping of
    the missing-data zoo ('', 'N/A', 'NULL', '-') to real SQL NULL,
    with rescue accounting (how many rows were nulled vs merely
    de-padded) per surviving value — the cleanup without which
    aggregates and joins fragment into phantom groups.

    Map-only scan + one keyed agg; the sentinel set is a fixed literal
    list (whole-stage codegen, no UDF).  The planted-junk construction
    is part of the contract so both engines clean identical input.
    """
    d = load(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 7 == 0, F.lit(""))
        .when(F.col("doc_id") % 7 == 1, F.lit("N/A"))
        .when(F.col("doc_id") % 7 == 2, F.lit("NULL"))
        .when(
            F.col("doc_id") % 7 == 3,
            F.concat(F.lit(" "), F.col("source"), F.lit(" ")),
        )
        .otherwise(F.col("source"))
    )
    planted = d.select("doc_id", raw.alias("raw"))
    trimmed = F.trim(F.col("raw"))
    norm = planted.withColumn(
        "source_norm",
        F.when(
            (trimmed == "")
            | F.upper(trimmed).isin("N/A", "NULL", "-"),
            None,
        ).otherwise(trimmed),
    )
    return norm.groupBy(
        F.coalesce(F.col("source_norm"), F.lit("∅NULL")).alias("source_norm")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("source_norm").isNull(), 1).otherwise(0)
        ).alias("n_nulled"),
        F.sum(
            F.when(
                F.col("source_norm").isNotNull()
                & (F.col("raw") != F.col("source_norm")),
                1,
            ).otherwise(0)
        ).alias("n_trimmed"),
    )


# --- B16: GS1 prefix → issuing-region lookup (broadcast range join) -----------

# Real GS1 prefix allocations (subset; ranges inclusive).  The literal
# table is the shared contract — same VALUES list on both engines.
_GS1_RANGES = [
    (0, 19, "US & Canada (UPC-A compat)"),
    (30, 39, "US drugs (NDC)"),
    (300, 379, "France & Monaco"),
    (400, 440, "Germany"),
    (450, 459, "Japan"),
    (490, 499, "Japan"),
    (500, 509, "UK"),
    (690, 699, "China"),
    (754, 755, "Canada"),
    (880, 881, "South Korea"),
    (930, 939, "Australia"),
]
_GS1_VALUES_SQL = ", ".join(f"({lo}, {hi}, '{r}')" for lo, hi, r in _GS1_RANGES)


@query(
    "b16_gs1_prefix_lookup",
    oracle=f"""
    WITH upcs AS (
      SELECT p_partkey,
             {upc_normalize_sql(synth_raw_upc_sql("p_partkey"), 13)} AS gtin13
      FROM part
    ),
    gs1(lo, hi, region) AS (VALUES {_GS1_VALUES_SQL}),
    pref AS (
      SELECT p_partkey, gtin13,
             CAST(substring(gtin13, 1, 3) AS INT) AS gs1_prefix
      FROM upcs
    )
    SELECT p.p_partkey, p.gtin13, p.gs1_prefix,
           COALESCE(g.region, 'unassigned') AS issuing_region
    FROM pref p
    LEFT JOIN gs1 g ON p.gs1_prefix BETWEEN g.lo AND g.hi
    """,
)
def b16_gs1_prefix_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GS1 prefix → issuing-region classification: the first three
    digits of a GTIN-13 identify the issuing GS1 member organization
    (the table here is the real allocation list, subset).  The lookup
    is a RANGE predicate (`prefix BETWEEN lo AND hi`), not an equi-key
    — the textbook case for a BROADCAST non-equi join: the dim is a
    dozen rows, so the range probe is a broadcast nested-loop over a
    constant-size side, map-only at any fact scale (the alternative,
    exploding every range to its member keys, works here but dies on
    wide ranges).

    Prov: GS1 company-prefix list (public standard); the UPC synthesis
    and 13-digit normalization are B9's own helpers, so this composes
    the namesake transform with its downstream enrichment."""
    upcs = load(spark, sf_dir, "part").select(
        "p_partkey",
        upc_normalize(synth_raw_upc("p_partkey"), 13).alias("gtin13"),
    )
    pref = upcs.withColumn(
        "gs1_prefix", F.substring("gtin13", 1, 3).cast("int")
    )
    gs1 = F.broadcast(
        load(spark, sf_dir, "part")
        .sparkSession.createDataFrame(_GS1_RANGES, "lo int, hi int, region string")
    )
    return (
        pref.join(
            gs1,
            (F.col("gs1_prefix") >= F.col("lo"))
            & (F.col("gs1_prefix") <= F.col("hi")),
            "left",
        )
        .select(
            "p_partkey",
            "gtin13",
            "gs1_prefix",
            F.coalesce("region", F.lit("unassigned")).alias("issuing_region"),
        )
    )


# --- B17: UPC-E → UPC-A expansion ---------------------------------------------

# GS1 zero-suppression inverse: UPC-E data digits D1..D6 expand to the
# UPC-A 10-digit body by the last-digit rule —
#   D6 ∈ {0,1,2}: D1 D2 D6 0 0 | 0 0 D3 D4 D5
#   D6 = 3:       D1 D2 D3 0 0 | 0 0 0 D4 D5
#   D6 = 4:       D1 D2 D3 D4 0 | 0 0 0 0 D5
#   D6 ∈ {5..9}:  D1 D2 D3 D4 D5 | 0 0 0 0 D6
# with number system 0 prepended and a freshly computed GS1 check digit.

_B17_BODY_SQL = """
CASE
  WHEN substring(upce, 6, 1) IN ('0','1','2') THEN
    substring(upce, 1, 2) || substring(upce, 6, 1) || '0000'
      || substring(upce, 3, 3)
  WHEN substring(upce, 6, 1) = '3' THEN
    substring(upce, 1, 3) || '00' || '000' || substring(upce, 4, 2)
  WHEN substring(upce, 6, 1) = '4' THEN
    substring(upce, 1, 4) || '0' || '0000' || substring(upce, 5, 1)
  ELSE
    substring(upce, 1, 5) || '0000' || substring(upce, 6, 1)
END
"""


@query(
    "b17_upce_expand",
    oracle=f"""
    WITH src AS (
      SELECT p_partkey,
             lpad(CAST(((p_partkey % 1000003) * 48271) % 1000000 AS VARCHAR), 6, '0')
               AS upce
      FROM part
    ),
    body AS (
      SELECT p_partkey, upce,
             '0' || {_B17_BODY_SQL.strip()} AS upca_body
      FROM src
    )
    SELECT p_partkey, upce,
           upca_body || CAST({gtin_check_digit_sql('upca_body', 11)} AS VARCHAR)
             AS upca,
           substring(upce, 6, 1) AS suppression_class
    FROM body
    """,
)
def b17_upce_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPC-E (8-digit zero-suppressed) → UPC-A (12-digit) expansion —
    the GS1 decompression every POS/catalog ingest runs before keying
    on the full UPC (the reference's namesake domain, alongside
    b9/b10/b13/b16).  The fixtures carry no UPC-E column, so a
    deterministic 6-digit code is synthesized from p_partkey (same
    arithmetic both engines, the b9 pattern), expanded by the
    last-digit rule, prefixed with number system 0, and finished with
    a recomputed GS1 check digit (functions/upc.py helper + its SQL
    twin).  Pure CASE/substring column expressions — map-only,
    whole-stage-codegen'd, scale-free.
    """
    p = load(spark, sf_dir, "part")
    src = p.select(
        "p_partkey",
        F.lpad(((F.col("p_partkey") % 1000003) * 48271 % 1000000).cast("string"), 6, "0")
        .alias("upce"),
    )
    d = lambda i, n=1: F.substring("upce", i, n)  # noqa: E731
    body6 = (
        F.when(
            d(6).isin("0", "1", "2"),
            F.concat(d(1, 2), d(6), F.lit("0000"), d(3, 3)),
        )
        .when(d(6) == "3", F.concat(d(1, 3), F.lit("00000"), d(4, 2)))
        .when(d(6) == "4", F.concat(d(1, 4), F.lit("00000"), d(5, 1)))
        .otherwise(F.concat(d(1, 5), F.lit("0000"), d(6)))
    )
    body = src.withColumn("upca_body", F.concat(F.lit("0"), body6))
    return body.select(
        "p_partkey",
        "upce",
        F.concat(
            F.col("upca_body"),
            gtin_check_digit("upca_body", 11).cast("string"),
        ).alias("upca"),
        F.substring("upce", 6, 1).alias("suppression_class"),
    )


# --- B18: ISBN-10 ↔ ISBN-13 (Bookland EAN) conversion -------------------------


@query(
    "b18_isbn_convert",
    oracle=f"""
    WITH src AS (
      SELECT p_partkey,
             lpad(CAST(((p_partkey % 1000003) * 37117) % 1000000000 AS VARCHAR), 9, '0')
               AS body9
      FROM part
    ),
    ten AS (
      SELECT p_partkey, body9,
             (11 - ((CAST(substring(body9, 1, 1) AS INT) * 10
                   + CAST(substring(body9, 2, 1) AS INT) * 9
                   + CAST(substring(body9, 3, 1) AS INT) * 8
                   + CAST(substring(body9, 4, 1) AS INT) * 7
                   + CAST(substring(body9, 5, 1) AS INT) * 6
                   + CAST(substring(body9, 6, 1) AS INT) * 5
                   + CAST(substring(body9, 7, 1) AS INT) * 4
                   + CAST(substring(body9, 8, 1) AS INT) * 3
                   + CAST(substring(body9, 9, 1) AS INT) * 2) % 11)) % 11
               AS cd10
      FROM src
    ),
    thirteen AS (
      SELECT p_partkey, body9, cd10,
             '978' || body9 AS body12
      FROM ten
    )
    SELECT p_partkey,
           body9 || CASE WHEN cd10 = 10 THEN 'X'
                         ELSE CAST(cd10 AS VARCHAR) END AS isbn10,
           body12 || CAST({gtin_check_digit_sql('body12', 12)} AS VARCHAR)
             AS isbn13
    FROM thirteen
    """,
)
def b18_isbn_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISBN-10 → ISBN-13 (Bookland EAN) conversion — the sibling codec
    to the UPC family (b9/b10/b13/b17): a 9-digit registration body
    takes a mod-11 check digit (10 rendered as 'X') for ISBN-10, and
    the same body prefixed '978' takes the standard GS1 mod-10 check
    for ISBN-13 — the exact transformation bibliographic feeds apply
    at ingest.  Bodies are synthesized deterministically from
    p_partkey (the b9 pattern).  The mod-11 weighted sum is spelled
    out positionally (9 fixed terms — whole-stage-codegen'd integer
    math), the EAN check reuses functions/upc.py's shared twin.
    Map-only, scale-free.
    """
    p = load(spark, sf_dir, "part")
    src = p.select(
        "p_partkey",
        F.lpad(
            ((F.col("p_partkey") % 1000003) * 37117 % 1000000000).cast("string"), 9, "0"
        ).alias("body9"),
    )
    wsum = sum(
        (
            F.substring("body9", i, 1).cast("int") * (11 - i)
            for i in range(1, 10)
        ),
        F.lit(0),
    )
    cd10 = (11 - (wsum % 11)) % 11
    body12 = F.concat(F.lit("978"), F.col("body9"))
    return src.select(
        "p_partkey",
        F.concat(
            F.col("body9"),
            F.when(cd10 == 10, "X").otherwise(cd10.cast("string")),
        ).alias("isbn10"),
        F.concat(
            body12, gtin_check_digit(body12, 12).cast("string")
        ).alias("isbn13"),
    )
