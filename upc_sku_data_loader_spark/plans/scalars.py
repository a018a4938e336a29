"""§2.H Scalar function surface (SURVEY.md §2.H; reference file:line n/a —
empty tree §0.1; the reference's scalar work is JSON field extraction +
string cleanup before MySQL load [R]).

Each query exercises a function family over a fixture table with a
unique key in the output, so the driver's order-insensitive hash pins
every value.  All functions are built-in Catalyst expressions (JVM
codegen, no Python) — the 100 TB path is "never leave the JVM for a
scalar".

Cross-engine alignment notes (probed, 2026-08-13):
- DuckDB has no ``initcap``; Spark's is skipped in oracle-checked output.
- Day-of-week: DuckDB ``isodow`` (Mon=1..Sun=7) == Spark ``weekday()+1``.
- DuckDB ``ceil(double)`` returns DOUBLE (Spark: LONG) → cast in SQL.
- DuckDB ``regexp_replace`` replaces the first match unless 'g'.
- DuckDB map extraction returns a LIST → ``m['k'][1]``.
- ``exp``/``sqrt``/``pow`` may differ in the last ULP across libm
  implementations → ROUND(_, 6) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# --- H1: string basics --------------------------------------------------------


@query(
    "h1_string_basics",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_brand) AS lo,
           -- || not concat(): DuckDB's concat() SKIPS NULL arguments
           -- while Spark's concat is NULL-propagating (--nulls sweep)
           trim('  ' || p_name || '  ') AS trimmed,
           lpad(p_brand, 12, '*') AS lpadded,
           rpad(p_brand, 12, '-') AS rpadded,
           substring(p_name, 2, 5) AS sub25,
           length(p_name) AS name_len,
           replace(p_name, ' ', '_') AS replaced,
           concat_ws('|', p_brand, p_type) AS joined,
           reverse(p_name) AS rev,
           instr(p_name, 'e') AS e_pos,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3,
           translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
           repeat(p_brand, 2) AS brand2x
    FROM part
    """,
)
def h1_string_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_brand", 12, "-").alias("rpadded"),
        F.substring("p_name", 2, 5).alias("sub25"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("replaced"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.reverse("p_name").alias("rev"),
        F.instr("p_name", "e").cast("bigint").alias("e_pos"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.repeat("p_brand", 2).alias("brand2x"),
    )


# --- H2: regular expressions ----------------------------------------------------


@query(
    "h2_string_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+) ', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '.', 'g') AS devoweled,
           regexp_matches(p_name, '(widget|gear)$') AS is_widget_or_gear,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    """,
)
def h2_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+) ", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", ".").alias("devoweled"),
        F.col("p_name").rlike(r"(widget|gear)$").alias("is_widget_or_gear"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


# --- H3: string distance (fuzzy brand/description matching [X]) ------------------


@query(
    "h3_string_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, replace(p_name, 'e', 'a')) AS lev_ea,
           levenshtein(p_brand, 'Brand#1') AS lev_to_b1
    FROM part
    """,
)
def h3_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(
            F.col("p_name"), F.replace(F.col("p_name"), F.lit("e"), F.lit("a"))
        ).cast("bigint").alias("lev_ea"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).cast("bigint").alias("lev_to_b1"),
    )


# --- H4: date/time functions ------------------------------------------------------


@query(
    "h4_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
           (year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1) AS months_since_95,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000) AS ts_roundtrip
    FROM orders
    """,
)
def h4_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    epoch_s = F.expr("unix_seconds(cast(o_orderdate as timestamp))")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
        ((F.year("o_orderdate") - 1995) * 12 + (F.month("o_orderdate") - 1)).alias(
            "months_since_95"
        ),
        epoch_s.alias("epoch_s"),
        F.expr(
            "cast(timestamp_seconds(unix_seconds(cast(o_orderdate as timestamp))) as timestamp_ntz)"
        ).alias("ts_roundtrip"),
    )


# --- H5: math -----------------------------------------------------------------------


@query(
    "h5_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor7,
           ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
           ROUND(pow(1.0 + l_discount, 3), 6) AS disc_cube,
           ROUND(exp(l_discount), 6) AS disc_exp,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(log(l_extendedprice), 6) AS price_log10,
           CAST(((CAST(l_quantity AS BIGINT) - 26) % 7 + 7) % 7 AS BIGINT) AS qty_pmod7,
           CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem
    """,
)
def h5_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_floor7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 3), 6).alias("disc_cube"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.pmod(F.col("l_quantity").cast("bigint") - 26, F.lit(7)).cast("bigint").alias(
            "qty_pmod7"
        ),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


# --- H6: conditionals ------------------------------------------------------------------


@query(
    "h6_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 8000 THEN 'mid'
                ELSE 'high' END AS bal_tier,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           NULLIF(c_nationkey, 0) AS nation_or_null,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 9999.0) AS bal_cap
    FROM customer
    """,
)
def h6_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.nullif("c_nationkey", F.lit(0)).alias("nation_or_null"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(9999.0)).alias("bal_cap"),
    )


# --- H7: arrays + higher-order functions -------------------------------------------------


@query(
    "h7_array_hof",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           list_contains(toks, 'the') AS has_the,
           array_to_string(list_sort(toks[1:3]), ',') AS first3_sorted,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long,
           len(list_filter(toks, x -> x[1:1] = 's')) > 0 AS any_s_word,
           array_to_string(flatten([toks[1:2], toks[3:4]]), ',') AS spliced
    FROM t
    """,
)
# first3_sorted / spliced are array_join-serialized: the driver's
# canonicalizer cannot hash ArrayType output cells (r1 verdict).
def h7_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.array_contains("toks", "the").alias("has_the"),
        F.array_join(F.array_sort(F.slice("toks", 1, 3)), ",").alias("first3_sorted"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.exists("toks", lambda x: x.startswith("s")).alias("any_s_word"),
        F.array_join(
            F.flatten(F.array(F.slice("toks", 1, 2), F.slice("toks", 3, 2))), ","
        ).alias("spliced"),
    )


# --- H8: maps -----------------------------------------------------------------------------


@query(
    "h8_map",
    oracle="""
    WITH t AS (
      SELECT event_id,
             map(['et', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
      FROM events
    )
    SELECT event_id,
           m['et'][1] AS et_val,
           m['uid'][1] AS uid_val,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           CAST(cardinality(m) AS INT) AS m_size
    FROM t
    """,
)
def h8_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        F.create_map(
            F.lit("et"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
        ).alias("m"),
    )
    return t.select(
        "event_id",
        F.element_at("m", "et").alias("et_val"),
        F.element_at("m", "uid").alias("uid_val"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
        F.size("m").alias("m_size"),
    )


# --- H9: JSON (events.props is a JSON string — the API-payload parse [R-core]) -------------


@query(
    "h9_json",
    oracle="""
    -- json_valid gate on every extraction: DuckDB's ->> THROWS on
    -- malformed JSON where Spark's get_json_object returns NULL
    -- (fuzz sweep, seed 7: props = 'not json')
    SELECT event_id,
           CASE WHEN json_valid(props) THEN props->>'$.k' END AS k_str,
           CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END
                AS INT) AS k_int,
           CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END
                AS INT) % 10 AS k_mod10,
           -- COALESCE: a NULL payload is NOT valid JSON on either
           -- engine (Spark's isNotNull() check is already False there)
           COALESCE(json_valid(props), FALSE) AS is_valid_json
    FROM events
    """,
)
def h9_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") % 10).alias("k_mod10"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid_json"),
    )


# --- H10: hashes (content-hash dedup keys [X]; md5/sha256 are cross-engine,
#     xxhash64 is Spark-specific and only used in engine internals) --------------------------


@query(
    "h10_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           -- || not concat(): NULL-propagating like Spark's concat, so
           -- a record with a missing field has a NULL digest (--nulls)
           md5(lang || ':' || source) AS meta_md5
    FROM documents
    """,
)
def h10_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat("lang", F.lit(":"), "source")).alias("meta_md5"),
    )


# --- H11: URL parsing / encoding ----------------------------------------------


@query(
    "h11_url_functions",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc-'
               || CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 7 AS VARCHAR)
               AS url
      FROM documents
    )
    SELECT doc_id,
           url,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?ref=([0-9]+)$', 1) AS ref,
           replace(regexp_extract(url, '^https://[^/]+(/[^?]*)', 1), '/', '%2F')
             AS path_encoded
    FROM u
    """,
)
def h11_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with Spark's dedicated `parse_url` (HOST/PATH/
    QUERY parts) plus percent-encoding — crawl-pipeline normalization.
    The oracle has no parse_url, so it re-derives the same parts with
    anchored regexes over the identically-constructed URL; a match
    proves parse_url's semantics on this URL shape, not just regex
    equality.  Map-only column expressions."""
    d = load(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"),
            F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
            F.lit("?ref="), (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.regexp_replace(F.parse_url("url", F.lit("PATH")), "/", "%2F").alias(
            "path_encoded"
        ),
    )


# --- H13: VARIANT semi-structured type (Spark 4 shredding path) ---------------


@query(
    "h13_variant_extract",
    # The oracle recomputes the extracted values straight from the
    # source columns: the JSON text is built deterministically from
    # those columns, so parse_json → variant_get must round-trip them.
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS v_id,
           o_totalprice AS v_price,
           o_orderpriority AS v_tag0,
           o_orderstatus AS v_tag1,
           o_orderkey % 5 = 0 AS v_flag
    FROM orders
    """,
)
def h13_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type: ingest semi-structured JSON once with
    `parse_json` (binary variant encoding — parsed ONCE, not per
    extraction) and pull typed paths out with `variant_get`, including
    a nested object, an array index, and a boolean.  This is the
    OLAP-native way to carry API payloads through a pipeline: the
    variant column shreds to columnar storage and path extraction is
    codegen'd, where repeated `get_json_object` re-parses text per
    call.  The oracle proves round-trip fidelity by recomputing every
    extracted value from the columns the JSON was built from —
    including the double, whose shortest-round-trip text form must
    parse back to the identical bits."""
    o = load(spark, sf_dir, "orders")

    # NULL fields serialize as JSON null (--nulls sweep): bare concat
    # is NULL-propagating, so ONE missing column would null the whole
    # payload and every extraction with it — while the oracle, which
    # recomputes from source columns, keeps the present fields.
    def jnum(c):
        return F.coalesce(F.col(c).cast("string"), F.lit("null"))

    def jstr(c):
        return F.coalesce(
            F.concat(F.lit('"'), F.col(c), F.lit('"')), F.lit("null")
        )

    j = o.select(
        "o_orderkey",
        F.concat(
            F.lit('{"id":'), F.col("o_orderkey").cast("string"),
            F.lit(',"price":'), jnum("o_totalprice"),
            F.lit(',"meta":{"flag":'),
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("true")).otherwise(
                F.lit("false")
            ),
            F.lit('},"tags":['), jstr("o_orderpriority"),
            F.lit(","), jstr("o_orderstatus"), F.lit("]}"),
        ).alias("payload"),
    ).select("o_orderkey", F.parse_json("payload").alias("v"))
    return j.select(
        "o_orderkey",
        F.expr("variant_get(v, '$.id', 'bigint')").alias("v_id"),
        F.expr("variant_get(v, '$.price', 'double')").alias("v_price"),
        F.expr("variant_get(v, '$.tags[0]', 'string')").alias("v_tag0"),
        F.expr("variant_get(v, '$.tags[1]', 'string')").alias("v_tag1"),
        F.expr("variant_get(v, '$.meta.flag', 'boolean')").alias("v_flag"),
    )


# --- H12: bitwise function family ---------------------------------------------


@query(
    "h12_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 15 AS BIGINT) AS or_mask,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
           CAST(o_orderkey << 3 AS BIGINT) AS shifted_l,
           CAST(o_orderkey >> 2 AS BIGINT) AS shifted_r,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS popcount
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def h12_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family — AND/OR/XOR masks, shifts, popcount: the
    primitives under hash partitioning, bitmap sketches (d21), SimHash
    (k14b), and bucket addressing.  Pure JVM column expressions,
    map-only, whole-stage codegen; the predicate is pushed to the
    parquet scan."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.expr("CAST(o_orderkey & 255 AS BIGINT)").alias("low_byte"),
        F.expr("CAST(o_orderkey | 15 AS BIGINT)").alias("or_mask"),
        F.expr("CAST(o_orderkey ^ 21845 AS BIGINT)").alias("xored"),
        F.expr("CAST(shiftleft(o_orderkey, 3) AS BIGINT)").alias("shifted_l"),
        F.expr("CAST(shiftright(o_orderkey, 2) AS BIGINT)").alias("shifted_r"),
        F.bit_count(F.col("o_orderkey")).alias("popcount"),
    )


# --- H14: collation-aware grouping (Spark 4 COLLATE) --------------------------


@query(
    "h14_collation_group",
    oracle="""
    WITH m AS (
      SELECT CASE c_custkey % 3
               WHEN 0 THEN upper(c_mktsegment)
               WHEN 1 THEN lower(c_mktsegment)
               ELSE upper(substr(c_mktsegment, 1, 1))
                    || lower(substr(c_mktsegment, 2))
             END AS seg_mixed,
             c_acctbal
      FROM customer
    )
    SELECT lower(seg_mixed) AS segment,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT seg_mixed) AS n_case_variants,
           MIN(seg_mixed) AS first_variant,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
             AS sum_acctbal
    FROM m
    GROUP BY lower(seg_mixed)
    """,
)
def h14_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support (`F.collate(col, 'UTF8_LCASE')`):
    grouping under a case-insensitive collation collapses case variants
    of the market segment WITHOUT rewriting the data — the engine-level
    answer to the lower()-wrapping workaround (which the DuckDB oracle
    uses, proving the two formulations partition identically).

    The mixed-case column is derived deterministically (key mod 3 picks
    upper/lower/initcap), so the case-variant census is stable.  The
    collated grouping key is dropped from the output (collated strings
    canonicalize differently); plain binary-collation columns
    (lower/min/counts) carry the result.  One hash-agg shuffle; at
    100 TB identical to any groupBy — collation compares in the JVM,
    no Python.
    """
    m = load(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.initcap(F.lower("c_mktsegment")))
        .alias("seg_mixed"),
        "c_acctbal",
    )
    return (
        m.groupBy(F.collate("seg_mixed", "UTF8_LCASE").alias("seg_ci"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.collate("seg_mixed", "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
            F.min(F.collate("seg_mixed", "UTF8_BINARY")).alias(
                "first_variant"
            ),
            F.sum(F.col("c_acctbal").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
        .select(
            F.lower(F.collate("seg_ci", "UTF8_BINARY")).alias("segment"),
            "n_rows",
            "n_case_variants",
            F.collate("first_variant", "UTF8_BINARY").alias("first_variant"),
            "sum_acctbal",
        )
    )


# --- H15: try_* error-safe arithmetic (ANSI mode without the blast radius) ----


@query(
    "h15_try_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE l_extendedprice / (l_linenumber - 1) END
             AS price_per_extra_line,
           TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                         THEN CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
                         ELSE l_returnflag END AS INTEGER) AS mixed_as_int,
           CASE WHEN l_orderkey > 0 THEN NULL
                ELSE l_orderkey + 9223372036854775807 END AS overflow_add,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(l_quantity AS INTEGER) END AS qty_int
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def h15_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: `try_divide` / `try_cast` / `try_add`
    return NULL where strict ANSI evaluation would abort the whole job
    (division by zero, unparsable cast, bigint overflow) — the
    row-level error-tolerance contract ETL pipelines need under
    `spark.sql.ansi.enabled=true` (Spark 4's default).  The DuckDB twin
    spells each guard as an explicit CASE, proving the try_* forms
    compute exactly the guarded semantics, not merely 'NULL sometimes'.

    Map-only (no shuffle); the modular filter keeps oracle rows
    deterministic and the overflow case uses l_orderkey's sign so the
    NULL pattern is data-driven, not constant-folded away.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.try_divide(
                F.col("l_extendedprice"), F.col("l_linenumber") - 1
            ).alias("price_per_extra_line"),
            F.expr(
                "try_cast(CASE WHEN l_linenumber % 2 = 0"
                " THEN CAST(CAST(l_quantity AS INT) AS STRING)"
                " ELSE l_returnflag END AS INT)"
            ).alias("mixed_as_int"),
            F.try_add(
                F.col("l_orderkey"), F.lit(9223372036854775807)
            ).alias("overflow_add"),
            F.when(
                F.col("l_quantity") == 0, F.lit(None).cast("int")
            )
            .otherwise(F.col("l_quantity").cast("int"))
            .alias("qty_int"),
        )
    )


# --- H16: map higher-order functions (build / zip / transform / filter) -------


@query(
    "h16_map_hof",
    oracle="""
    WITH per_line AS (
      SELECT l_orderkey, l_linenumber,
             SUM(l_quantity) AS qty,
             FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                        AS DOUBLE) / 1000) AS kp
      FROM lineitem
      WHERE l_orderkey % 20 = 0
      GROUP BY l_orderkey, l_linenumber
    )
    SELECT l_orderkey, l_linenumber, qty * 2 + kp AS fused
    FROM per_line
    WHERE qty * 2 + kp >= 30
    """,
)
def h16_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed higher-order functions end-to-end: per order build two
    maps keyed by line number (`map_from_entries` over collected
    structs), fuse them with `map_zip_with` (qty·2 + price/1000 per
    key), drop small entries with `map_filter`, then explode back to
    rows.  The map machinery is the Spark surface under test; the
    oracle recomputes the surviving (key, value) pairs straight from
    the source columns (h13's proof pattern — map plumbing must be
    value-neutral).

    Shape: one groupBy(l_orderkey) shuffle to build the maps, map-only
    HOFs after; at 100 TB identical to any per-key agg.  All values are
    integer-derived (×2, FLOOR) — no float discipline needed.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 20 == 0)
        # fixture linenumbers repeat within an order — collapse first so
        # map keys are unique (map_from_entries errors on dup keys)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.floor(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)"))
                .cast("double")
                / 1000
            ).alias("kp"),
        )
    )
    maps = li.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_linenumber", "qty")))
        ).alias("qty_map"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_linenumber", "kp")))
        ).alias("price_map"),
    )
    fused = maps.select(
        "l_orderkey",
        F.map_filter(
            F.map_zip_with(
                "qty_map",
                "price_map",
                lambda k, q, p: q * 2 + p,
            ),
            lambda k, v: v >= 30,
        ).alias("fused_map"),
    )
    return fused.select(
        "l_orderkey", F.explode("fused_map").alias("l_linenumber", "fused")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("fused").cast("double").alias("fused"),
    )


# --- H17: extended datetime library -------------------------------------------


@query(
    "h17_datetime_extended",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS q,
           week(o_orderdate) AS iso_week,
           dayofyear(o_orderdate) AS doy,
           last_day(o_orderdate) AS month_end,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2m,
           make_date(CAST(year(o_orderdate) AS INT), 7, 1) AS mid_year,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start
    FROM orders
    WHERE o_orderkey % 25 = 0
    """,
)
def h17_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended calendar library beyond h4: quarter, ISO week,
    day-of-year, month-end, month-clamped add_months (Jan 31 + 1mo =
    Feb 29, verified identical to DuckDB interval addition), make_date
    construction, quarter truncation — the feature-engineering calendar
    surface of time-series/cohort pipelines.  Map-only.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("q"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 2).alias("plus_2m"),
        F.make_date(F.year(d), F.lit(7), F.lit(1)).alias("mid_year"),
        F.date_trunc("quarter", d).cast("date").alias("q_start"),
    )


# --- H18: array library (position / remove / zip / set ops / compact) ---------


@query(
    "h18_array_lib",
    oracle="""
    WITH t AS (
      -- text IS NOT NULL: each engine's NULL cascade through least/
      -- array_join/COALESCE differs on an absent doc (fuzz, seed 11)
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL
    )
    SELECT doc_id,
           COALESCE(list_position(toks, 'the'), 0) AS pos_the,
           len(list_filter(toks, x -> x <> 'the')) AS n_without_the,
           array_to_string(
             list_sort(list_distinct(list_cat(toks[1:3], ['zz', 'aa']))),
             ',') AS union3,
           COALESCE(array_to_string(
             list_sort(list_distinct(list_intersect(toks, ['data', 'table', 'row']))),
             ','), '') AS kept,
           len(list_filter(toks, x -> x IN ('data', 'table', 'row')))
             AS n_kw_instances,
           array_to_string(
             list_transform(range(1, CAST(least(3, len(toks)) AS BIGINT) + 1),
                            i -> toks[i] || ':' || CAST(i AS VARCHAR)),
             ',') AS indexed3
    FROM t
    """,
)
def h18_array_lib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library beyond h7's HOFs: array_position (1-based, 0 when
    absent — DuckDB's list_position matches exactly, measured),
    array_remove, order-insensitive array_union/array_intersect
    (serialized SORTED so the two engines' preservation orders can't
    diverge), keyword-instance counts, and an arrays_zip-with-index
    construction (posexplode-free enumerate).  Map-only; arrays are
    serialized to strings in the output (driver canonicalizer rule).
    """
    t = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 5 == 0) & F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    kw = F.array(F.lit("data"), F.lit("table"), F.lit("row"))
    idx3 = F.transform(
        F.sequence(F.lit(1), F.least(F.lit(3), F.size("toks"))),
        lambda i: F.concat(
            F.element_at("toks", i), F.lit(":"), i.cast("string")
        ),
    )
    return t.select(
        "doc_id",
        F.array_position("toks", "the").cast("bigint").alias("pos_the"),
        F.size(F.array_remove("toks", "the")).alias("n_without_the"),
        F.array_join(
            F.array_sort(
                F.array_union(
                    F.slice("toks", 1, 3), F.array(F.lit("zz"), F.lit("aa"))
                )
            ),
            ",",
        ).alias("union3"),
        F.array_join(
            F.array_sort(F.array_distinct(F.array_intersect("toks", kw))), ","
        ).alias("kept"),
        F.size(F.filter("toks", lambda x: F.array_contains(kw, x))).alias(
            "n_kw_instances"
        ),
        F.array_join(idx3, ",").alias("indexed3"),
    )


# --- H19: timezone conversion functions ---------------------------------------


@query(
    "h19_timezone_functions",
    oracle="""
    SELECT event_id,
           ts,
           CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'
                AS TIMESTAMP) AS ts_nyc,
           CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo'
                AS TIMESTAMP) AS ts_tokyo,
           CAST(EXTRACT(HOUR FROM CAST(ts AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS TIMESTAMP)) AS INT)
             AS hour_nyc,
           CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_utc
    FROM events WHERE event_type = 'purchase'
    """,
)
def h19_timezone_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion surface: wall-clock re-zoning of the UTC
    event stream into market-local times (`from_utc_timestamp` — the
    Spark spelling of `AT TIME ZONE`), and the local-hour extraction
    every regional-activity report needs.  January fixtures pin the
    DST side: New York is UTC-5 (EST) and Tokyo UTC+9 year-round, and
    both engines resolve the conversion through the same IANA tzdata
    rules, so the wall-clock timestamps hash-match exactly.

    Shape: map-only expression work, fused into the scan's codegen
    stage; the pushed `event_type` predicate reaches the parquet
    reader.  At 100 TB timezone math is free — the cost is the scan."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    nyc = F.from_utc_timestamp(F.col("ts").cast("timestamp"), "America/New_York")
    tokyo = F.from_utc_timestamp(F.col("ts").cast("timestamp"), "Asia/Tokyo")
    return ev.select(
        "event_id",
        "ts",
        nyc.cast("timestamp_ntz").alias("ts_nyc"),
        tokyo.cast("timestamp_ntz").alias("ts_tokyo"),
        F.hour(nyc).cast("int").alias("hour_nyc"),
        F.hour("ts").cast("int").alias("hour_utc"),
    )


# --- H20: generator / table-function surface ----------------------------------


@query(
    "h20_generators",
    oracle="""
    WITH p AS (SELECT * FROM part WHERE p_partkey % 20 = 0),
    seq AS (
      SELECT p_partkey, 'seq' AS kind,
             v - 1 AS idx, CAST(v AS VARCHAR) AS val
      FROM p, unnest(generate_series(1, p_size % 3 + 1)) AS t(v)
    ),
    attrs AS (
      SELECT p_partkey, 'attr' AS kind, 0 AS idx, p_brand AS val FROM p
      UNION ALL
      SELECT p_partkey, 'attr' AS kind, 1 AS idx, p_type AS val FROM p
    )
    SELECT * FROM seq UNION ALL SELECT * FROM attrs
    """,
)
def h20_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generator surface: ``posexplode(sequence(...))`` (dynamic
    per-row fan-out with ordinal position) and ``posexplode(array)``
    (fixed attribute unpivot) — the lateral-view table functions every
    wide-to-long reshape uses.  Both are MAP-ONLY whole-stage-codegen
    generators: zero shuffles, fan-out materialized streamwise (never
    buffered), so at 100 TB the cost is exactly the output size.
    The oracle mirrors with ``unnest(generate_series)`` + UNION ALL."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    seq = p.select(
        "p_partkey",
        F.lit("seq").alias("kind"),
        F.posexplode(F.sequence(F.lit(1), F.col("p_size") % 3 + 1)),
    ).select(
        "p_partkey",
        "kind",
        F.col("pos").cast("bigint").alias("idx"),
        F.col("col").cast("string").alias("val"),
    )
    attrs = p.select(
        "p_partkey",
        F.lit("attr").alias("kind"),
        F.posexplode(F.array("p_brand", "p_type")),
    ).select(
        "p_partkey",
        "kind",
        F.col("pos").cast("bigint").alias("idx"),
        F.col("col").alias("val"),
    )
    return seq.unionAll(attrs)


# --- H21: binary encodings (base64 / hex / md5 round-trips) -------------------


@query(
    "h21_binary_encoding",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           lower(hex(encode(substr(text, 1, 8)))) AS hx,
           md5(text) AS text_md5,
           CAST(decode(from_base64(to_base64(encode(substr(text, 1, 24)))))
                  = substr(text, 1, 24) AS BOOLEAN)
             AS b64_roundtrip_ok
    FROM documents
    """,
)
def h21_binary_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary↔text encoding surface: base64 and hex of UTF-8 bytes plus
    an md5 digest, with an in-query base64 decode round-trip proof —
    the building blocks of content-addressed storage keys, wire-format
    debugging, and checksum manifests (k58).  Spark's ``base64``/
    ``hex``/``md5`` against DuckDB's ``to_base64``/``hex``/``md5``;
    both encode the same UTF-8 bytes, so the strings match exactly.
    Map-only column expressions — zero shuffle at any scale.  Output
    stays StringType/Boolean (BinaryType is banned at the query edge —
    no cross-engine canonical text form)."""
    d = load(spark, sf_dir, "documents")
    head24 = F.substring("text", 1, 24)
    return d.select(
        "doc_id",
        # Spark's base64 is the MIME codec (RFC 2045: CRLF-wrapped at 76
        # chars — visible once 24 multibyte chars exceed 57 bytes);
        # DuckDB's to_base64 never wraps.  Pin the unwrapped form.
        F.regexp_replace(
            F.base64(F.encode(head24, "UTF-8")), "\r\n", ""
        ).alias("b64"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias("hx"),
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
        (
            F.decode(F.unbase64(F.base64(F.encode(head24, "UTF-8"))), "UTF-8")
            == head24
        ).alias("b64_roundtrip_ok"),
    )
