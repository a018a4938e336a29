"""§2.F Sorts/limits/top-k and §2.G set operations (SURVEY.md §2.F-G;
reference file:line n/a — empty tree §0.1).

Determinism rule: LIMIT only ever follows a total order (unique-key
tiebreak), otherwise the result set is nondeterministic vs the oracle.

Scale notes: global ORDER BY + LIMIT k compiles to
TakeOrderedAndProject (per-partition top-k, then a k-row merge on the
driver — no global sort); top-k per group is the row_number pattern
(one shuffle).  Set ops are hash aggregations/joins underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# --- F1: multi-key sort with null ordering (+ deterministic LIMIT) -----------


@query(
    "f1_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NULLIF(o_orderpriority, '5-LOW') AS priority_or_null,
           o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC,
             priority_or_null DESC NULLS LAST,
             o_totalprice DESC,
             o_orderkey ASC
    LIMIT 100
    """,
)
def f1_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.nullif("o_orderpriority", F.lit("5-LOW")).alias("priority_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.asc("o_orderstatus"),
            F.desc_nulls_last("priority_or_null"),
            F.desc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(100)
    )


# --- F2: LIMIT after a total order --------------------------------------------


@query(
    "f2_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50
    """,
)
def f2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy("o_orderkey").limit(50)


# --- F3: global top-k (TakeOrderedAndProject) ----------------------------------


@query(
    "f3_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def f3_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --- F4: top-k per group (row_number ≤ k) ---------------------------------------


@query(
    "f4_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM ranked WHERE rn <= 3
    """,
)
def f4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


# --- G1: UNION ALL (multi-page/batch concatenation — the reference's
#     page-merge [R high]) -------------------------------------------------------


@query(
    "g1_union_all",
    oracle="""
    SELECT src, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust
    FROM (
      SELECT 'fulfilled' AS src, o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'open' AS src, o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    GROUP BY src
    """,
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f_part = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("fulfilled").alias("src"), "o_custkey"
    )
    o_part = o.filter(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("src"), "o_custkey"
    )
    return (
        f_part.unionByName(o_part)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("o_custkey").alias("n_cust"))
    )


# --- G2: INTERSECT (distinct semantics) ------------------------------------------


@query(
    "g2_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def g2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersect(b)


# --- G3: EXCEPT ALL (bag minus — new-records detection [R-core]) ------------------


@query(
    "g3_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def g3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


# --- G4: DISTINCT / dropDuplicates (exact dedup) -----------------------------------


@query(
    "g4_distinct",
    oracle="""
    SELECT DISTINCT event_type, user_id % 7 AS user_mod
    FROM events
    """,
)
def g4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_type", (F.col("user_id") % 7).alias("user_mod")
    ).dropDuplicates()


# --- G5: unionByName with missing columns (schema-evolution union) ------------


@query(
    "g5_union_by_name",
    oracle="""
    SELECT o_orderkey AS order_key, o_totalprice AS price,
           o_orderpriority AS priority, NULL AS ship_flag
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT l_orderkey AS order_key, l_extendedprice AS price,
           NULL AS priority, l_returnflag AS ship_flag
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def g5_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two sources with overlapping-but-unequal
    columns merged by NAME (not position), absent columns null-filled —
    `unionByName(allowMissingColumns=True)`.  The everyday shape when a
    v2 feed adds fields; positional UNION would silently mis-align.
    Map-only (no shuffle)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_returnflag").alias("ship_flag"),
        )
    )
    return o.unionByName(li, allowMissingColumns=True)


# --- G6: multiset set operations (INTERSECT ALL / EXCEPT ALL) -----------------


@query(
    "g6_setop_all",
    oracle="""
    SELECT 'intersect_all' AS op, v FROM (
      SELECT l_suppkey AS v FROM lineitem WHERE l_quantity < 10
      INTERSECT ALL
      SELECT l_suppkey AS v FROM lineitem WHERE l_discount > 0.05
    )
    UNION ALL
    SELECT 'except_all' AS op, v FROM (
      SELECT l_suppkey AS v FROM lineitem WHERE l_quantity < 10
      EXCEPT ALL
      SELECT l_suppkey AS v FROM lineitem WHERE l_discount > 0.05
    )
    """,
)
def g6_setop_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) semantics set ops — `intersectAll` / `exceptAll`
    keep duplicate multiplicity, unlike g2/g3's DISTINCT forms.  Spark
    plans both as a hash aggregation counting per-value multiplicity on
    each side followed by a replicate — one shuffle on the value key,
    partial counts map-side, so duplicates never cross the wire
    individually.  The duplicate-preserving output is exactly what the
    driver's multiset row hash verifies."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 10).select(F.col("l_suppkey").alias("v"))
    b = li.filter(F.col("l_discount") > 0.05).select(F.col("l_suppkey").alias("v"))
    inter = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "v")
    diff = a.exceptAll(b).select(F.lit("except_all").alias("op"), "v")
    return inter.unionAll(diff)


# --- F5: keyset pagination (the scale-correct LIMIT/OFFSET) -------------------

_F5_PAGE = 100
_F5_SKIP = 200  # boundary = last key of page 2 (pages of 100)


@query(
    "f5_keyset_pagination",
    oracle=f"""
    WITH b AS (
      SELECT MAX(o_orderkey) AS last_key
      FROM (SELECT o_orderkey FROM orders
            ORDER BY o_orderkey LIMIT {_F5_SKIP})
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders, b
    WHERE o_orderkey > b.last_key
    ORDER BY o_orderkey
    LIMIT {_F5_PAGE}
    """,
)
def f5_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: page 3 of the order book, fetched as
    `WHERE key > last_seen ORDER BY key LIMIT n` instead of
    OFFSET/LIMIT.

    Why this is the 100 TB pagination: OFFSET k LIMIT n must still
    produce-and-discard k rows on every page (O(k+n) per page, O(p²n)
    for a full scan via pages), while the keyset predicate is pushed
    down to the parquet reader (PushedFilters: GreaterThan) so page p
    costs the same as page 1.  The boundary key is a 1-VALUE bounded
    collect (the k42 centroid discipline) obtained from a distributed
    TakeOrderedAndProject — turning it into a literal is exactly what
    lets the scan skip row groups below the boundary.
    """
    orders = load(spark, sf_dir, "orders")
    boundary = (
        orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(_F5_SKIP)
        .agg(F.max("o_orderkey").alias("last_key"))
        .collect()[0]["last_key"]
    )
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(F.col("o_orderkey") > F.lit(boundary))
        .orderBy("o_orderkey")
        .limit(_F5_PAGE)
    )
