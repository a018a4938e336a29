"""Composite analytics queries — TPC-H-shaped multi-operator plans.

SURVEY.md §2 inventories single-operator queries; this module adds the
*composition* tier (reference file:line n/a — empty tree, SURVEY §0.1):
classic TPC-H query shapes adapted to the fixture schema (no partsupp,
no commit/receipt dates — substitutes documented per query).  Each query
exercises a combination the driver's per-operator checks cannot: EXISTS
/ NOT EXISTS as semi/anti joins with non-equi residuals, correlated
scalar subqueries as pre-aggregated joins, scalar subqueries as
broadcast cross joins, disjunctive join predicates, multi-level
aggregation, and deterministic top-k over 6-table join trees.

Scale notes (the plans Catalyst produces, asserted-by-inspection):
- All dimension sides (region 5, nation 25, supplier 100, customer
  1500·sf, part 2000·sf) are broadcast-eligible; AQE picks BHJ so the
  only real shuffles are the final aggregations.
- Filters are applied on the base tables *before* joins so parquet
  pushdown sees them (`PushedFilters` on the scan).
- Correlated subqueries are rewritten as keyed pre-aggregations joined
  on the correlation key — one extra shuffle on a small agg output, no
  per-row re-scan (what a naive nested-loop translation would do).
- Top-k always orders on a unique tiebreak so LIMIT is deterministic
  cross-engine (dsum keeps the sort keys bit-identical — see
  functions/exprs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exprs import dsum, dsum_sql, fsum, fsum_sql, rnd, rnd_sql
from ..registry import query

REV_SQL = "l_extendedprice * (1 - l_discount)"


# --- Q4: order-priority check (EXISTS → left-semi join + residual) ------------


@query(
    "q4_order_priority",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: 'late shipment' = shipped >60 days after order
    (fixtures lack commit/receipt dates).  EXISTS compiles to a left-semi
    hash join on l_orderkey with the date residual evaluated in the join —
    no row duplication, no distinct needed."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --- Q5: local-supplier volume (6-table join, co-nation residual) -------------


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation, {dsum_sql(REV_SQL, "revenue")}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where supplier and customer share a nation,
    restricted to one region/year.  nation⋈region filter is applied to
    the small side first, so the fact-side joins see a pre-pruned
    supplier list; hints pin only the bounded dims (region/nation) and
    AQE sizes the rest at runtime."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem")
    # No broadcast hint on the supplier side: it scales with SF (only
    # nation/region above are bounded); AQE picks BHJ when it fits.
    joined = (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


# --- Q6: forecasting revenue change (pure scan-side filter + global agg) ------


@query(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: all three predicates reach the parquet scan
    (PushedFilters); the agg is a single partial+final reduce — the
    canonical 'scan-dominated' query at 100 TB."""
    l = load(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- Q7: volume shipping between two nations (symmetric pair filter) ----------


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, yr, {dsum_sql("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(l.l_shipdate) AS yr, {REV_SQL} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year.  The two-nation
    disjunction is evaluated after broadcast joins against the 25-row
    nation dim twice (aliased) — no self-join of the fact side."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "s_nk"
    )
    n2 = n.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "c_nk"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    joined = (
        l.join(s, l.l_suppkey == s.s_suppkey)  # supplier scales with SF: AQE decides
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .filter(pair | rpair)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("yr")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))


# --- Q8: market share of one nation within a region ---------------------------


@query(
    "q8_market_share",
    oracle=f"""
    SELECT yr,
           {rnd_sql(
               "SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END) "
               "/ SUM(volume)", "mkt_share", 6)}
    FROM (
      SELECT YEAR(o.o_orderdate) AS yr, n2.n_name AS nation, {REV_SQL} AS volume
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    )
    GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's share of PROMO-part revenue sold into ASIA
    customers, by year.  Conditional aggregation over one join tree —
    the share is a ratio of two sums, rounded on both sides (order-
    sensitive double division)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cust_nk"))
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("nation")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    l = load(spark, sf_dir, "lineitem")
    joined = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("cust_nk") == F.col("c_nationkey"), "inner")
        .join(F.broadcast(n2), F.col("supp_nk") == F.col("s_nationkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_2", vol).otherwise(0.0))
            / F.sum(vol),
            6,
        ).alias("mkt_share")
    )


# --- Q10: returned-item reporting (top-20 customers by lost revenue) ----------


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           {dsum_sql(REV_SQL, "revenue")}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer, top 20.  dsum
    makes the sort key bit-identical across engines; c_custkey breaks
    any residual tie so LIMIT is deterministic.  Compiles to
    TakeOrderedAndProject — no global sort."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "nation")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q13: customer order-count distribution (outer join + double agg) ---------


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation over a filtered LEFT join — the
    join predicate (not a WHERE) keeps order-less customers with
    c_count=0.  Second agg is tiny (distinct counts), so the only real
    shuffle is the first groupBy."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q14: promotion-revenue share (conditional agg ratio) ---------------------


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT {rnd_sql(
        "100.0 * SUM(CASE WHEN p.p_type = 'PROMO' THEN " + REV_SQL +
        " ELSE 0 END) / SUM(" + REV_SQL + ")", "promo_share", 6)},
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO revenue share in one month.  part is broadcast;
    the ratio is rounded both sides (order-sensitive division)."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))  # AQE decides
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q17: small-quantity-order revenue (correlated avg → keyed pre-agg) -------


@query(
    "q17_small_quantity",
    oracle=f"""
    SELECT {dsum_sql("sub.l_extendedprice", "total_extended")},
           COUNT(*) AS n_rows
    FROM (
      SELECT l.l_extendedprice
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#12'
        AND l.l_quantity < (SELECT 0.9 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
                            FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
    ) sub
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted (0.9·avg — 0.2·avg matches nothing on the
    uniform fixture).  The correlated subquery is decorrelated into a
    per-partkey AVG joined back on l_partkey: one extra small shuffle
    instead of a per-row rescan.  The threshold mean is computed as
    exact-decimal-sum / count on BOTH sides (see functions/exprs.py) so
    partition summation order cannot flip a borderline comparison."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    # Decorrelated per-part threshold — only parts of the filtered brand
    # need an AVG, so the agg input is pre-pruned by a semi join.
    thresholds = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            (
                0.9
                * (
                    F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("qty_threshold")
        )
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    # p and thresholds scale as part/brand-count — no pinned broadcast;
    # AQE broadcasts them at this SF and shuffles them beyond.
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            dsum("l_extendedprice", "total_extended"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q18: large-volume customers (HAVING subquery → agg + join) ---------------


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300 (46 orders at
    sf0.01).  The IN-subquery is an aggregation + left-semi join; the
    qualifying-order set is tiny so it broadcasts into the fact join."""
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = load(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))  # small side is the
        # 46-order intermediate, not customer — AQE broadcasts the right one
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --- Q19: disjunctive join predicates (brand × size × quantity bands) ---------


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum_sql(REV_SQL, "revenue")}, COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides.  Catalyst keeps the
    equi-key (p_partkey) for the hash join and evaluates the disjunction
    as a residual; the brand IN-superset is pushed to the part scan."""
    brands = ["Brand#12", "Brand#23", "Brand#34"]
    p = load(spark, sf_dir, "part").filter(F.col("p_brand").isin(brands)).select(
        "p_partkey", "p_brand", "p_size"
    )
    l = load(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))  # AQE decides
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q22: dormant high-balance customers (scalar subquery + NOT EXISTS) -------


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT SUBSTR(CAST(c.c_custkey AS VARCHAR), 1, 1) AS code,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY code
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: above-average-balance customers with no URGENT
    orders (every fixture customer has *some* order, so the classic
    no-orders-at-all predicate is empty).  The scalar AVG is a 1-row
    broadcast cross join — no driver collect; NOT EXISTS is a left-anti
    join against the pre-filtered orders side."""
    c = load(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(
            F.substring(F.col("c_custkey").cast("string"), 1, 1).alias("code")
        )
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal", "total_bal"),
        )
    )


# --- Funnel: ordered event-sequence conversion (view → click → purchase) ------


@query(
    "q_event_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id)
    -- stage counts count the stage TIMESTAMPS (t1/t2/t3), not user_id:
    -- COUNT(user_id) would silently drop the anonymous (NULL user_id)
    -- funnel row that Spark's count("t1") includes (--nulls sweep)
    SELECT COUNT(v.t1) AS n_view,
           COUNT(c.t2) AS n_click,
           COUNT(p.t3) AS n_purchase,
           ROUND(COUNT(c.t2) * 1.0 / COUNT(v.t1), 6) AS view_to_click,
           ROUND(COUNT(p.t3) * 1.0 / COUNT(c.t2), 6) AS click_to_purchase
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first view, then the first click AFTER that view,
    then the first purchase AFTER that click — strict event-sequence
    semantics, not independent per-type counts.  Three keyed min-aggs
    chained by joins on user_id; each stage's input shrinks, and all
    three shuffles share the same key so AQE can reuse the
    partitioning.  Counts are exact; ratios rounded on both sides."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c.select("user_id", "t2"), "user_id", "left")
        .join(p.select("user_id", "t3"), "user_id", "left")
        .agg(
            F.count("t1").alias("n_view"),
            F.count("t2").alias("n_click"),
            F.count("t3").alias("n_purchase"),
            # try_divide: a funnel stage with zero entrants is a NULL
            # rate, not an ANSI DIVIDE_BY_ZERO crash (DuckDB x/0 → NULL)
            F.round(F.try_divide(F.count("t2") * 1.0, F.count("t1")), 6).alias(
                "view_to_click"
            ),
            F.round(F.try_divide(F.count("t3") * 1.0, F.count("t2")), 6).alias(
                "click_to_purchase"
            ),
        )
    )


# --- Cohort retention: weekly signup cohorts × activity offset ----------------


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT f.cohort_week,
           datediff('day', f.cohort_week, a.week) // 7 AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    ISO week, counted per subsequent week of activity.  Both engines
    date_trunc('week') to Monday so cohort keys agree exactly.  Two
    keyed aggs + one join, all on user_id; the final (cohort, offset)
    agg is tiny.  The canonical product-analytics rollup."""
    # DuckDB date_trunc('week') yields DATE; cast Spark's timestamp to
    # date so the cohort_week output column agrees representationally.
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --- Q2: minimum-cost supplier (correlated MIN subquery → pre-agg join) -------


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    sc AS (
      SELECT c.l_partkey, c.unit_cost, e.s_name, e.s_acctbal, e.n_name
      FROM cost c JOIN eur e ON e.s_suppkey = c.l_suppkey
    ),
    minc AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost
      FROM sc GROUP BY l_partkey
    )
    SELECT sc.s_acctbal, sc.s_name, sc.n_name AS nation,
           p.p_partkey, p.p_brand, ROUND(sc.unit_cost, 4) AS unit_cost
    FROM sc
    JOIN minc ON minc.l_partkey = sc.l_partkey
             AND sc.unit_cost = minc.min_cost
    JOIN part p ON p.p_partkey = sc.l_partkey
    WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 20 AND 30
    ORDER BY sc.s_acctbal DESC, sc.s_name ASC, p.p_partkey ASC
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp table): the part-supplier cost
    relation is derived from lineitem as MIN(unit price) per
    (part, supplier).  The correlated 'cost = MIN(cost) over the
    region' subquery becomes a keyed pre-aggregation joined back on
    (partkey, cost) — one shuffle on the small agg output instead of a
    per-row re-scan.  Region/nation prune the supplier side *before*
    the fact join; MIN over identical IEEE divisions is bit-exact
    cross-engine, so the equality join needs no rounding (output
    rounded for display only)."""
    cost = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    eur = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sc = cost.join(eur, F.col("s_suppkey") == F.col("l_suppkey"))
    minc = sc.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(20, 30)
    )
    return (
        sc.join(
            minc,
            (F.col("mc_partkey") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_brand",
            rnd("unit_cost", "unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(20)
    )


# --- Q9: product-type profit by nation × year ---------------------------------


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
           {dsum_sql("l.l_extendedprice * (1 - l.l_discount)"
                     " - l.l_quantity * p.p_retailprice * 0.1", "profit")}
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit = revenue − 10 % of retail price × qty
    (fixtures lack ps_supplycost).  Five-way join where only the part
    filter is selective — it's applied before the join so the scan
    prunes; nation broadcasts; the (nation, year) agg output is tiny.
    Per-row profit is decimal-cast (dsum) so the sum is
    order-independent across engines."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * 0.1
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit, "profit"))
    )


# --- Q11: important part values (scalar-subquery threshold) -------------------


@query(
    "q11_important_part_values",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey, {dsum_sql("l.l_extendedprice * (1 - l.l_discount)",
                                    "value")}
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT pv.l_partkey AS p_partkey, pv.value
    FROM pv, (SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
              AS total FROM pv) t
    WHERE pv.value > t.total * 0.001
    ORDER BY pv.value DESC, p_partkey ASC
    LIMIT 50
    """,
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: per-part shipped value (revenue) for one
    nation's suppliers, keeping parts above 0.1 % of the nation total.
    The scalar total is a 1-row aggregate cross-joined (broadcast) —
    the pv relation is computed once and reused for both the threshold
    and the output (Spark caches nothing here, but pv is one shuffle
    over a pre-filtered fact side either way).  Both the per-part sums
    and the grand total go through decimal casts so the > comparison
    sees identical doubles on both engines."""
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    pv = (
        load(spark, sf_dir, "lineitem")
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "value"))
    )
    total = pv.agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("total") * 0.001)
        .select("p_partkey", "value")
        .orderBy(F.desc("value"), F.asc("p_partkey"))
        .limit(50)
    )


# --- Q12: shipping-delay classes × order priority (conditional agg) -----------


@query(
    "q12_ship_delay_classes",
    oracle="""
    SELECT CASE WHEN DATEDIFF('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'FAST'
                WHEN DATEDIFF('day', o.o_orderdate, l.l_shipdate) <= 60
                THEN 'NORMAL'
                ELSE 'SLOW' END AS delay_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY delay_class
    """,
)
def q12_ship_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no l_shipmode/commitdate): lineitems bucketed
    by ship delay instead of ship mode, counting high- vs low-priority
    lines per bucket.  One join + one 3-group agg; the priority split is
    a conditional SUM, not two scans.  DATEDIFF day semantics agree
    across engines for timestamp inputs."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(delay <= 30, "FAST")
            .when(delay <= 60, "NORMAL")
            .otherwise("SLOW")
            .alias("delay_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q15: top supplier (scalar MAX over a derived revenue view) ---------------


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {dsum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev, (SELECT MAX(total_revenue) AS max_rev FROM rev) m
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = m.max_rev
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.  The
    classic formulation creates a view and compares against its MAX —
    here the view is the `rev` aggregate and the MAX is a 1-row
    broadcast cross join (no second scan of lineitem, no driver
    collect).  dsum makes per-supplier revenue exact, so `= max_rev`
    is a safe double equality on both engines."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16: supplier counts per part group (anti join + count distinct) ---------


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#9'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct supplier count per (brand, type,
    size) group, excluding flagged suppliers (negative balance stands in
    for the 'Customer Complaints' comment filter — fixtures have no
    comment column).  NOT IN over a provably non-null key column is an
    anti join; part filters are pushed to the scan; COUNT DISTINCT
    shuffles once on the group key with partial dedup map-side."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(flagged), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q20: dominant suppliers of a part family (two-level agg + semi chain) ----


@query(
    "q20_dominant_suppliers",
    oracle=f"""
    WITH sq AS (
      SELECT l_partkey, l_suppkey, {dsum_sql("l_quantity", "qty")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%')
      GROUP BY l_partkey, l_suppkey
    ),
    pt AS (
      SELECT l_partkey, CAST(SUM(CAST(qty AS DECIMAL(30,6))) AS DOUBLE)
             AS part_total
      FROM sq GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name AS nation
    FROM sq
    JOIN pt ON pt.l_partkey = sq.l_partkey
    JOIN supplier s ON s.s_suppkey = sq.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE sq.qty > pt.part_total * 0.3
      AND r.r_name = 'AMERICA'
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no ps_availqty): suppliers who shipped more
    than 30 % of a 'small%' part's 1997 volume — the classic
    'availqty > half of shipped' correlated threshold becomes a
    two-level aggregation (per part×supplier, then per part) joined on
    the correlation key.  The part IN-list is a semi join against a
    pre-filtered part scan; region prunes the supplier dimension before
    the final DISTINCT projection."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    sq = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(parts, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty"))
    )
    pt = sq.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum(F.col("qty").cast("decimal(30,6)")).cast("double").alias("part_total")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        sq.join(pt, F.col("pt_partkey") == F.col("l_partkey"))
        .filter(F.col("qty") > F.col("part_total") * 0.3)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
    )


# --- Q21: suppliers who kept orders waiting (semi + anti on one key) ----------


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    cand AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM fl l1
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM fl l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM fl l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.late)
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM cand JOIN supplier s ON s.s_suppkey = cand.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: a supplier 'kept an order waiting' when it was
    the ONLY late shipper (ship > order date + 60d) in a multi-supplier
    finished order.  The EXISTS / NOT-EXISTS pair over the same
    relation is rewritten as ONE per-order aggregation (distinct
    supplier count + distinct late-supplier count) joined back to the
    late lines — two shuffles on l_orderkey instead of three
    self-joins; the oracle keeps the classic correlated form, proving
    the rewrite's semantics.  numwait counts distinct orders."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    fl = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    per_order = fl.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    cand = (
        fl.filter(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(per_order, F.col("po_orderkey") == F.col("l_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cand.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --- Q23: market-basket brand affinity (support / confidence / lift) ----------


@query(
    "q23_basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets),
    brand_cnt AS (
      SELECT brand, COUNT(*) AS cnt FROM baskets GROUP BY brand
    ),
    pair_cnt AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_orders
      FROM baskets a JOIN baskets b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT pc.brand_a, pc.brand_b, pc.pair_orders,
           (1000000 * pc.pair_orders) // n.n_orders AS support_micro,
           (1000000 * pc.pair_orders) // ca.cnt AS confidence_micro,
           (1000000 * pc.pair_orders * n.n_orders) // (ca.cnt * cb.cnt)
             AS lift_micro
    FROM pair_cnt pc
    CROSS JOIN n
    JOIN brand_cnt ca ON ca.brand = pc.brand_a
    JOIN brand_cnt cb ON cb.brand = pc.brand_b
    WHERE pc.pair_orders >= 20
    """,
)
def q23_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association metrics over order/brand baskets:
    support, confidence and lift per co-ordered brand pair, in integer
    micro-units (both engines' integer division truncates identically,
    so the output is hash-exact with no float discipline needed).

    Shape: ONE keyed self-join on the basket key generates pair
    occurrences (fan-out bounded by per-order distinct-brand count —
    small constant per basket, never corpus-squared), then a keyed
    count; the per-brand counts and the scalar order total are
    broadcast back onto the pair table.  At 100 TB this is the standard
    two-round apriori support/lift computation: every shuffle is keyed
    by basket or brand, and the minimum-support filter keeps the output
    tractable."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = baskets.select(
        F.countDistinct("okey").alias("n_orders")
    )
    brand_cnt = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.select("okey", F.col("brand").alias("brand_a"))
    b = baskets.select(F.col("okey").alias("okey_b"), F.col("brand").alias("brand_b"))
    pair_cnt = (
        a.join(b, (F.col("okey") == F.col("okey_b")) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= 20)
    )
    ca = brand_cnt.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("cnt_a"))
    cb = brand_cnt.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("cnt_b"))
    return (
        pair_cnt.crossJoin(F.broadcast(n_orders))
        .join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.expr("(1000000 * pair_orders) div n_orders").alias("support_micro"),
            F.expr("(1000000 * pair_orders) div cnt_a").alias("confidence_micro"),
            F.expr("(1000000 * pair_orders * n_orders) div (cnt_a * cnt_b)").alias(
                "lift_micro"
            ),
        )
    )


# --- Q24: Pareto / cumulative-share concentration analysis --------------------


@query(
    "q24_pareto_share",
    oracle="""
    WITH brand_rev AS (
      SELECT p.p_brand AS brand,
             CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                           AS DECIMAL(30,6))) * 1000000 AS BIGINT) AS rev_us
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ),
    ranked AS (
      SELECT brand, rev_us,
             ROW_NUMBER() OVER (ORDER BY rev_us DESC, brand) AS rk,
             SUM(rev_us) OVER (ORDER BY rev_us DESC, brand
                               ROWS UNBOUNDED PRECEDING) AS cum_us,
             SUM(rev_us) OVER () AS total_us
      FROM brand_rev
    )
    SELECT brand, rk,
           CAST(rev_us AS DOUBLE) / 1000000.0 AS revenue,
           CAST((CAST(cum_us AS HUGEINT) * 1000000) // total_us AS BIGINT)
             AS cum_share_micro,
           (CAST(cum_us AS HUGEINT) * 1000000) // total_us <= 800000
             AS in_pareto_head
    FROM ranked
    """,
)
def q24_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration analysis: brands ranked by revenue with the
    running cumulative share of total — the 80/20 report every category
    manager runs; `in_pareto_head` marks the brands jointly covering
    ≤80 % of revenue.

    Integer discipline: per-brand revenue is decimal-summed (exact,
    order-independent) then converted to integer MICRO-DOLLARS, so the
    running window sum and the share ratio are pure integer arithmetic
    — the 128-bit intermediate (micro-total × 1e6) runs as
    DECIMAL(38,0) in Spark and HUGEINT in DuckDB, both exact, making an
    order-SENSITIVE running sum hash-exact anyway.

    Shape: one keyed agg (brand), then a window over |brands| rows —
    the window input is the aggregate, not the fact table, so the
    single-partition ORDER BY costs |brands|, a constant, at any SF."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brand_rev = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)"
                " AS DECIMAL(30,6))) * 1000000 AS BIGINT)"
            ).alias("rev_us")
        )
    )
    w_order = Window.orderBy(F.col("rev_us").desc(), "brand")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = brand_rev.select(
        "brand",
        "rev_us",
        F.row_number().over(w_order).alias("rk"),
        F.sum("rev_us").over(w_cum).alias("cum_us"),
        F.sum("rev_us").over(w_all).alias("total_us"),
    )
    share = F.expr(
        "CAST((CAST(cum_us AS DECIMAL(38,0)) * 1000000)"
        " div CAST(total_us AS DECIMAL(38,0)) AS BIGINT)"
    )
    return ranked.select(
        "brand",
        "rk",
        (F.col("rev_us").cast("double") / 1000000.0).alias("revenue"),
        share.alias("cum_share_micro"),
        (share <= 800000).alias("in_pareto_head"),
    )


# --- Q25: A/B experiment readout (chi-square independence test) ---------------

# chi-square critical value at p=0.05, df=1, in micro-units (shared literal)
_Q25_CRIT_MICRO = 3_841_459


@query(
    "q25_ab_test_chi2",
    oracle=f"""
    WITH units AS (
      SELECT user_id,
             user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value > 100.0
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT
        SUM(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END) AS a,
        SUM(CASE WHEN variant = 0 AND converted = 0 THEN 1 ELSE 0 END) AS b,
        SUM(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END) AS c,
        SUM(CASE WHEN variant = 1 AND converted = 0 THEN 1 ELSE 0 END) AS d
      FROM units
    )
    SELECT CAST(a + b AS BIGINT) AS n_control, CAST(a AS BIGINT) AS conv_control,
           CAST(c + d AS BIGINT) AS n_treatment, CAST(c AS BIGINT) AS conv_treatment,
           CAST((CAST(a + b + c + d AS HUGEINT)
                 * (a * d - b * c) * (a * d - b * c) * 1000000)
                // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
                AS BIGINT) AS chi2_micro,
           (CAST(a + b + c + d AS HUGEINT)
                 * (a * d - b * c) * (a * d - b * c) * 1000000)
                // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
             >= {_Q25_CRIT_MICRO} AS significant_p05
    FROM cells
    """,
)
def q25_ab_test_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: 2×2 chi-square test of independence
    between assignment (user_id parity — the deterministic hash-split
    every experimentation platform uses) and conversion (≥1 purchase
    over 100.0 — a threshold that leaves all four cells populated).
    The statistic N(ad-bc)²/((a+b)(c+d)(a+c)(b+d)) is computed entirely
    in 128-bit integer arithmetic (DECIMAL(38,0) in Spark, HUGEINT in
    DuckDB) and emitted in micro-units with the p<0.05 critical value
    as a shared literal — a bit-reproducible significance call, no
    floats anywhere.

    Shape: one keyed agg (user) + one global agg (4 cells) — at 100 TB
    the per-user conversion rollup is the only data-scale shuffle; the
    contingency table is a broadcast scalar."""
    units = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 100.0),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    cells = units.agg(
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 0), 1).otherwise(0)
        ).alias("d"),
    )
    # lazy CASE: an empty margin (a whole variant or outcome absent) is a
    # NULL statistic, not an ANSI div-by-zero crash; DuckDB's // 0 → NULL
    # gives the oracle the same value.  The condition tests the margins
    # directly (no product) so it cannot itself overflow at any count.
    chi2 = F.expr(
        "CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0"
        " THEN CAST(NULL AS BIGINT)"
        " ELSE CAST((CAST(a + b + c + d AS DECIMAL(38,0))"
        " * (a * d - b * c) * (a * d - b * c) * 1000000)"
        " div (CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d))"
        " AS BIGINT) END"
    )
    return cells.select(
        (F.col("a") + F.col("b")).alias("n_control"),
        F.col("a").alias("conv_control"),
        (F.col("c") + F.col("d")).alias("n_treatment"),
        F.col("c").alias("conv_treatment"),
        chi2.alias("chi2_micro"),
        (chi2 >= _Q25_CRIT_MICRO).alias("significant_p05"),
    )


# --- Q26: RFM customer segmentation -------------------------------------------


@query(
    "q26_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS c_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT *,
             NTILE(5) OVER (ORDER BY recency_days DESC, c_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, c_custkey) AS f_score,
             -- NULLS FIRST pins Spark's ASC default for customers whose
             -- every order price is NULL (fuzz sweep, seed 11)
             NTILE(5) OVER (ORDER BY monetary NULLS FIRST, c_custkey) AS m_score
      FROM base
    )
    SELECT c_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE
             WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
               THEN 'champion'
             WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
             WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
             WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
             ELSE 'regular'
           END AS segment
    FROM scored
    """,
)
def q26_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    canonical CRM scoring query.  Per customer: days since last order
    (vs the corpus max date), order count, exact decimal-summed spend;
    each metric is quintile-scored with NTILE(5) over a DETERMINISTIC
    total order (metric, then custkey tiebreak — both engines fill
    earlier buckets first, so identical orders give identical buckets),
    then mapped to named segments.

    Scale shape: one keyed agg over orders (map-side partials), a 1-row
    max-date broadcast, then three window passes over the per-customer
    aggregate (customer-sized, ~1e7 rows per TB — fine).  The NTILE
    global order is the one genuinely serial step; at extreme scale the
    same scores come from a 2-pass percentile cut, which d14/t3 already
    demonstrate."""
    o = load(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    base = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("lastd"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice", "monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "c_custkey",
            F.datediff("maxd", "lastd").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from pyspark.sql import Window

    r_w = Window.orderBy(F.col("recency_days").desc(), "c_custkey")
    f_w = Window.orderBy("frequency", "c_custkey")
    m_w = Window.orderBy("monetary", "c_custkey")
    scored = (
        base.withColumn("r_score", F.ntile(5).over(r_w))
        .withColumn("f_score", F.ntile(5).over(f_w))
        .withColumn("m_score", F.ntile(5).over(m_w))
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "loyal")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


# --- Q27: last-touch attribution ----------------------------------------------


@query(
    "q27_last_touch_attribution",
    oracle="""
    -- NULL-timestamp convention (--nulls sweep): a timeless TOUCH can
    -- never be "most recent preceding" (the CASE requires ts), and a
    -- timeless PURCHASE sorts before the timeline (NULLS FIRST — the
    -- Spark default) so its preceding frame is empty and it lands in
    -- the 'none' bucket with its revenue preserved.
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                              AND ts IS NOT NULL
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts NULLS FIRST, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
      FROM events
    )
    SELECT COALESCE(last_touch, 'none') AS touch_type,
           COUNT(*) AS n_purchases,
           """ + fsum_sql("value", "attributed_revenue") + """
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q27_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits its full
    value to the user's most recent preceding touch event (view or
    click); purchases with no prior touch land in the 'none' bucket.
    The per-user event sequence is ordered by (ts, event_id) — a total
    order, so the credited touch is engine-independent even under
    timestamp ties.

    Shape: ONE window pass over user-partitioned events (single shuffle
    on user_id) + a 3-row final agg.  The same plan at 100 TB: user_id
    is high-cardinality and unskewed, so the window partitioning is the
    scalable axis; no self-join of purchases×touches (the naive
    formulation, quadratic per user)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("view", "click")
            & F.col("ts").isNotNull(),
            F.col("event_type"),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("last_touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("last_touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            fsum("value", "attributed_revenue"),
        )
    )


# --- Q28: cohort lifetime-value curves ----------------------------------------


@query(
    "q28_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS n_users
      FROM firsts GROUP BY cohort_week
    ),
    weekly AS (
      SELECT f.cohort_week,
             date_diff('week', f.cohort_week,
                       date_trunc('week', e.ts)) AS week_offset,
             """ + fsum_sql("e.value", "revenue") + """
      FROM events e
      JOIN firsts f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT CAST(m.cohort_week AS DATE) AS cohort_week,
           m.week_offset,
           s.n_users,
           -- NULLS FIRST pins Spark's ASC default: an undated purchase
           -- (NULL week_offset, --nulls sweep) counts into every
           -- cumulative point rather than re-ordering per engine
           ROUND(SUM(m.revenue) OVER (PARTITION BY m.cohort_week
                                      ORDER BY m.week_offset NULLS FIRST)
                 / s.n_users, 6) AS cum_ltv_per_user
    FROM weekly m JOIN sizes s ON s.cohort_week = m.cohort_week
    """,
)
def q28_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users grouped by first-active WEEK (the
    fixture stream spans one month, so weekly cohorts give a real
    triangle); for each cohort and week offset, the cumulative purchase
    revenue per cohort user — the retention-economics readout every
    growth team runs.  Weekly revenue cells are decimal-exact, so the
    window cumsum adds IDENTICAL doubles in the same
    (one-row-per-offset) order on both engines; the terminal 6-dp round
    guards the division.  Week arithmetic: both engines truncate to
    Monday-start ISO weeks and count whole-week boundaries crossed.

    Shape: two user-keyed aggs (first-touch, join back) + a week-cell
    agg + a cohort-partitioned cumsum over ~weeks² rows.  At 100 TB the
    user-keyed join is the only data-scale exchange; everything after
    the week-cell agg is KB-sized."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    weekly = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(fsum("value", "revenue"))
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    return (
        weekly.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_offset",
            "n_users",
            F.round(F.sum("revenue").over(w) / F.col("n_users"), 6).alias(
                "cum_ltv_per_user"
            ),
        )
    )


# --- Q29: repeat-purchase interval profile ------------------------------------


@query(
    "q29_purchase_intervals",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       CAST(lag(o_orderdate) OVER (
                              PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ),
    g2 AS (SELECT o_custkey, gap FROM g WHERE gap IS NOT NULL)
    SELECT c.c_mktsegment,
           COUNT(DISTINCT g2.o_custkey) AS n_repeat_customers,
           COUNT(*) AS n_gaps,
           CAST(median(g2.gap) AS DOUBLE) AS median_gap_days,
           ROUND(CAST(SUM(g2.gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap_days
    FROM g2 JOIN customer c ON c.c_custkey = g2.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q29_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence by market segment: per customer, the day
    gaps between consecutive orders (LAG over the per-customer order
    history), profiled per segment as repeat-customer count, gap count,
    exact median gap, and mean gap — the replenishment-cycle readout
    behind inventory planning and churn models.

    All inputs to the float outputs are exact integers (day diffs), so
    median (interpolated on ints → x.0/x.5 doubles) and mean (int sum /
    int count, identical IEEE division both engines) are cross-engine
    exact without micro-unit armor.  Plan: one shuffle on o_custkey for
    the LAG window, one broadcast-joined customer dim, one segment agg
    — the window partition key (custkey) is also the join key, so AQE
    can reuse the exchange.  At 100 TB per-customer histories stay
    small; the segment agg is 5 groups with map-side partials.
    """
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        o.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        g.join(F.broadcast(c), g.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_repeat_customers"),
            F.count(F.lit(1)).alias("n_gaps"),
            F.median("gap").cast("double").alias("median_gap_days"),
            F.round(
                F.sum("gap").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_gap_days"),
        )
    )


# --- Q30: log-log price elasticity by brand -----------------------------------


@query(
    "q30_price_elasticity",
    oracle="""
    SELECT p.p_brand,
           CAST(regr_count(LN(l.l_quantity),
                LN(l.l_extendedprice / l.l_quantity)) AS BIGINT) AS n_obs,
           CAST(ROUND(regr_slope(LN(l.l_quantity),
                                 LN(l.l_extendedprice / l.l_quantity))
                      * 1000) AS BIGINT) AS elasticity_milli,
           CAST(ROUND(regr_r2(LN(l.l_quantity),
                              LN(l.l_extendedprice / l.l_quantity))
                      * 1000000) AS BIGINT) AS r2_micro
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    GROUP BY p.p_brand
    """,
)
def q30_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) — the pricing-analytics workhorse
    (elasticity < −1 ⇒ revenue falls when price rises).  Unit price is
    derived as extendedprice/quantity; the d26 regression kernel runs
    per brand after a broadcast part-dim join.

    Float discipline: ln() differs across libm implementations by ≤1
    ulp (~1e-16 relative); the regression aggregates over thousands of
    rows keep that at ~1e-12 relative on the slope, and milli/micro
    integer rounding sits ≥1e6 drift-widths from every boundary.  Plan:
    broadcast join (part is the small side), one shuffle on p_brand
    with map-side moment partials — unchanged at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ln_q = F.log(F.col("l_quantity"))
    ln_p = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.regr_count(ln_q, ln_p).alias("n_obs"),
            F.round(F.regr_slope(ln_q, ln_p) * 1000)
            .cast("bigint")
            .alias("elasticity_milli"),
            F.round(F.regr_r2(ln_q, ln_p) * 1e6)
            .cast("bigint")
            .alias("r2_micro"),
        )
    )


# --- Q31: year-over-year revenue growth by brand ------------------------------


@query(
    "q31_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT p.p_brand,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      -- undated shipments have no year and join no YoY series (fuzz)
      WHERE l.l_shipdate IS NOT NULL
      GROUP BY p.p_brand, yr
    )
    SELECT p_brand, yr, revenue,
           CAST(ROUND((revenue / lag(revenue) OVER (PARTITION BY p_brand
                                                    ORDER BY yr) - 1)
                      * 1000000) AS BIGINT) AS yoy_growth_micro
    FROM yearly
    QUALIFY lag(revenue) OVER (PARTITION BY p_brand ORDER BY yr) IS NOT NULL
    """,
)
def q31_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per brand — the BI staple: yearly
    discounted revenue per brand (exact decimal sums), then a LAG
    window over the short per-brand year series with growth emitted in
    micro-units (the division runs on identical doubles both engines).
    Plan: broadcast part join, one shuffle on (brand, year) for the
    agg, then a window over the TINY yearly table (|brands|×|years|
    rows) — the window input is aggregated data, not the fact stream,
    which is the shape that survives 100 TB.
    """
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").isNotNull())
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yearly = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.year("l_shipdate").cast("bigint").alias("yr"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return (
        yearly.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull())
        .select(
            "p_brand",
            "yr",
            "revenue",
            F.round((F.col("revenue") / F.col("prev") - 1) * 1e6)
            .cast("bigint")
            .alias("yoy_growth_micro"),
        )
    )


# --- Q32: Gini coefficient of customer spend ----------------------------------


@query(
    "q32_spend_gini",
    oracle="""
    WITH spend AS (
      -- COALESCE: a customer whose every order price is NULL has spend
      -- ZERO (the economic reading) — a NULL s would rank differently
      -- per engine and fall out of the rank-sum (fuzz sweep, seed 11)
      SELECT o_custkey,
             COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                           AS DOUBLE), 0.0) AS s
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, o_custkey) AS i FROM spend
    )
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(CAST(s AS DECIMAL(30,6))) AS DOUBLE) AS total_spend,
           CAST(ROUND((
             2.0 * CAST(SUM(CAST(i AS DECIMAL(38,6))
                            * CAST(s AS DECIMAL(30,6))) AS DOUBLE)
               / (COUNT(*) * CAST(SUM(CAST(s AS DECIMAL(30,6))) AS DOUBLE))
             - (COUNT(*) + 1.0) / COUNT(*)
           ) * 1000000) AS BIGINT) AS gini_micro
    FROM ranked
    """,
)
def q32_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration — the
    inequality measure behind 'how top-heavy is our revenue?' (0 =
    perfectly even, →1 = one whale), via the rank formulation
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-sorted spend.

    Exactness: per-customer spend is an exact decimal sum; Σx and
    Σi·x run as exact decimal aggregates (order-independent), so both
    engines divide identical doubles — micro-unit emission is belt and
    braces.  Plan: one shuffle for the per-customer agg, then a global
    rank window over the CUSTOMER-sized table (not the fact stream)
    and a 1-row agg; the q24/k80 pattern — the only global sort is on
    aggregated data.  At 100 TB swap the single-partition rank for the
    k32 two-level prefix-sum if the customer dimension itself explodes.
    """
    from pyspark.sql.window import Window

    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast(
                    "double"
                ),
                F.lit(0.0),
            ).alias("s")
        )
    )
    ranked = spend.select(
        "s",
        F.row_number().over(Window.orderBy("s", "o_custkey")).alias("i"),
    )
    sum_s = F.sum(F.col("s").cast("decimal(30,6)")).cast("double")
    sum_is = F.sum(
        F.col("i").cast("decimal(38,6)") * F.col("s").cast("decimal(30,6)")
    ).cast("double")
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_customers"),
        sum_s.alias("total_spend"),
        F.round(
            (2.0 * sum_is / (n * sum_s) - (n + 1.0) / n) * 1e6
        )
        .cast("bigint")
        .alias("gini_micro"),
    )


# --- Q33: ABC inventory classification ----------------------------------------


@query(
    "q33_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER (
                    ORDER BY revenue DESC, l_partkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev,
             CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER () AS DOUBLE)
               AS tot_rev
      FROM rev
    ),
    classed AS (
      SELECT l_partkey,
             CASE WHEN cum_rev <= 0.8 * tot_rev THEN 'A'
                  WHEN cum_rev <= 0.95 * tot_rev THEN 'B'
                  ELSE 'C' END AS abc_class,
             revenue
      FROM ranked
    )
    SELECT abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE)
             AS class_revenue
    FROM classed
    GROUP BY abc_class
    """,
)
def q33_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification — the ops-management standard:
    parts sorted by revenue, class A until 80 % of cumulative revenue,
    B until 95 %, C for the tail, reported as class sizes + revenue.
    Extends q24's Pareto share with the canonical three-way cut.

    Exactness: per-part revenue and every cumulative/total sum run as
    exact decimal aggregates over deterministic (revenue DESC,
    partkey) order, so the 0.8/0.95 threshold comparisons see
    identical doubles on both engines — no rounding needed anywhere.
    Plan: one shuffle for the per-part agg, then windows over the
    PART-sized table (q24/q32 pattern; two-level prefix sum is the
    swap-in if the part dimension explodes).
    """
    from pyspark.sql.window import Window

    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w_cum = (
        Window.orderBy(F.col("revenue").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(30,6)"))
        .over(w_cum)
        .cast("double")
        .alias("cum_rev"),
        F.sum(F.col("revenue").cast("decimal(30,6)"))
        .over(w_all)
        .cast("double")
        .alias("tot_rev"),
    )
    classed = ranked.select(
        "revenue",
        F.when(F.col("cum_rev") <= 0.8 * F.col("tot_rev"), "A")
        .when(F.col("cum_rev") <= 0.95 * F.col("tot_rev"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("revenue").cast("decimal(30,6)"))
        .cast("double")
        .alias("class_revenue"),
    )


# --- Q34: open-order backlog over time (interval counting) ---------------------


@query(
    "q34_open_order_backlog",
    oracle="""
    WITH deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta
      FROM orders
      UNION ALL
      SELECT CAST(o_orderdate AS DATE) + INTERVAL 15 DAY, -1
      FROM orders
    ),
    per_day AS (
      SELECT CAST(day AS DATE) AS day, SUM(delta) AS net
      FROM deltas GROUP BY day
    )
    SELECT day,
           CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS open_orders,
           CAST(net AS BIGINT) AS net_change
    FROM per_day
    QUALIFY SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) > 0
       OR net != 0
    """,
)
def q34_open_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog time series — how many orders are in flight
    each day, with each order open for a 14-day fulfillment window.
    Computed by the sweep-line/delta decomposition: +1 at the open
    day, −1 the day after close, one keyed agg, then a prefix sum —
    the O(n) shape that replaces the quadratic 'count intervals
    covering each day' join, and the standard trick for concurrency /
    inventory / occupancy curves.  Integer-exact throughout.  Plan:
    one shuffle on day (map-side partials absorb the 2× fan-out), one
    window over the DAY-sized table; at 100 TB swap the single-
    partition prefix sum for the k32 two-level variant.
    """
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    deltas = o.select(F.col("d").alias("day"), F.lit(1).alias("delta")).unionAll(
        o.select(F.date_add("d", 15).alias("day"), F.lit(-1).alias("delta"))
    )
    per_day = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    out = per_day.select(
        "day",
        F.sum("net").over(w).cast("bigint").alias("open_orders"),
        F.col("net").cast("bigint").alias("net_change"),
    )
    return out.filter((F.col("open_orders") > 0) | (F.col("net_change") != 0))


# --- Q35: supplier-concentration HHI per part type -----------------------------


@query(
    "q35_supplier_hhi",
    oracle="""
    WITH sup_rev AS (
      SELECT p.p_type, l.l_suppkey,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_type, l.l_suppkey
    ),
    tot AS (
      SELECT p_type,
             CAST(SUM(CAST(rev AS DECIMAL(30,6))) AS DOUBLE) AS tot_rev,
             COUNT(*) AS n_suppliers
      FROM sup_rev GROUP BY p_type
    )
    SELECT s.p_type, t.n_suppliers,
           CAST(ROUND(SUM(POW(s.rev / t.tot_rev, 2)) * 10000000)
                AS BIGINT) AS hhi_e7
    FROM sup_rev s JOIN tot t ON t.p_type = s.p_type
    GROUP BY s.p_type, t.n_suppliers
    """,
)
def q35_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue
    within each part type — the antitrust/procurement-risk metric
    (HHI → 1 means one supplier owns the category; < 0.15 is
    'unconcentrated').  Shares come from exact decimal revenue sums,
    so both engines square and sum identical doubles; the share-square
    sum is a per-group aggregate of ≤|suppliers| terms whose addition
    order is pinned by the rounding headroom (summands ∈ [0,1], ~40
    terms — drift ≪ the 1e-7 emission grain).  Plan: broadcast part
    join, two keyed aggs (type×supplier, then type) — map-side
    partials both, scale-free.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    sup_rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("rev")
        )
    )
    tot = sup_rev.groupBy("p_type").agg(
        F.sum(F.col("rev").cast("decimal(30,6)")).cast("double").alias("tot_rev"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return (
        sup_rev.join(tot, "p_type")
        .groupBy("p_type", "n_suppliers")
        .agg(
            F.round(
                F.sum(F.pow(F.col("rev") / F.col("tot_rev"), 2)) * 1e7
            )
            .cast("bigint")
            .alias("hhi_e7")
        )
    )


# --- Q36: above-median revenue streaks (gaps and islands) ----------------------


@query(
    "q36_revenue_streaks",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS rev
      -- an undated purchase sits on no calendar day (fuzz, seed 42)
      FROM events WHERE event_type = 'purchase' AND isfinite(value)
        AND ts IS NOT NULL
      GROUP BY day
    ),
    med AS (SELECT median(rev) AS med_rev FROM daily),
    flagged AS (
      SELECT day, rev > m.med_rev AS hot,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM daily CROSS JOIN med m
    ),
    islands AS (
      SELECT hot, rn - ROW_NUMBER() OVER (PARTITION BY hot ORDER BY day)
               AS grp,
             day
      FROM flagged
    ),
    streaks AS (
      SELECT hot, grp, COUNT(*) AS len,
             MIN(day) AS streak_start, MAX(day) AS streak_end
      FROM islands GROUP BY hot, grp
    )
    SELECT hot,
           COUNT(*) AS n_streaks,
           MAX(len) AS longest,
           CAST(SUM(len) AS BIGINT) AS total_days
    FROM streaks
    GROUP BY hot
    """,
)
def q36_revenue_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/cold streak profile of daily purchase revenue — the
    gaps-and-islands pattern (rn − rn-within-class = island id) applied
    to 'how many consecutive above-median days have we strung
    together?'.  The island trick turns consecutive-run detection into
    two ROW_NUMBERs and a groupBy — no self-join, no recursion, which
    is what keeps it linear at any scale.  Median comes from the exact
    decimal daily sums (identical doubles both engines, the t15
    pairing), comparisons are strict, everything downstream is integer.
    Plan: day-agg shuffle, a 1-row median broadcast, two windows over
    the DAY-sized series, final 2-row agg.
    """
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        # non-finite observations are missing data to a streak detector:
        # excluded on BOTH engines (--extreme convention, as t18/t20)
        .filter(
            "NOT (isnan(value) OR value = CAST('Infinity' AS DOUBLE)"
            " OR value = CAST('-Infinity' AS DOUBLE))"
        )
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("rev")
        )
    )
    med = daily.agg(F.median("rev").alias("med_rev"))
    flagged = daily.crossJoin(F.broadcast(med)).select(
        "day",
        (F.col("rev") > F.col("med_rev")).alias("hot"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    islands = flagged.withColumn(
        "grp",
        F.col("rn")
        - F.row_number().over(Window.partitionBy("hot").orderBy("day")),
    )
    streaks = islands.groupBy("hot", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("hot").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest"),
        F.sum("len").alias("total_days"),
    )


# --- Q37: shipping SLA attainment by order priority ----------------------------


@query(
    "q37_ship_sla",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           COUNT(*) FILTER (
             WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) <= 7)
             AS n_within_7d,
           CAST(ROUND(CAST(COUNT(*) FILTER (
                 WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) <= 7)
               AS DOUBLE) / COUNT(*) * 1000000) AS BIGINT)
             AS sla_attain_micro,
           CAST(MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS BIGINT)
             AS worst_lag_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q37_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-SLA attainment: share of lineitems shipped within 7
    days of order placement, by order priority — the fulfillment KPI
    ops teams page on, with the worst-case lag for the postmortem.
    Integer day arithmetic + one exact ratio per group.  Plan: the
    fact-fact join runs on the orderkey both sides are clustered by
    (shuffle hash join, AQE-coalesced), then a 5-group conditional
    agg with map-side partials.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(lag <= 7, 1)).alias("n_within_7d"),
            F.round(
                F.count(F.when(lag <= 7, 1)).cast("double")
                / F.count(F.lit(1))
                * 1e6
            )
            .cast("bigint")
            .alias("sla_attain_micro"),
            F.max(lag).cast("bigint").alias("worst_lag_days"),
        )
    )


# --- Q38: cumulative unique customers per week ---------------------------------


@query(
    "q38_cumulative_uniques",
    oracle="""
    WITH first_seen AS (
      SELECT o_custkey,
             MIN(date_trunc('week', CAST(o_orderdate AS DATE))) AS wk
      FROM orders GROUP BY o_custkey
    ),
    per_week AS (
      SELECT CAST(wk AS DATE) AS week_start,
             COUNT(*) AS new_customers
      FROM first_seen GROUP BY wk
    )
    -- NULLS FIRST pins Spark's ASC default: customers whose every
    -- order is undated (NULL week, --nulls sweep) enter the curve
    -- before week one rather than re-ordering per engine
    SELECT week_start, new_customers,
           CAST(SUM(new_customers) OVER (ORDER BY week_start NULLS FIRST
                                         ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumulative_uniques
    FROM per_week
    """,
)
def q38_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique customers over time — the growth curve every
    dashboard opens with, computed the scalable way: a running COUNT
    DISTINCT is re-expressed as 'count each customer once, in their
    FIRST week, then prefix-sum' (the first-seen decomposition).  The
    naive windowed COUNT(DISTINCT) is unsupported/quadratic in most
    engines; this form is two keyed aggs + one window over the
    WEEK-COUNT-sized series, all integer-exact.  The same shape backs
    i18's streaming exact-distinct recipe — this is its batch twin.
    """
    from pyspark.sql import Window

    first_seen = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.date_trunc("week", F.col("o_orderdate").cast("date"))
            ).alias("wk")
        )
    )
    per_week = first_seen.groupBy(
        F.col("wk").cast("date").alias("week_start")
    ).agg(F.count(F.lit(1)).alias("new_customers"))
    w = Window.orderBy("week_start").rowsBetween(Window.unboundedPreceding, 0)
    return per_week.select(
        "week_start",
        "new_customers",
        F.sum("new_customers").over(w).cast("bigint").alias("cumulative_uniques"),
    )


# --- Q39: behavioral entropy per user ------------------------------------------


@query(
    "q39_behavior_entropy",
    oracle="""
    WITH mix AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    tot AS (
      SELECT user_id, SUM(c) AS n FROM mix GROUP BY user_id
    ),
    ent AS (
      SELECT m.user_id,
             CAST(SUM(CAST(ROUND(
               -(CAST(m.c AS DOUBLE) / t.n) * LN(CAST(m.c AS DOUBLE) / t.n)
               / LN(2), 6) AS DECIMAL(30,6))) AS DOUBLE) AS h,
             MAX(t.n) AS n_events
      FROM mix m JOIN tot t USING (user_id)
      GROUP BY m.user_id
    )
    SELECT CAST(FLOOR(h / 0.25) AS BIGINT) AS entropy_band,
           COUNT(*) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM ent
    GROUP BY entropy_band
    """,
)
def q39_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy (bits) of each
    user's event-type mix, reported as a 0.25-bit banded histogram —
    the engagement-breadth feature behind 'explorers vs single-action
    bots' segmentation (a user who only ever clicks scores 0; a
    uniform 5-type mix scores log₂5 ≈ 2.32).

    Float discipline: each −p·log₂p term is rounded to 6 dp (1-ulp ln
    drift crushed) and the per-user sum runs as an EXACT decimal
    aggregate (d28's trick), so banding compares identical doubles.
    Plan: (user, type) count agg → per-user entropy agg → tiny band
    agg; three map-side-partial shuffles of shrinking tables.
    """
    mix = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = mix.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p) / F.log(F.lit(2.0)), 6)
    ent = (
        mix.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(term.cast("decimal(30,6)")).cast("double").alias("h"),
            F.max("n").alias("n_events"),
        )
    )
    return ent.groupBy(
        F.floor(F.col("h") / 0.25).cast("bigint").alias("entropy_band")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"),
    )
