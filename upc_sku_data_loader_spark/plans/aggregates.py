"""§2.D Aggregations (SURVEY.md §2.D; reference file:line n/a — empty tree §0.1).

The reference's only aggregation surface is load-audit row counting and
latest-record-wins upsert grouping [R]; everything here is the Spark-first
generalization.  All plans are single groupBy stages → one shuffle, with
map-side partial aggregation supplied automatically by HashAggregate;
at 100 TB these scale linearly with input and shuffle only the group
cardinality, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exprs import dsum, dsum_sql, rnd_sql
from ..registry import query

# --------------------------------------------------------------------------
# D1 — hash-grouped aggregation. Flagship: TPC-H Q1-style pricing summary.
# Plan shape: Scan(parquet, pushed filter on l_shipdate, pruned to 7 cols)
# → partial HashAggregate → Exchange(hashpartitioning by 2 low-card keys)
# → final HashAggregate. The only shuffle moves ≤ |groups| × partials.
# --------------------------------------------------------------------------


@query(
    "d1_agg_hash_grouped",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      ROUND(AVG(l_quantity), 4) AS avg_qty,
      ROUND(AVG(l_extendedprice), 4) AS avg_price,
      ROUND(AVG(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d1_agg_hash_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# D2 — global aggregation (no grouping): the reference's load-audit counts
# [R high]. Single partial→final reduce, no keyed shuffle at any scale.
# --------------------------------------------------------------------------


@query(
    "d2_agg_global",
    oracle=f"""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      {dsum_sql("l_extendedprice", "total_price")},
      ROUND(MIN(l_quantity), 4) AS min_qty,
      ROUND(MAX(l_quantity), 4) AS max_qty
    FROM lineitem
    """,
)
def d2_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice", "total_price"),
        F.round(F.min("l_quantity"), 4).alias("min_qty"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
    )


# --------------------------------------------------------------------------
# D3 — exact COUNT(DISTINCT) per group. Catalyst expands this to a
# two-phase aggregate (distinct keys first, then count) — at scale the
# first phase shuffles (event_type, user_id) pairs, which is the minimal
# data movement for exactness.
# --------------------------------------------------------------------------


@query(
    "d3_agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def d3_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# D4 — approximate COUNT(DISTINCT) (HLL++). Approx sketches differ across
# engines → rows-only driver check; the pytest suite bounds its error
# against D3's exact counts instead.
# --------------------------------------------------------------------------


@query("d4_agg_approx_count_distinct")
def d4_agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


# --------------------------------------------------------------------------
# D5 — HAVING (post-aggregation filter): plain .filter after .agg;
# Catalyst keeps it above the aggregate, so it costs nothing extra.
# --------------------------------------------------------------------------


@query(
    "d5_agg_having",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {dsum_sql("o_totalprice", "total_spend")}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def d5_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("n_orders") >= 15)
    )
