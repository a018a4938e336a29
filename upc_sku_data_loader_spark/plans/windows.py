"""§2.E Window functions (SURVEY.md §2.E; reference file:line n/a — empty
tree §0.1).  E1 is the reference's core semantic: latest-record-per-key
dedup before upsert [R-core]; the rest generalizes.

Determinism rule: every ORDER BY inside a window carries a unique-key
tiebreak, so both engines compute identical frames even under value
ties.  Scale: one window = one shuffle on the partition key + a sort
within partitions; AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exprs import fsum_over_sparksql, fsum_over_sql
from ..registry import query

# --- E1: row_number dedup-latest (the ETL-defining window) -------------------


@query(
    "e1_win_row_number",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def e1_win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# --- E2: rank / dense_rank with ties ----------------------------------------


@query(
    "e2_win_rank_dense",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_dense_rank
    FROM customer
    QUALIFY bal_rank <= 20
    """,
)
def e2_win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.rank().over(w).alias("bal_rank"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
        )
        .filter(F.col("bal_rank") <= 20)
    )


# --- E3: ntile quantile bucketing --------------------------------------------


@query(
    "e3_win_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal NULLS FIRST, c_custkey) AS bal_quartile
    FROM customer
    """,
)
def e3_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_nationkey", "c_acctbal", F.ntile(4).over(w).alias("bal_quartile")
    )


# --- E4: lag / lead ----------------------------------------------------------


@query(
    "e4_win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice, 1) OVER w AS prev_price,
           LEAD(o_totalprice, 1) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
)
def e4_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


# --- E5: running (cumulative) sum — decimal-exact so both engines agree ------


@query(
    "e5_win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def e5_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# --- E6: moving average (sliding rows frame) ---------------------------------


@query(
    "e6_win_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ), 6) AS moving_avg_4
    FROM orders
    """,
)
def e6_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("moving_avg_4"),
    )


# --- E7: value-range frame (7 trailing days) ---------------------------------
# Spark range frames need a numeric ORDER BY → epoch seconds on both sides.


@query(
    "e7_win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS n_last_7d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_last_7d
    FROM orders
    """,
)
def e7_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "epoch_s", F.expr("unix_seconds(cast(o_orderdate as timestamp))")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-7 * 86400, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_last_7d"),
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("spend_last_7d"),
    )


# --- E8: first/last value over an unbounded frame ----------------------------


@query(
    "e8_win_first_last_over",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def e8_win_first_last_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


# --- E9: distribution windows (percent_rank / cume_dist) ----------------------
# Both are exact rank arithmetic over the same sorted frame, so they
# hash-check cross-engine; the unique-key tiebreak rule applies as ever.


@query(
    "e9_win_percent_cume",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice NULLS FIRST, o_orderkey)
    """,
)
def e9_win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --- E10: time-interval RANGE frame (trailing 1-hour rolling aggregates) ------


@query(
    "e10_win_range_interval",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, ts, event_id,
           COUNT(*) OVER w AS n_1h,
           """ + fsum_over_sql("value", "OVER w") + """
             AS sum_1h
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def e10_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frame: trailing 1-hour event count and
    exact purchase total per user — the value-based frame (peers share
    the frame; the bound is an INTERVAL against the ORDER BY timestamp,
    not a row count), which rows-frames like e5/e6 cannot express when
    events are irregularly spaced.

    One shuffle on user_id, one in-partition sort, both aggregates in a
    single WindowExec pass.  The sum is decimal-cast per row inside the
    frame (order-independent, cross-engine exact); count is integral.
    At 100 TB identical partitioning to t2/t8; frame state is bounded
    by event density within the hour, not history.
    """
    p = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    return p.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts"
            " RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).alias("n_1h"),
        F.expr(
            fsum_over_sparksql(
                "value",
                "OVER (PARTITION BY user_id ORDER BY ts"
                " RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)",
            )
        ).alias("sum_1h"),
    )


# --- E11: IGNORE NULLS navigation functions -----------------------------------
# lag(... ) IGNORE NULLS / nth_value(..., n) IGNORE NULLS: the sparse-
# series navigation surface — "previous OBSERVED reading", not
# "previous row" — which is how sensor/price series with missing
# readings are actually walked (t6's interpolation uses the same
# primitive internally; this pins the user-facing form).


@query(
    "e11_win_ignore_nulls",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT user_id, ts, event_id, v,
           lag(v IGNORE NULLS) OVER w AS prev_observed,
           nth_value(v, 2 IGNORE NULLS) OVER (
             w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_observed
    FROM p
    -- ts NULLS FIRST pins Spark's ASC default: a timeless reading
    -- sorts before the sequence on both engines (--nulls sweep)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    """,
)
def e11_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation: per-user previous OBSERVED value
    (lag ... IGNORE NULLS skips rows whose reading is missing — here
    'error' events carry no valid reading) and the second observed
    value in the running frame (nth_value ... IGNORE NULLS).

    Semantics verified identical Spark ↔ DuckDB on a planted
    null-pattern frame (measured; both engines implement the ANSI
    IGNORE NULLS clause).  One user-keyed shuffle; both navigation
    functions ride the same WindowExec pass.
    """
    register = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    register.createOrReplaceTempView("e11_p")
    return spark.sql(
        """
        SELECT user_id, ts, event_id, v,
               lag(v) IGNORE NULLS OVER w AS prev_observed,
               nth_value(v, 2) IGNORE NULLS OVER w2 AS second_observed
        FROM e11_p
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )
