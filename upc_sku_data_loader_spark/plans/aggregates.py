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
from ..functions.exprs import dsum, dsum_sql, fsum, fsum_sql, rnd_sql
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
# D4 — approximate COUNT(DISTINCT) (HLL++). Approx sketch values differ
# across engines, so the hash-checked surface is (exact count, bound-check
# boolean): the HLL++ estimate still runs and feeds the boolean, the oracle
# computes the exact count and literal TRUE. 3×rsd is a ≥99.7% bound; if it
# ever trips, the sketch is broken and the hash-fail is the right signal.
# --------------------------------------------------------------------------


@query(
    "d4_agg_approx_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_rsd_bound
    FROM events
    GROUP BY event_type
    """,
)
def d4_agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    rsd = 0.02
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 3 * rsd
        ).alias("within_rsd_bound"),
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


# --------------------------------------------------------------------------
# D6 — ROLLUP subtotal hierarchy. Spark expands rollup to a union of
# grouping sets inside one aggregate — still a single shuffle.
# --------------------------------------------------------------------------


@query(
    "d6_agg_rollup",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    HAVING NOT (GROUPING(o_orderstatus) = 1 AND GROUPING(o_orderpriority) = 1
                AND COUNT(*) = 0)
    """,
)
def d6_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total"),
    )


# --------------------------------------------------------------------------
# D7 — CUBE (all grouping combinations).
# --------------------------------------------------------------------------


@query(
    "d7_agg_cube",
    oracle="""
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           CAST(ts AS DATE) IS NULL AND CAST(GROUPING(CAST(ts AS DATE)) AS INT) = 1 AS day_is_total,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY CUBE(event_type, CAST(ts AS DATE))
    HAVING NOT (GROUPING(event_type) = 1 AND GROUPING(CAST(ts AS DATE)) = 1
                AND COUNT(*) = 0)
    """,
)
def d7_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    return ev.cube("event_type", "day").agg(
        (F.col("day").isNull() & (F.grouping("day").cast("int") == 1)).alias(
            "day_is_total"
        ),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# D8 — collect_list/collect_set per group (order-normalized for the oracle).
# The collected set is serialized with array_join: the grading driver's
# canonicalizer cannot hash ArrayType cells (r1 verdict), so no registry
# query may emit an array output column (tests/test_contract.py lints this).
# --------------------------------------------------------------------------


@query(
    "d8_agg_collect",
    oracle="""
    SELECT c_nationkey,
           -- collections exclude NULLs on both engines (--nulls sweep):
           -- Spark's collect_set skips NULL members outright, so the
           -- oracle filters them too; an all-NULL group is the EMPTY
           -- string (Spark array_join of []), never SQL NULL
           COALESCE(array_to_string(list_sort(
               list(DISTINCT c_mktsegment)
                 FILTER (WHERE c_mktsegment IS NOT NULL)), ','), '')
             AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def d8_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


# --------------------------------------------------------------------------
# D9 — deterministic first/last per group: max over a (ts, key) struct
# gives argmax with a total-order tiebreak (no nondeterministic first()).
# --------------------------------------------------------------------------


@query(
    "d9_agg_first_last",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey,
           o_orderdate AS last_orderdate,
           o_orderkey AS last_orderkey,
           o_totalprice AS last_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def d9_agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    latest = F.max(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("m")
    return (
        o.groupBy("o_custkey")
        .agg(latest)
        .select(
            "o_custkey",
            F.col("m.o_orderdate").alias("last_orderdate"),
            F.col("m.o_orderkey").alias("last_orderkey"),
            F.col("m.o_totalprice").alias("last_totalprice"),
        )
    )


# --------------------------------------------------------------------------
# D10 — percentiles: exact interpolated median / p95 (both engines use the
# same lower+(higher-lower)*frac interpolation; ROUND absorbs last-bit fp).
# --------------------------------------------------------------------------


@query(
    "d10_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d10_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95_price"),
    )


# --------------------------------------------------------------------------
# D11 — moment statistics (stddev/variance/corr/covar). Different engines
# accumulate moments in different orders → ROUND(_, 4) on both sides.
# --------------------------------------------------------------------------


def _safe_corr(x, y):
    """Pearson r that NULLs on zero variance instead of throwing.

    Spark's built-in ``corr`` is the one statistical aggregate that
    DIVIDES inside its merge under ANSI semantics — a constant series
    throws DIVIDE_BY_ZERO (degenerate-sweep finding, round 8) while
    DuckDB's ``corr`` returns NULL.  Reconstruct the identical value
    from the Welford-stable covar/stddev kernels with try_divide:
    covar_samp/(sd_x·sd_y) equals corr's internal ck/√(xMk·yMk) up to
    last-bit association, well inside every emission's ROUND tolerance.
    """
    return F.try_divide(
        F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y)
    )


def _safe_corr_sql(x: str, y: str) -> str:
    """DuckDB twin of :func:`_safe_corr` — the SAME covar/stddev
    composition rather than DuckDB's native corr kernel, so both
    engines evaluate the identical expression tree and a half-ulp
    divergence between two different corr implementations can never
    surface at a .5 rounding boundary (r8 ADVICE item).  DuckDB's
    x/0 is NULL natively, matching try_divide."""
    return (
        f"covar_samp({x}, {y})"
        f" / (stddev_samp({x}) * stddev_samp({y}))"
    )


@query(
    "d11_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND("""
    + _safe_corr_sql("l_quantity", "l_extendedprice")
    + """, 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d11_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(_safe_corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


# --------------------------------------------------------------------------
# D12 — pivot with a pinned value list (never let pivot() scan for values:
# at 100 TB that is an extra full pass; pinning also fixes the schema).
# --------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "d12_agg_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events
    GROUP BY user_id % 10
    """,
)
def d12_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return (
        ev.groupBy("user_bucket")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


# --- D13: salted two-phase aggregation (hot-key skew defense) -----------------
# events has only 5 event_type values — at 100 TB each grouping key gets
# ~20 TB, far beyond one reducer.  The classic fix: salt the key into S
# shards, pre-aggregate by (key, salt) — a map-side-combinable shuffle
# across S×|keys| reducers — then re-aggregate the S partials per key.
# DECIMAL partials keep both phases order-independent, so the result is
# bit-identical to the unsalted oracle.


@query(
    "d13_agg_salted",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           """ + fsum_sql("value", "total_value") + """,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def d13_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salts = 16
    ev = load(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts))
    )
    # the salted two-stage sum carries the non-finite tallies through the
    # partial stage so the final CASE reproduces fsum's IEEE semantics
    # (any NaN -> NaN, mixed Inf -> NaN, signed Inf wins) — the decimal
    # partial sums only ever see finite values
    v = F.col("value")
    pinf, ninf = F.lit(float("inf")), F.lit(float("-inf"))
    finite = ~F.isnan(v) & (v > ninf) & (v < pinf)
    partial = ev.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("p_n"),
        F.count(F.when(F.isnan(v), 1)).alias("p_nan"),
        F.count(F.when(v == pinf, 1)).alias("p_pinf"),
        F.count(F.when(v == ninf, 1)).alias("p_ninf"),
        F.sum(F.when(finite, v).cast("decimal(30,6)")).alias("p_sum"),
        F.max("value").alias("p_max"),
    )
    n_nan = F.sum("p_nan")
    n_pinf = F.sum("p_pinf")
    n_ninf = F.sum("p_ninf")
    total = (
        F.when(n_nan > 0, F.lit(float("nan")))
        .when((n_pinf > 0) & (n_ninf > 0), F.lit(float("nan")))
        .when(n_pinf > 0, pinf)
        .when(n_ninf > 0, ninf)
        .otherwise(F.sum("p_sum").cast("double"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("p_n").alias("n_events"),
        total.alias("total_value"),
        F.max("p_max").alias("max_value"),
    )


# --------------------------------------------------------------------------
# D14 — approx_percentile (t-digest-style sketch). Same discipline as D4:
# sketch values differ across engines, so the hash-checked surface is
# (exact percentile, sketch-within-bound boolean); the sketch still runs
# and feeds the boolean. 5% relative error is far beyond the sketch's
# expected error at accuracy=10000, so a trip means a broken sketch.
# --------------------------------------------------------------------------


@query(
    "d14_agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.90), 6) AS exact_p90,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d14_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.90)"), 6).alias("exact_p90"),
        F.expr("approx_percentile(l_extendedprice, 0.90, 10000)").alias("approx_p90"),
        F.count(F.lit(1)).alias("n"),
    )
    # the 5%-relative bound only models the sketch on groups with enough
    # mass: below 100 rows the sketch returns a raw element while the
    # exact percentile interpolates BETWEEN elements, so their gap is a
    # property of the data (element spacing), not the sketch — trivially
    # TRUE there, genuinely asserted on real groups (--extreme sweep fix)
    return agg.select(
        "l_returnflag",
        "exact_p90",
        F.when(F.col("n") < 100, F.lit(True))
        .otherwise(
            F.abs(F.col("approx_p90") - F.col("exact_p90")) / F.col("exact_p90")
            <= 0.05
        )
        .alias("within_bound"),
    )


# --- D15: explicit GROUPING SETS (finer than rollup/cube) ---------------------


@query(
    "d15_agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {dsum_sql("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    HAVING NOT (GROUPING(l_returnflag) = 1 AND GROUPING(l_linestatus) = 1
                AND COUNT(*) = 0)
    """,
)
def d15_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form D6 rollup / D7 cube are
    sugar for (Spark 4 `df.groupingSets`).  One Expand node multiplies
    each input row per grouping set, then a single hash aggregation:
    same one-shuffle shape as a plain groupBy, input inflated ×3."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupingSets(
        [[F.col("l_returnflag"), F.col("l_linestatus")], [F.col("l_returnflag")], []],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    ).agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity", "sum_qty"))


# --- D17: heavy hitters (Misra-Gries candidates + exact recount) --------------


@query(
    "d17_heavy_hitters",
    # Oracle = EXACT top-10: the sketch must reproduce it exactly
    # (coverage guarantee holds — 10th word freq ≫ n_tokens/capacity).
    oracle="""
    SELECT w AS item, COUNT(*) AS cnt
    FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY cnt DESC, item
    LIMIT 10
    """,
)
def d17_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent tokens via a distributed Misra-Gries
    sketch: per-task m-counter summaries (mapInPandas, map-only),
    counter-sum merge (shuffles #tasks×m sketch rows, never the
    corpus), then an exact recount of the surviving candidates — so
    the answer is exact, not approximate, whenever the k-th frequency
    exceeds n/m (operators/sketches.py has the bound arithmetic)."""
    from ..operators.sketches import heavy_hitters

    tok = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    return heavy_hitters(tok, "w", k=10, capacity=256)


# --- D18: equi-width histogram ------------------------------------------------

_BUCKET_W = 30000


@query(
    "d18_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {_BUCKET_W}) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           {dsum_sql("o_totalprice", "total")}
    FROM orders
    GROUP BY bucket
    """,
)
def d18_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: one hash aggregate on the
    computed bucket key — the profiling primitive behind range
    partition sizing and skew diagnosis.  Map-side partial aggregation
    compresses each task to ≤ #buckets rows before the shuffle."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / _BUCKET_W).cast("long")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


# --- D19: mergeable HLL sketches (per-shard build, union, estimate) -----------


@query(
    "d19_hll_merge",
    # Oracle: the exact cardinality + literal TRUE — same discipline as
    # d4/d14: the sketch estimate is asserted within bound, the exact
    # value is hash-compared.
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS within_bound
    FROM orders
    """,
)
def d19_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    built into Spark 4): each order-status shard builds its OWN sketch
    (`hll_sketch_agg`), the binary sketches union (`hll_union_agg`),
    and the estimate of the union is bound-checked against the exact
    count.  Mergeability is the 100 TB point: per-partition/per-day
    sketches persist as bytes and any rollup (day→month→year,
    shard→global) is a cheap union over kilobytes — the corpus is
    scanned once, ever.  (The exact count here is the oracle anchor;
    production reads only the sketch.)"""
    o = load(spark, sf_dir, "orders")
    shard = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
    )
    merged = shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return exact.crossJoin(merged).select(
        "exact_distinct",
        # empty input: a sketch of nothing estimating 0 is within bound
        # (the relative-error form divides by zero there)
        F.when(F.col("exact_distinct") == 0, F.col("approx") == 0.0)
        .otherwise(
            F.abs(F.col("approx") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        )
        .alias("within_bound"),
    )


# --- D20: unpivot / melt (wide metrics → long rows) ---------------------------


@query(
    "d20_unpivot",
    # The oracle writes the melt longhand (UNION ALL) — the portable
    # formulation of UNPIVOT.
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
    """,
)
def d20_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the inverse of D12's pivot — wide per-group
    metric columns become (group, metric, value) long rows via
    `df.unpivot`, which plans as one Expand node (each input row
    multiplied per metric), not a self-union: the wide aggregate is
    computed ONCE and fanned out, where the UNION ALL formulation the
    oracle uses would re-scan it per metric."""
    l = load(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        dsum("l_discount", "sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "value"
    )


# --- D21: bitmap-sketch exact distinct count ----------------------------------


@query(
    "d21_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def d21_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark's bitmap aggregate family
    (`bitmap_bucket_number` / `bitmap_bit_position` /
    `bitmap_construct_agg` / `bitmap_count`) — the partial-aggregatable
    alternative to `COUNT(DISTINCT)`'s expand-and-reshuffle plan.  Each
    (group, bucket) builds a fixed 4 KB bitmap map-side; the shuffle
    carries one bitmap per (group, bucket) instead of every distinct
    value, then per-group counts sum bucket cardinalities.  At 100 TB
    over a dense integer key space this is the plan of choice: shuffle
    volume is bounded by key-range/32768 bitmaps, not by row count.
    The oracle is plain COUNT(DISTINCT) — the bitmap path must be
    value-exact, unlike d4/d19's approximate HLL tier."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("d21_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(SUM(bucket_cnt) AS BIGINT) AS n_cust
        FROM (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bucket,
                 bitmap_count(bitmap_construct_agg(
                     bitmap_bit_position(o_custkey))) AS bucket_cnt
          FROM d21_orders
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        GROUP BY o_orderpriority
        """
    )


# --- D22: count-min sketch (mergeable frequency sketch) -----------------------

_CM_DEPTH = 3
_CM_WIDTH = 64
_CM_PROBES = (1, 2, 3, 5, 8, 13, 21)


@query(
    "d22_count_min_sketch",
    oracle=f"""
    WITH fan AS (
      SELECT o_custkey AS k, j
      FROM orders, UNNEST([0, 1, 2]) AS s(j)
    ),
    cells AS (
      SELECT j,
             CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                                      || CAST(k AS VARCHAR)), 1, 4))
                  AS INT) % {_CM_WIDTH} AS b,
             COUNT(*) AS cnt
      FROM fan GROUP BY 1, 2
    ),
    probes AS (SELECT unnest([{", ".join(map(str, _CM_PROBES))}]) AS custkey),
    est AS (
      SELECT p.custkey, MIN(c.cnt) AS cm_estimate
      FROM probes p JOIN cells c
        ON c.b = CAST(('0x' || substr(md5(CAST(c.j AS VARCHAR) || ':'
                                         || CAST(p.custkey AS VARCHAR)),
                                      1, 4)) AS INT) % {_CM_WIDTH}
      GROUP BY p.custkey
    ),
    ex AS (
      SELECT o_custkey AS custkey, COUNT(*) AS exact_cnt
      FROM orders GROUP BY 1
    )
    SELECT e.custkey,
           COALESCE(ex.exact_cnt, 0) AS exact_cnt,
           e.cm_estimate,
           e.cm_estimate >= COALESCE(ex.exact_cnt, 0) AS is_overestimate
    FROM est e LEFT JOIN ex USING (custkey)
    """,
)
def d22_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over order
    custkeys: a 3x64 counter grid whose cells are
    SUM-mergeable across partitions — the constant-size frequency
    sketch that answers point queries at any stream size, always
    OVER-estimating (one-sided error), never under.

    Engine-portability: the d row-hashes are md5-derived (j:key), so
    both engines land every key in the same cells; the estimate
    MIN-reduces one cell per row.

    Plan: one map-only x3 fan-out (explode of a literal
    array), ONE keyed agg onto the fixed 192-cell grid (map-side
    partials absorb the fan-out — this is the whole scale story: the
    shuffle carries at most d*w rows per mapper regardless of input
    size), then a broadcast probe join for the fixed query set plus an
    exact count for the verify columns.  At 100 TB the sketch build
    cost is the scan; the sketch itself stays 192 longs.
    """
    fan = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .select(
            "k",
            F.explode(
                F.array(*[F.lit(j) for j in range(_CM_DEPTH)])
            ).alias("j"),
        )
    )
    cell = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % _CM_WIDTH
    )
    cells = (
        fan.withColumn("b", cell)
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = spark.createDataFrame(
        [(k,) for k in _CM_PROBES], "custkey bigint"
    )
    probe_cell = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("custkey").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % _CM_WIDTH
    )
    est = (
        probes.crossJoin(F.broadcast(cells))
        .filter(F.col("b") == probe_cell)
        .groupBy("custkey")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    ex = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return est.join(ex, "custkey", "left").select(
        "custkey",
        F.coalesce("exact_cnt", F.lit(0)).alias("exact_cnt"),
        "cm_estimate",
        (
            F.col("cm_estimate") >= F.coalesce("exact_cnt", F.lit(0))
        ).alias("is_overestimate"),
    )


# --- D23: deterministic MODE aggregate (most-frequent with tiebreak) ----------


@query(
    "d23_agg_mode",
    oracle="""
    WITH counted AS (
      SELECT p_type, p_brand, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY p_type
                                ORDER BY COUNT(*) DESC, p_brand) AS rk
      FROM part
      -- mode is over NON-NULL values (SQL mode() semantics): a NULL
      -- brand is a missing observation, not a candidate winner (fuzz)
      WHERE p_brand IS NOT NULL
      GROUP BY p_type, p_brand
    )
    SELECT p_type, p_brand AS mode_brand, n AS mode_count
    FROM counted WHERE rk = 1
    """,
)
def d23_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE per group with a DETERMINISTIC tiebreak — both Spark's and
    DuckDB's native ``mode()`` pick an arbitrary winner on count ties,
    which is exactly the kind of engine-dependent nondeterminism a
    verified pipeline can't ship.  The portable form is count + rank
    with an explicit ``(count DESC, value ASC)`` order.

    Shape: one keyed aggregation then a per-group top-1 window — the
    count table is already grouped, so the window input is |groups × 
    distinct values|, far smaller than the fact table.  At 100 TB both
    shuffles key on p_type; the count pre-aggregation is map-side
    partial, making the window stage's input the bounded distinct-pair
    set, never raw rows."""
    from pyspark.sql.window import Window

    counted = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand").isNotNull())
        .groupBy("p_type", "p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("p_type").orderBy(F.col("n").desc(), F.col("p_brand"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_type", F.col("p_brand").alias("mode_brand"), F.col("n").alias("mode_count"))
    )


# --- D24: modern SQL aggregate family (max_by / count_if / bool aggs) ---------


@query(
    "d24_modern_aggs",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000.0) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0.0) AS all_positive,
           bool_or(o_totalprice > 400000.0) AS any_jumbo,
           max_by(o_orderkey, o_totalprice ORDER BY o_orderkey) AS top_order,
           min_by(o_orderkey, o_totalprice ORDER BY o_orderkey)
             AS bottom_order,
           arg_max(o_custkey, o_totalprice ORDER BY o_orderkey) AS top_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def d24_modern_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern-SQL aggregate family in one pass: ``count_if``,
    ``bool_and``/``bool_or`` and ``max_by``/``min_by`` (argmax/argmin)
    — the functions that replace four separate self-join idioms with
    single aggregate expressions (pre-2020 SQL needed a join back to
    find "the orderkey OF the max price").

    Determinism note: on a price TIE, ``max_by``'s winner is
    engine-arbitrary, so both sides break ties identically by
    aggregating over a (price, orderkey) struct — argmax of the pair —
    which the oracle mirrors with DuckDB's ORDER BY variant.  One hash
    aggregation, map-side partials, no joins; at 100 TB this is the
    cheapest possible "per-group extremes + predicates" report."""
    o = load(spark, sf_dir, "orders")
    # tie-safe argmax/argmin: order by (price, key) pairs.  The pair is
    # NULL whenever the price is (--nulls sweep): a bare struct is never
    # NULL even when its first field is, so a NULL-price row would win
    # the argmax on Spark while DuckDB's max_by ignores NULL ordering
    # values — gating the struct pins the shared "NULL price cannot be
    # an extreme" semantics (an all-NULL group yields NULL on both).
    has_price = F.col("o_totalprice").isNotNull()
    pk = F.when(has_price, F.struct(F.col("o_totalprice"), F.col("o_orderkey")))
    pk_min = F.when(
        has_price,
        F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk")),
    )
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_jumbo"),
        F.max_by("o_orderkey", pk_min).alias("top_order"),
        F.min_by("o_orderkey", pk).alias("bottom_order"),
        F.max_by("o_custkey", pk_min).alias("top_cust"),
    )


# --- D25: pairwise correlation matrix -----------------------------------------

_D25_PAIRS = (
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
)


@query(
    "d25_corr_matrix",
    oracle="""
    WITH c AS (SELECT
    """
    + ",\n".join(
        f"      CAST(ROUND({_safe_corr_sql(x, y)} * 1e6) AS BIGINT) AS c{i}"
        for i, (x, y) in enumerate(_D25_PAIRS)
    )
    + """
      FROM lineitem)
    """
    + "\n    UNION ALL\n".join(
        f"    SELECT '{x}' AS col_x, '{y}' AS col_y, c{i} AS corr_micro FROM c"
        for i, (x, y) in enumerate(_D25_PAIRS)
    ),
)
def d25_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem numeric
    columns — the standard profiling/feature-selection pass before any
    model fit.  All 6 upper-triangle pairs are computed in ONE hash
    aggregation over a single scan (each ``corr`` keeps its own
    (n, Σx, Σy, Σxy, Σx², Σy²) moments; map-side partial merge), then
    pivoted to long form driver-free with ``stack``.  Emitted as
    integer micro-units (round-then-cast on BOTH engines) per the
    round-3 float discipline.  At 100 TB: one scan, zero shuffles
    beyond the 1-row global agg."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [
        F.round(_safe_corr(x, y) * 1e6).cast("bigint").alias(f"c{i}")
        for i, (x, y) in enumerate(_D25_PAIRS)
    ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{x}', '{y}', c{i}" for i, (x, y) in enumerate(_D25_PAIRS)
    )
    return wide.select(
        F.expr(
            f"stack({len(_D25_PAIRS)}, {stack_args}) AS (col_x, col_y, corr_micro)"
        )
    )


# --- D26: linear-regression aggregate family ----------------------------------


@query(
    "d26_regr_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS regr_n,
           CAST(ROUND(regr_slope(l_extendedprice, l_quantity) * 1000)
                AS BIGINT) AS slope_milli,
           CAST(ROUND(regr_intercept(l_extendedprice, l_quantity) * 1000)
                AS BIGINT) AS icept_milli,
           CAST(ROUND(regr_r2(l_extendedprice, l_quantity) * 1000000)
                AS BIGINT) AS r2_micro,
           CAST(ROUND("""
    + _safe_corr_sql("l_extendedprice", "l_quantity")
    + """ * 1000000)
                AS BIGINT) AS corr_micro
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d26_regr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-2003 linear-regression aggregate family in one grouped
    pass: ``regr_count`` / ``regr_slope`` / ``regr_intercept`` /
    ``regr_r2`` + ``corr`` of extended price on quantity per return
    flag — the in-database OLS surface BI layers translate trend lines
    into (reference file:line n/a — empty tree §0.1).

    Each aggregate keeps O(1) moments (n, Σx, Σy, Σxy, Σx², Σy²) with
    map-side partial merge — one scan, one shuffle on the 3-value group
    key, no UDF.  Float discipline: both engines' kernels are
    numerically stable with ~1e-12 relative drift; slope/intercept are
    emitted as integer milli-units and r²/corr as micro-units
    (round-then-cast on BOTH engines), putting the rounding boundary
    ≥1e5 drift-widths away from every value.  At 100 TB the shape is
    unchanged: partial aggregation absorbs the scan fan-in.
    """
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("regr_n"),
        F.round(F.regr_slope(y, x) * 1000).cast("bigint").alias("slope_milli"),
        F.round(F.regr_intercept(y, x) * 1000).cast("bigint").alias("icept_milli"),
        F.round(F.regr_r2(y, x) * 1e6).cast("bigint").alias("r2_micro"),
        F.round(_safe_corr(y, x) * 1e6).cast("bigint").alias("corr_micro"),
    )


# --- D27: listagg / string_agg ordered-set aggregate --------------------------


@query(
    "d27_listagg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT c_name, '|' ORDER BY c_name) AS top_names,
           COUNT(*) AS n_rows
    FROM customer
    WHERE c_acctbal > 9900
    GROUP BY c_mktsegment
    """,
)
def d27_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``LISTAGG(DISTINCT … ) WITHIN GROUP (ORDER BY …)`` (SQL:2016,
    Spark 4 SPARK-42746) — the ordered string concatenation aggregate
    report layers use for 'show the members of each group' columns;
    DuckDB's twin is ``string_agg(DISTINCT … ORDER BY …)``.  The
    explicit WITHIN GROUP order makes the output deterministic, so the
    string value itself is hash-comparable cross-engine (same reason
    d8/k27 sort before serializing).  The high-balance filter keeps
    per-group strings bounded; at 100 TB an unfiltered listagg is the
    anti-pattern — concat grows with group size, so production use
    always pairs it with a selective filter or top-k guard, which is
    part of what this entry documents.
    """
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 9900)
        .groupBy("c_mktsegment")
        .agg(
            F.expr(
                "listagg(DISTINCT c_name, '|') WITHIN GROUP (ORDER BY c_name)"
            ).alias("top_names"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- D28: geometric mean (log-space aggregate) --------------------------------


@query(
    "d28_geomean",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(ROUND(EXP(
             CAST(SUM(CAST(ROUND(LN(l_extendedprice / l_quantity), 6)
                           AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
           ) * 1000) AS BIGINT) AS geomean_unit_price_milli
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_returnflag
    """,
)
def d28_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of unit price per return flag — the
    multiplicative average price indices use (arithmetic means
    overweight expensive items), computed as exp(mean(ln x)) since no
    engine ships a product() that survives 10⁵ factors without
    overflow.  Float discipline: each ln is rounded to 6 dp (1-ulp
    cross-engine libm drift crushed), the log-sum runs as an EXACT
    decimal aggregate (order-independent), and the final exp runs on
    an identical double both sides before milli-unit emission.  One
    scan, one 3-group agg with map-side partials — scale-free.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    ln6 = F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.exp(
                F.sum(ln6.cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            )
            * 1000
        )
        .cast("bigint")
        .alias("geomean_unit_price_milli"),
    )


# --- D29: higher moments (skewness / excess kurtosis) --------------------------

# Spark's skewness/kurtosis are population estimators; DuckDB's carry
# sample bias corrections — the built-ins can never hash-match. Both
# sides therefore compute from the SAME exact decimal power sums
# (Σx, Σx², Σx³, Σx⁴; per-row powers are identical IEEE doubles), so
# every derived value divides identical doubles.  Exact sums remove the
# ACCUMULATION error of raw power sums, but the derived central moments
# still subtract in doubles, so a constant-valued group cancels to a
# tiny NEGATIVE variance — clamped at 0 below (same guard as d30).


@query(
    "d29_higher_moments",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(value * value * value AS DECIMAL(38,6)))
                  AS DOUBLE) AS s3,
             CAST(SUM(CAST(value * value * value * value AS DECIMAL(38,6)))
                  AS DOUBLE) AS s4
      FROM events WHERE isfinite(value) GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(ROUND(
             ((s3 - 3 * (s1 / n) * s2) / n + 2 * POW(s1 / n, 3))
             / POW(GREATEST(s2 / n - POW(s1 / n, 2), 0), 1.5) * 1000000)
             AS BIGINT) AS skew_micro,
           CAST(ROUND(
             (((s4 - 4 * (s1 / n) * s3 + 6 * POW(s1 / n, 2) * s2) / n
               - 3 * POW(s1 / n, 4))
              / POW(GREATEST(s2 / n - POW(s1 / n, 2), 0), 2) - 3) * 1000000)
             AS BIGINT) AS excess_kurtosis_micro
    FROM m
    """,
)
def d29_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of event values per
    type — distribution-shape diagnostics (heavy tails flag bot
    traffic; skew drift flags instrumentation bugs) computed one-pass
    from exact decimal power sums with map-side partial merge.  See
    the module comment: the power sums are exact, so the central-
    moment algebra runs on bit-identical doubles on both engines and
    the classic cancellation hazard of the raw-sums formulation does
    not apply.  One scan, one 5-group shuffle — scale-free.
    """
    # moments of NaN/Inf observations are undefined — non-finite values
    # are excluded on BOTH engines before the exact power sums, whose
    # decimal casts would otherwise throw (--extreme sweep convention)
    e = load(spark, sf_dir, "events").filter(
        "NOT (isnan(value) OR value = CAST('Infinity' AS DOUBLE)"
        " OR value = CAST('-Infinity' AS DOUBLE))"
    )
    v = F.col("value")

    def psum(expr, name):
        return F.sum(expr.cast("decimal(38,6)")).cast("double").alias(name)

    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        psum(v, "s1"),
        psum(v * v, "s2"),
        psum(v * v * v, "s3"),
        psum(v * v * v * v, "s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    # the variance DERIVED from exact sums still runs s2/n - mu² in
    # doubles, which cancels to a tiny NEGATIVE on constant-valued
    # groups (d30's 0.1×2 case) — pow(-ε, 1.5) is NaN and the micro
    # cast then throws on BOTH engines.  Clamp at 0 (the true value)
    # and NULL the moments via try_divide: skew/kurtosis of a
    # zero-variance distribution is undefined, and DuckDB's x/0 → NULL
    # needs Spark's ANSI divide-by-zero error explicitly bypassed.
    var = F.greatest(s2 / n - F.pow(mu, 2), F.lit(0.0))
    skew = F.try_divide(
        (s3 - 3 * mu * s2) / n + 2 * F.pow(mu, 3), F.pow(var, 1.5)
    )
    kurt = (
        F.try_divide(
            (s4 - 4 * mu * s3 + 6 * F.pow(mu, 2) * s2) / n
            - 3 * F.pow(mu, 4),
            F.pow(var, 2),
        )
        - 3
    )
    return m.select(
        "event_type",
        "n",
        F.round(skew * 1e6).cast("bigint").alias("skew_micro"),
        F.round(kurt * 1e6).cast("bigint").alias("excess_kurtosis_micro"),
    )


# --- D30: Welch's two-sample t-test --------------------------------------------


@query(
    "d30_welch_ttest",
    oracle="""
    WITH m AS (
      SELECT
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS n1,
        CAST(SUM(CAST(value AS DECIMAL(38,6)))
             FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS s1a,
        CAST(SUM(CAST(value * value AS DECIMAL(38,6)))
             FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS s2a,
        COUNT(*) FILTER (WHERE event_type = 'click') AS n2,
        CAST(SUM(CAST(value AS DECIMAL(38,6)))
             FILTER (WHERE event_type = 'click') AS DOUBLE) AS s1b,
        CAST(SUM(CAST(value * value AS DECIMAL(38,6)))
             FILTER (WHERE event_type = 'click') AS DOUBLE) AS s2b
      FROM events
      WHERE isfinite(value)
    )
    SELECT n1, n2,
           CAST(ROUND((s1a / n1 - s1b / n2) /
             SQRT(GREATEST((s2a - s1a * s1a / n1) / (n1 - 1), 0) / n1
                + GREATEST((s2b - s1b * s1b / n2) / (n2 - 1), 0) / n2)
             * 1000000) AS BIGINT) AS t_micro,
           CAST(ROUND(
             POW(GREATEST((s2a - s1a * s1a / n1) / (n1 - 1), 0) / n1
               + GREATEST((s2b - s1b * s1b / n2) / (n2 - 1), 0) / n2, 2)
             / (POW(GREATEST((s2a - s1a * s1a / n1) / (n1 - 1), 0) / n1, 2)
                  / (n1 - 1)
              + POW(GREATEST((s2b - s1b * s1b / n2) / (n2 - 1), 0) / n2, 2)
                  / (n2 - 1))
             * 1000) AS BIGINT) AS welch_dof_milli
    FROM m
    """,
)
def d30_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test: does mean purchase
    value differ from mean click value?  Emits the t statistic and the
    Welch–Satterthwaite degrees of freedom — the numeric core of the
    experiment readout q25's chi-square covers for categories (p-value
    lookup is a client-side table).  All inputs derive from exact
    decimal power sums in ONE conditional-aggregation scan (no
    self-join, no second pass), so both engines run identical-double
    arithmetic; micro/milli emission is formality.  Map-side partials
    absorb the scan — scale-free.
    """
    # a t-test over NaN/Inf observations is undefined — non-finite
    # values are excluded on BOTH engines before the power sums, whose
    # decimal casts would otherwise throw (--extreme sweep convention)
    e = load(spark, sf_dir, "events").filter(
        "NOT (isnan(value) OR value = CAST('Infinity' AS DOUBLE)"
        " OR value = CAST('-Infinity' AS DOUBLE))"
    )
    v = F.col("value")

    def csum(expr, cond, name):
        return (
            F.sum(F.when(F.col("event_type") == cond, expr).cast("decimal(38,6)"))
            .cast("double")
            .alias(name)
        )

    m = e.agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n1"),
        csum(v, "purchase", "s1a"),
        csum(v * v, "purchase", "s2a"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n2"),
        csum(v, "click", "s1b"),
        csum(v * v, "click", "s2b"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    s1a, s2a, s1b, s2b = (F.col(c) for c in ("s1a", "s2a", "s1b", "s2b"))
    # sample variance is ≥ 0 mathematically, but the power-sum form can
    # go tiny-NEGATIVE by float cancellation when a group's values are
    # (near-)constant — Spark sqrt(-ε) yields NaN while DuckDB SQRT
    # throws.  Clamp the variance (not the sum) at 0 on BOTH sides so
    # the engines stay value-identical on any data.  Every division
    # whose denominator can reach 0 on degenerate groups (n = 1 → n-1,
    # n = 0 → /n, both groups constant → /sqrt(0)) goes through
    # try_divide: Spark's ANSI mode THROWS on double x/0 while DuckDB
    # returns NULL, so the NULL flow must be explicit Spark-side.
    va = F.try_divide(
        F.greatest(F.try_divide(s2a - s1a * s1a / n1, n1 - 1), F.lit(0.0)),
        n1,
    )
    vb = F.try_divide(
        F.greatest(F.try_divide(s2b - s1b * s1b / n2, n2 - 1), F.lit(0.0)),
        n2,
    )
    t = F.try_divide(s1a / n1 - s1b / n2, F.sqrt(va + vb))
    dof = F.try_divide(
        F.pow(va + vb, 2),
        F.try_divide(F.pow(va, 2), n1 - 1)
        + F.try_divide(F.pow(vb, 2), n2 - 1),
    )
    return m.select(
        "n1",
        "n2",
        F.round(t * 1e6).cast("bigint").alias("t_micro"),
        F.round(dof * 1000).cast("bigint").alias("welch_dof_milli"),
    )


# --- D31: bootstrap confidence interval (deterministic resampling) -------------

_D31_B = 20  # bootstrap replicates


@query(
    "d31_bootstrap_ci",
    oracle=f"""
    WITH indexed AS (
      SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    grid AS (
      SELECT b.b, i.i,
             1 + CAST(CONCAT('0x', substr(md5(CAST(b.b AS VARCHAR) || ':'
                     || CAST(i.i AS VARCHAR)), 1, 15)) AS BIGINT)
                 % (SELECT MAX(n) FROM indexed) AS pick
      FROM (SELECT unnest(generate_series(1, {_D31_B})) AS b) b
      CROSS JOIN (SELECT unnest(generate_series(1,
                    (SELECT MAX(n) FROM indexed))) AS i) i
    ),
    reps AS (
      SELECT g.b,
             CAST(SUM(x.n_chars) AS DOUBLE) / COUNT(*) AS rep_mean
      FROM grid g JOIN indexed x ON x.rn = g.pick
      GROUP BY g.b
    )
    SELECT COUNT(*) AS n_replicates,
           CAST(ROUND((SELECT CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)
                       FROM documents) * 1000) AS BIGINT)
             AS point_mean_milli,
           CAST(ROUND(quantile_cont(rep_mean, 0.025) * 1000) AS BIGINT)
             AS ci_lo_milli,
           CAST(ROUND(quantile_cont(rep_mean, 0.975) * 1000) AS BIGINT)
             AS ci_hi_milli
    FROM reps
    """,
)
def d31_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95 % confidence interval for mean document length —
    distribution-free uncertainty quantification, the resampling
    workhorse analytics teams reach for when normality is doubtful.
    {_D31_B} replicates each redraw N docs WITH REPLACEMENT; the draw
    index is md5(b:i)-derived (the k28 trick), so BOTH engines select
    the exact same resample — no engine RNG, fully hash-checkable,
    and at cluster scale the draw grid is generated executor-side.

    Exactness: replicate means are integer sums / counts (identical
    doubles), and the percentile-over-{_D31_B}-replicates uses the
    shared linear-interpolation definition (d10/t3 pairing).  Plan:
    the B×N grid is a map-only generate + one hash join on the row
    index + a B-group agg — linear in B·N with no all-pairs anywhere.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    indexed = d.select(
        "n_chars",
        F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
    )
    n_docs = d.count()  # driver scalar: bounds the generated grid only
    grid = (
        spark.range(1, _D31_B + 1)
        .toDF("b")
        .select(
            "b",
            F.explode(F.sequence(F.lit(1), F.lit(n_docs))).alias("i"),
        )
        .select(
            "b",
            (
                1
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(":", F.col("b"), F.col("i"))
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                # max(n_docs, 1): on an EMPTY corpus the mod would be % 0
                # (ANSI throw); with divisor 1 every pick is 1 and the
                # rn-join against the empty indexed relation produces the
                # oracle's zero replicates (empty-corpus sweep, r8)
                % max(n_docs, 1)
            ).alias("pick"),
        )
    )
    reps = (
        grid.join(indexed, grid.pick == indexed.rn)
        .groupBy("b")
        .agg(
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "rep_mean"
            )
        )
    )
    point = d.agg(
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("pm")
    )
    return reps.crossJoin(F.broadcast(point)).agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.first("pm") * 1000).cast("bigint").alias("point_mean_milli"),
        F.round(F.expr("percentile(rep_mean, 0.025)") * 1000)
        .cast("bigint")
        .alias("ci_lo_milli"),
        F.round(F.expr("percentile(rep_mean, 0.975)") * 1000)
        .cast("bigint")
        .alias("ci_hi_milli"),
    )


# --- D32: exact weighted median ------------------------------------------------


@query(
    "d32_weighted_median",
    oracle="""
    WITH pricew AS (
      SELECT l_returnflag, l_extendedprice / l_quantity AS unit_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS w
      FROM lineitem
      -- price NULL -> no unit price; the NULL price level would
      -- otherwise shift the cumulative crossing (NULLS FIRST vs LAST)
      WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL
      GROUP BY l_returnflag, unit_price
    ),
    cum AS (
      SELECT l_returnflag, unit_price, w,
             CAST(SUM(CAST(w AS DECIMAL(30,6))) OVER (
               PARTITION BY l_returnflag ORDER BY unit_price
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cw,
             CAST(SUM(CAST(w AS DECIMAL(30,6))) OVER (
               PARTITION BY l_returnflag) AS DOUBLE) AS tw
      FROM pricew
    )
    SELECT l_returnflag,
           ROUND(MIN(CASE WHEN cw >= tw / 2 THEN unit_price END), 6)
             AS weighted_median_price,
           CAST(COUNT(*) AS BIGINT) AS n_price_points
    FROM cum
    GROUP BY l_returnflag
    """,
)
def d32_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median unit price per return flag — the
    'median dollar' statistic (half the volume trades below it), which
    no engine ships built-in: implemented as the cumulative-weight
    crossing point (first price whose running weight reaches half the
    total).  Weights aggregate exactly in decimal, the running/total
    sums run as exact decimal window aggregates over the PRICE-LEVEL
    table (collapsed first — the cardinality discipline), and the
    crossing pick is a MIN over identical doubles.  Plan: one keyed
    agg, two windows on the collapsed table, one final agg.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & F.col("l_extendedprice").isNotNull()
    )
    pricew = li.groupBy(
        "l_returnflag",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(30,6)"))
        .cast("double")
        .alias("w")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("unit_price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = pricew.select(
        "l_returnflag",
        "unit_price",
        F.sum(F.col("w").cast("decimal(30,6)"))
        .over(w_cum)
        .cast("double")
        .alias("cw"),
        F.sum(F.col("w").cast("decimal(30,6)"))
        .over(w_all)
        .cast("double")
        .alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.round(
            F.min(
                F.when(F.col("cw") >= F.col("tw") / 2, F.col("unit_price"))
            ),
            6,
        ).alias("weighted_median_price"),
        F.count(F.lit(1)).cast("bigint").alias("n_price_points"),
    )
