"""§2.J UDF / UDAF / UDTF surface (SURVEY.md §2.J; reference file:line
n/a — empty tree §0.1).

Ladder, slowest→fastest (SURVEY §4 "UDFs are the slow path"):
J1 row-at-a-time Python UDF (Arrow-optimized in Spark 4, still the
escape hatch) → J2/J3 vectorized pandas UDFs (Series-at-a-time over
Arrow) → J4 grouped map → J5 mapInPandas (partition iterator) → J6
Python UDTF.  Every entry mirrors a pure-SQL formulation so the driver
hash-checks Python results against Catalyst-free DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..catalog import load
from ..registry import query

# --- J1: scalar Python UDF (row-at-a-time; Arrow-optimized) -------------------


@query(
    "j1_python_udf",
    oracle="""
    SELECT o_orderkey,
           -- explicit NULL arm first: a bare ELSE would sweep NULL
           -- prices into 'high' while the Python UDF returns 'unknown'
           CASE WHEN o_totalprice IS NULL THEN 'unknown'
                WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS tier
    FROM orders
    """,
)
def j1_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDF defined inside the builder: decorator return-type parsing needs an
    # active session, and queries must import session-free.
    @udf("string")
    def price_tier(total: float) -> str:
        if total is None:
            return "unknown"
        if total < 50_000:
            return "low"
        if total < 150_000:
            return "mid"
        return "high"

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", price_tier("o_totalprice").alias("tier"))


# --- J2: vectorized pandas UDF (Series → Series over Arrow batches) ------------


@query(
    "j2_pandas_udf_scalar",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 6) AS l2_norm
    FROM embeddings
    WHERE COALESCE(len(list_filter(embedding,
                    x -> x IS NULL OR NOT isfinite(x))) = 0, FALSE)
    """,
)
def j2_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def l2_norm_pdf(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy()).astype(np.float64)
        return pd.Series(np.round(np.sqrt((mat * mat).sum(axis=1)), 6))

    from ..functions.vectors import finite_vec

    # finite-vector convention (functions/vectors.py): a NaN norm cannot
    # round-trip the pandas-UDF output path (Arrow renders it NULL)
    e = load(spark, sf_dir, "embeddings").filter(finite_vec("embedding"))
    return e.select("vec_id", l2_norm_pdf("embedding").alias("l2_norm"))


# --- J3: grouped-aggregate pandas UDF (custom aggregate over Arrow) -------------


@query(
    "j3_pandas_udaf",
    # NULL balances are missing observations (fuzz sweep): the trim
    # ranks PRESENT values only (the kernel drops NaN — a NULL arrives
    # in the Arrow batch as NaN and np.sort would rank it last,
    # poisoning the core mean); an all-NULL group keeps its row with a
    # NULL trimmed mean via the distinct-keys left join.
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) AS rn,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      FROM customer
      WHERE c_acctbal IS NOT NULL
    ),
    trimmed AS (
      SELECT c_nationkey,
             ROUND(AVG(c_acctbal), 6) AS trimmed_mean_bal
      FROM ranked
      WHERE n <= 2 * CAST(FLOOR(n * 0.1) AS BIGINT)
         OR (rn > CAST(FLOOR(n * 0.1) AS BIGINT)
             AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT))
      GROUP BY c_nationkey
    )
    SELECT k.c_nationkey, t.trimmed_mean_bal
    FROM (SELECT DISTINCT c_nationkey FROM customer) k
    LEFT JOIN trimmed t
      ON k.c_nationkey IS NOT DISTINCT FROM t.c_nationkey
    """,
)
def j3_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def trimmed_mean(bal: pd.Series) -> float:
        # 10%-trimmed mean: a custom aggregate Catalyst has no builtin
        # for (the hint is required by pandas_udf; None → NULL is fine)
        v = bal.to_numpy(dtype=np.float64)
        v = np.sort(v[~np.isnan(v)])  # NULL->NaN members are not ranked
        if len(v) == 0:
            return None
        k = int(len(v) * 0.1)
        core = v[k : len(v) - k] if len(v) > 2 * k else v
        return float(np.round(core.mean(), 6))

    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        trimmed_mean("c_acctbal").alias("trimmed_mean_bal")
    )


# --- J4: grouped-map applyInPandas (whole-group DataFrame transform) --------------


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    bal = pdf["c_acctbal"].to_numpy(dtype=np.float64)
    # nan-aware moments (fuzz sweep): a NULL balance arrives in the
    # Arrow batch as NaN; SQL AVG/STDDEV_SAMP skip NULLs, so the kernel
    # skips NaN identically — the NaN row itself z-scores to NaN → NULL
    # out, matching the oracle's (NULL - mu)/sd.
    n_valid = int((~np.isnan(bal)).sum())
    mu = np.nanmean(bal) if n_valid else np.nan
    sd = np.nanstd(bal, ddof=1) if n_valid >= 2 else np.nan
    # degenerate group (constant values → sd = 0, single row → sd = NaN):
    # the z-score is undefined — emit NULL, matching the oracle's
    # x/0 → NULL and stddev_samp(1 row) → NULL semantics (a 0.0 here was
    # a silent cross-engine divergence; degenerate-sweep finding, r8).
    # pandas nullable Float64 arrives Spark-side as double-with-nulls.
    if sd > 0:
        z = pd.array(np.round((bal - mu) / sd, 6), dtype="Float64")
    else:
        z = pd.array([pd.NA] * len(bal), dtype="Float64")
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_nationkey": pdf["c_nationkey"],
            "bal_zscore": z,
        }
    )


@query(
    "j4_grouped_map",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 6)
             AS bal_zscore
    FROM customer
    """,
)
def j4_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        _zscore_group, "c_custkey bigint, c_nationkey int, bal_zscore double"
    )


# --- J5: mapInPandas (partition-wise iterator; powers the A4 REST fetch) -----------


@query(
    "j5_map_in_pandas",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_py,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_py
    FROM documents
    """,
)
def j5_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # nullable Int64: NULL text arrives as None and must leave
            # as NULL counts (bare int64 astype throws on NaN; --nulls)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars_py": pdf["text"].str.len().astype("Int64"),
                    "n_tokens_py": pdf["text"]
                    .str.split(" ")
                    .map(len, na_action="ignore")
                    .astype("Int64"),
                }
            )

    return d.mapInPandas(stats, "doc_id bigint, n_chars_py bigint, n_tokens_py bigint")


# --- J6: Python UDTF (one row in → many typed rows out; Spark 4) ---------------------


@query(
    "j6_python_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE doc_id % 50 = 0)
    SELECT doc_id,
           CAST(unnest(generate_series(0, len(toks) - 1)) AS INT) AS pos,
           unnest(toks) AS token
    FROM t
    """,
)
def j6_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string")
    class ExplodeTokens:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            if text is None:  # NULL text explodes to no tokens (fuzz)
                return
            for pos, token in enumerate(text.split(" ")):
                yield doc_id, pos, token

    d = load(spark, sf_dir, "documents").filter("doc_id % 50 = 0")
    d.createOrReplaceTempView("j6_docs_subset")
    spark.udtf.register("explode_tokens", ExplodeTokens)
    return spark.sql(
        "SELECT t.* FROM j6_docs_subset, "
        "LATERAL explode_tokens(doc_id, text) AS t"
    )


# --- J7: mapInArrow (zero-copy Arrow batch transform) -------------------------


@query(
    "j7_map_in_arrow",
    oracle="""
    SELECT o_orderkey,
           FLOOR(o_totalprice * 100.0) AS price_cents,
           -- explicit NULL arm: pyarrow's if_else propagates a NULL
           -- price to a NULL band; a bare ELSE would say 'normal'
           CASE WHEN o_totalprice IS NULL THEN NULL
                WHEN o_totalprice >= 150000.0 THEN 'high'
                ELSE 'normal' END AS price_band
    FROM orders
    """,
)
def j7_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.mapInArrow``: the lowest-overhead Python surface — batches
    arrive as pyarrow RecordBatches with NO pandas conversion, ideal
    for libraries that speak Arrow natively (vector math, tokenizers).
    The kernel uses pyarrow.compute only (IEEE-deterministic floor /
    multiply / comparison), so results hash-match the SQL oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            price = t.column("o_totalprice")
            yield pa.RecordBatch.from_arrays(
                [
                    t.column("o_orderkey").combine_chunks(),
                    pc.floor(pc.multiply(price, pa.scalar(100.0))).combine_chunks(),
                    pc.if_else(
                        pc.greater_equal(price, pa.scalar(150000.0)),
                        pa.scalar("high"),
                        pa.scalar("normal"),
                    ).combine_chunks(),
                ],
                names=["o_orderkey", "price_cents", "price_band"],
            )

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.mapInArrow(
        kernel, "o_orderkey bigint, price_cents double, price_band string"
    )


# --- J8: pandas UDAF as a WINDOW function (bounded frame) ---------------------


@query(
    "j8_pandas_window_udaf",
    # Arrow NaN<->NULL contract (events_streams.py SESSION_SQL_PANDAS):
    # a NULL price inside the frame arrives in pandas as NaN and
    # poisons mean() to NaN -> NULL out, where SQL AVG would skip it --
    # the oracle models the poisoning explicitly.  NULLS FIRST pins
    # Spark's ASC default for NULL order dates.
    oracle="""
    SELECT o_custkey, o_orderkey,
           CASE WHEN COUNT(*) OVER w != COUNT(o_totalprice) OVER w
                THEN NULL
                ELSE ROUND(AVG(o_totalprice) OVER w, 6) END AS roll_avg
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def j8_pandas_window_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pandas (grouped-agg) UDF evaluated as a WINDOW function over a
    bounded rows frame — the third way Python aggregates run in Spark
    (after groupBy agg j3 and applyInPandas j4): each frame's values
    arrive as one Arrow batch per row position, so custom rolling
    metrics get numpy vectorization without a self-join.

    The frame must be bounded for pandas window UDFs (Spark requirement
    — unbounded frames need the builtin path); total order inside each
    partition pins the frame contents cross-engine, and the ≤5-element
    mean is rounded 6 dp on both sides.  Oracle uses the builtin AVG
    over the identical frame — the UDAF must reproduce it exactly."""
    from pyspark.sql import Window

    @pandas_udf("double")
    def rolling_mean(v: pd.Series) -> float:
        return float(np.round(v.to_numpy(dtype=np.float64).mean(), 6))

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        rolling_mean("o_totalprice").over(w).alias("roll_avg"),
    )


# --- J9: grouped-map via applyInArrow (Arrow-native per-group kernels) --------


@query(
    "j9_apply_in_arrow",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
             AS total_spend,
           MAX(o_totalprice) AS max_order
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def j9_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy(...).applyInArrow`` (Spark 4): grouped-map over raw
    pyarrow Tables — the zero-pandas sibling of j4's applyInPandas for
    Arrow-native per-group logic.  The kernel mirrors a
    HAVING-filtered aggregation so the SQL oracle checks it
    value-for-value; the decimal sum is computed by casting the Arrow
    column to decimal128 before pc.sum (order-independent, the dsum
    discipline in Arrow form).

    Scale: one shuffle on the grouping key; the Python worker sees one
    group per Table — identical distribution to applyInPandas but
    without the pandas conversion tax on wide batches.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(table: "pa.Table") -> "pa.Table":
        n = table.num_rows
        if n < 3:
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "total_spend": pa.array([], pa.float64()),
                    "max_order": pa.array([], pa.float64()),
                }
            )
        price = table.column("o_totalprice")
        dec = price.cast(pa.decimal128(30, 6))
        # float(Decimal) is correctly rounded; Arrow's decimal→float64
        # cast is not (measured: off by one ulp vs DuckDB's cast)
        total = float(pc.sum(dec).as_py())
        return pa.table(
            {
                "o_custkey": pa.array(
                    [table.column("o_custkey")[0].as_py()], pa.int64()
                ),
                "n_orders": pa.array([n], pa.int64()),
                "total_spend": pa.array([total], pa.float64()),
                "max_order": pa.array([pc.max(price).as_py()], pa.float64()),
            }
        )

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return o.groupBy("o_custkey").applyInArrow(
        kernel,
        "o_custkey bigint, n_orders bigint, total_spend double, "
        "max_order double",
    )


# --- J10: iterator-of-series pandas UDF (amortized-init batch stream) ---------


@query(
    "j10_pandas_iter_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_quantity - 25.0) / 10.0, 6) AS qty_z
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def j10_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (`Iterator[pd.Series] ->
    Iterator[pd.Series]`): the third scalar-UDF evaluation mode after
    row-at-a-time (j1) and batch-at-a-time (j2).  The generator sees
    EVERY Arrow batch of a partition through one call, so expensive
    one-time state (a model handle, a codec table — here standing in
    as fixed normalization constants) is initialized once per
    partition stream, not once per batch — the pattern for ML-scoring
    UDFs at 100 TB where per-batch init would dominate.

    Arithmetic is fixed-constant affine, so the result is
    bit-identical to the SQL twin; rounding only at the edge.
    """
    mu, sigma = 25.0, 10.0

    @pandas_udf("double")
    def qty_z(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time "init" happens here, before the first batch arrives
        m, s = mu, sigma
        for b in batches:
            yield (b - m) / s

    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(qty_z(F.col("l_quantity")), 6).alias("qty_z"),
        )
    )


# --- J11: polymorphic Python UDTF (analyze-time schema) -----------------------


@query(
    "j11_polymorphic_udtf",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id,
           CAST(unnest(generate_series(0, len(toks) - 3)) AS INT) AS pos,
           toks[unnest(generate_series(0, len(toks) - 3)) + 1] || ' ' ||
           toks[unnest(generate_series(0, len(toks) - 3)) + 2] || ' ' ||
           toks[unnest(generate_series(0, len(toks) - 3)) + 3] AS gram_3
    FROM t WHERE len(toks) >= 3
    """,
)
def j11_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 `analyze()` static method,
    SPARK-44503): the OUTPUT SCHEMA is computed at plan time from a
    literal argument — `word_ngrams(text, 3)` emits a column literally
    named `gram_3`, `...(text, 2)` would emit `gram_2`.  This is the
    API for table functions whose shape depends on their call site
    (pivot-like explosions, configurable feature fans) without a
    stringly-typed schema parameter.

    The eval kernel is plain token slicing (engine-independent), so the
    3-gram call hash-matches the SQL oracle's positional-join n-gram
    build.  Scale: UDTFs run per-partition like any map — the lateral
    join fans out rows but never shuffles."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class WordNgrams:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument, n: AnalyzeArgument):
            if not n.isConstantExpression:
                raise ValueError("n must be a literal")
            width = int(n.value)
            return AnalyzeResult(
                StructType()
                .add("doc_id", LongType())
                .add("pos", IntegerType())
                .add(f"gram_{width}", StringType())
            )

        def eval(self, doc_id: int, text: str, n: int):  # noqa: ANN001
            if text is None:  # NULL text yields no n-grams (fuzz)
                return
            toks = text.split(" ")
            for pos in range(len(toks) - n + 1):
                yield doc_id, pos, " ".join(toks[pos : pos + n])

    spark.udtf.register("word_ngrams", udtf(WordNgrams))
    d = load(spark, sf_dir, "documents").filter("doc_id % 50 = 0")
    d.createOrReplaceTempView("j11_docs_subset")
    return spark.sql(
        "SELECT t.* FROM j11_docs_subset, "
        "LATERAL word_ngrams(doc_id, text, 3) AS t"
    )
