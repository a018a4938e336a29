"""SparkSession factory and runtime-config enforcement.

The driver creates its own SparkSession and passes it to ``entry()`` /
``queries()`` callables, so anything we need MUST be runtime-settable
(verified: ``spark.sql.legacy.parquet.nanosAsLong`` and
``spark.sql.session.timeZone`` both are).  ``ensure_runtime_configs`` is
therefore called from every table load (catalog.py) — it is idempotent
and cheap.

Scale notes (100 TB design point):
- AQE stays on (default in Spark 3.2+): runtime shuffle-partition
  coalescing + skew-join splitting is the main defense at 1000-executor
  scale; we never hand-pick per-query partition counts.
- ``shuffle.partitions`` here is only the *local test* default; on a
  real cluster it is set by the cluster conf (or AQE's
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime (non-static) SQL configs every engine session needs.
RUNTIME_CONFIGS: dict[str, str] = {
    # events.parquet stores timestamp[ns]; Spark 4 hard-errors without this
    # ([PARQUET_TYPE_ILLEGAL], measured — SURVEY §1.3). Read as long, then
    # catalog.py reconstructs µs timestamps.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Keep naive-timestamp semantics aligned with DuckDB (timezone-free).
    "spark.sql.session.timeZone": "UTC",
    # Arrow everywhere Python touches data: toPandas, pandas UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Adaptive execution: re-plan at shuffle boundaries (skew, coalesce).
    "spark.sql.adaptive.enabled": "true",
    # CSV corrupt-record routing (a19) must not depend on the query's
    # projection: with parser column pruning ON, a short-arity row is
    # flagged corrupt under a full parse but NOT under a pruned one
    # (measured — filter+count vs collect gave different is_corrupt).
    # Deterministic semantics beat the pruning win; CSV is an ingest
    # edge here, the analytic store is parquet (whose pruning this
    # does not touch).
    "spark.sql.csv.parser.columnPruning.enabled": "false",
}


def ensure_runtime_configs(spark: SparkSession) -> SparkSession:
    """Idempotently apply RUNTIME_CONFIGS to an externally-owned session."""
    for k, v in RUNTIME_CONFIGS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # static conf on some build — best effort
            pass
    return spark


def get_spark(
    app_name: str = "upc-sku-data-loader-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback
    ``local[*]``); on a real cluster pass ``master=None`` with the conf
    coming from spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # Small local fixtures: 200 default partitions is pure scheduling
        # overhead. AQE coalesces anyway; 32 matches local core count.
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Python-worker connect-back defaults to 15 s; a fork under a
        # heavily loaded host (concurrent pytest shards, loadavg ~30)
        # can exceed it and kill an otherwise-healthy streaming query
        # (observed once in tools/fast_pytest.py's 6-shard run). 60 s
        # costs nothing when idle and absorbs the spike.
        .config("spark.python.authenticate.socketTimeout", "60s")
    )
    # Static conf, so it only takes effect for the first session in a
    # process — exactly the concurrent-shard case it exists for
    # (tools/fast_pytest.py gives each pytest process its own warehouse
    # so a22's managed-table DDL can't race a sibling shard).
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if wh:
        builder = builder.config("spark.sql.warehouse.dir", wh)
    for k, v in RUNTIME_CONFIGS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_runtime_configs(spark)
