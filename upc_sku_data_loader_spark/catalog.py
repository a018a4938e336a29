"""Fixture-table catalog: schema-pinned loads of the driver's parquet.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet per table per
scale factor under ``/root/testdata/sf{0.001,0.01,0.1}``.

The one non-trivial load is ``events``: its ``ts`` column has shipped in
two physical encodings across fixture generations — parquet
timestamp[ns] (survey-era) and timestamp[µs] (current fixtures, measured
2026-08-13 via ``pyarrow.parquet.read_schema``).  The load dispatches on
the *landed* Spark type, so both encodings produce the same canonical
schema:

* timestamp[ns] + ``spark.sql.legacy.parquet.nanosAsLong=true`` lands as
  int64 nanoseconds → reconstruct µs ``timestamp_ntz`` with integer
  arithmetic (``ts div 1000`` — NOT float division, which loses
  precision above 2^53), matching DuckDB's own ns→µs truncation.
* timestamp[µs] lands as a timestamp already → keep it (cast to
  ``timestamp_ntz``; session tz is UTC so the instant is unchanged) and
  derive ``ts_ns = unix_micros(ts) * 1000``.

Either way the engine-facing schema is ``ts timestamp_ntz`` +
``ts_ns bigint``.  ``nanosAsLong`` stays set for backward compat — it is
a no-op on µs files.

Scale note: loads are plain ``spark.read.parquet`` — columnar scan,
predicate pushdown and column pruning all apply; at 100 TB the same call
reads a partitioned directory tree and Catalyst prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import ensure_runtime_configs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Canonicalize the events ``ts`` column regardless of how it landed.

    Dispatches on the landed Spark type (see module docstring): int64
    nanoseconds (ns parquet + nanosAsLong) vs a real timestamp (µs
    parquet).  Output schema is identical in both cases:
    ``ts timestamp_ntz`` (µs precision) + ``ts_ns bigint`` appended.
    """
    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df.withColumn(
        "ts_ns",
        F.expr("unix_micros(cast(ts as timestamp)) * CAST(1000 AS BIGINT)"),
    ).withColumn("ts", F.expr("cast(ts as timestamp_ntz)"))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; canonical engine-facing schema.

    ``events.ts`` is exposed as µs ``timestamp_ntz`` (matching the DuckDB
    oracle view's TIMESTAMP); an integer-nanosecond ``ts_ns`` is kept for
    operators that want integer time math.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_runtime_configs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def parquet_rowcount(spark: SparkSession, sf_dir: str, name: str) -> int:
    """RAW row count of a fixture table from its parquet footers — a
    driver-side metadata read (~1 ms), no Spark job.  Used by plan-time
    strategy gates (e.g. the deliberate join build side in plans/joins.py
    and the broadcast-vs-blocked switch in operators/similarity.py) so
    the physical strategy adapts to the INPUT size rather than being
    pinned for either local mode or the cluster.  Handles the single-file
    fixture layout and Spark-written directories; any failure (remote FS,
    exotic layout) falls back to the Spark metadata count, which is still
    footer-driven."""
    import pyarrow.parquet as pq
    from pathlib import Path

    root = Path(f"{sf_dir}/{name}.parquet")
    try:
        if root.is_dir():
            return sum(pq.read_metadata(p).num_rows for p in root.rglob("*.parquet"))
        return pq.read_metadata(root).num_rows
    except Exception:
        return load(spark, sf_dir, name).count()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql paths)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
