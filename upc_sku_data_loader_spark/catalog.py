"""Fixture-table catalog: schema-pinned loads of the driver's parquet.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet per table per
scale factor under ``/root/testdata/sf{0.001,0.01,0.1}``.

The one non-trivial load is ``events``: its ``ts`` column is stored as
parquet timestamp[ns], which Spark 4 cannot read natively.  With
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a raw int64
of nanoseconds; we reconstruct a µs-precision ``timestamp_ntz`` with
integer arithmetic (``ts div 1000`` — NOT float division, which loses
precision above 2^53) so values match DuckDB's own ns→µs truncation
bit-for-bit (verified on min/max round-trip, SURVEY §1.3).

Scale note: loads are plain ``spark.read.parquet`` — columnar scan,
predicate pushdown and column pruning all apply; at 100 TB the same call
reads a partitioned directory tree and Catalyst prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; canonical engine-facing schema.

    ``events.ts`` is exposed as µs ``timestamp_ntz`` (matching the DuckDB
    oracle view's TIMESTAMP); the raw nanosecond value is kept as
    ``ts_ns`` for operators that want integer time math.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_runtime_configs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql paths)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
