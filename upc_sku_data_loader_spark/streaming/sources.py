"""Structured Streaming sources over the fixture tables (SURVEY §2 A9/I).

``events`` as an unbounded stream: ``spark.readStream.schema(...)
.parquet(dir)`` — file-based micro-batches, the standard pattern for
replayable ingestion.  The nanosecond ``ts`` arrives as raw int64
(nanosAsLong, same as batch) and is reconstructed identically, so
streaming and batch twins agree bit-for-bit.

Scale note: at production scale the same code points at an object-store
prefix; ``maxFilesPerTrigger`` bounds micro-batch size, and the
checkpoint directory gives exactly-once with idempotent sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_runtime_configs

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanoseconds (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    ensure_runtime_configs(spark)
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    return df.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
    )


def run_available_now(stream_df: DataFrame, view_name: str) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink in *complete* output mode; return the result as a batch
    DataFrame.  Complete mode emits every window/group regardless of the
    final watermark, so the result equals the batch twin exactly."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(view_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(view_name)
    return out
