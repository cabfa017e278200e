"""Batch readers for the driver's parquet testdata and reference-style CSV.

Batch twin of the reference's file source (S1,
``chapter2/BasicStreamingOperations.java:51-62``): the same declared
schema, read once instead of monitored continuously. The streaming form
lives in ``sources.files``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from demo_apache_flink_streaming_mode_spark.schemas import AUDIT_TRAIL_CSV, TESTDATA_TABLES
from demo_apache_flink_streaming_mode_spark.session import ensure_runtime_confs


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types to the declared schema.

    events.ts is physically TIMESTAMP(NANOS) parquet; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it reads as LongType nanos
    and is converted here to TimestampType (micros — exact, the data has
    micro precision).
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, NOT `/`: float division of ~1.7e18 ns exceeds
        # double precision and shifts timestamps by ±1 ms
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = tuple(TESTDATA_TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_audit_trail_csv(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the reference's quoted-CSV audit-trail wire format.

    Replaces the hand-rolled quote-strip/split/cast parse
    (``chapter2/AuditTrail.java:17-28``) with Spark's native CSV reader +
    declared schema; epoch-ms longs become a proper event_time timestamp
    once, at ingest (SURVEY.md §1.2).
    """
    return (
        spark.read.schema(AUDIT_TRAIL_CSV).option("quote", '"').csv(path)
        .withColumn("event_time", F.timestamp_millis(F.col("epoch_ms")))
    )
