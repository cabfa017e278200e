"""Synthetic stream generators (SURVEY.md §2.1 S3).

The reference drives its demos with threads writing CSV files / Kafka
records at randomized intervals (``datasource/FileStreamDataGenerator.
java:29-97``, ``KafkaStreamDataGenerator.java``,
``BrowserStreamDataGenerator.java``). The Spark-native twin is the
``rate`` source — a per-trigger row generator — with the generator
domains expressed as deterministic column expressions over the rate
counter (same value domains as the reference, reproducible, no
threads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

USERS = ("Tom", "Harry", "Bob")
OPERATIONS = ("Create", "Modify", "Query", "Delete")
ENTITIES = ("Customer", "SalesRep")
ACTIONS = ("Login", "ViewVideo", "ViewLink", "ViewReview", "Logout")


def _pick(values: tuple[str, ...], idx) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (idx % len(values) + 1).cast("int"))


def audit_trail_generator(spark: SparkSession,
                          rows_per_second: int = 1) -> DataFrame:
    """Rate-source twin of FileStreamDataGenerator: audit-trail records
    with the generator's value domains (users/operations/entities,
    duration 1-10, change_count 1-4)."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    i = F.col("value")
    return rate.select(
        i.cast("int").alias("id"),
        _pick(USERS, i).alias("user"),
        _pick(ENTITIES, i + 1).alias("entity"),
        _pick(OPERATIONS, i + 2).alias("operation"),
        F.unix_millis("timestamp").alias("epoch_ms"),
        (i % 10 + 1).cast("int").alias("duration"),
        (i % 4 + 1).cast("int").alias("change_count"),
        F.col("timestamp").alias("event_time"),
    )


def browser_events_generator(spark: SparkSession,
                             rows_per_second: int = 1) -> DataFrame:
    """Rate-source twin of BrowserStreamDataGenerator."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    i = F.col("value")
    return rate.select(
        i.cast("int").alias("id"),
        _pick(USERS, i).alias("user"),
        _pick(ACTIONS, i * 7 + 3).alias("action"),
        F.unix_millis("timestamp").alias("epoch_ms"),
        F.col("timestamp").alias("event_time"),
    )
