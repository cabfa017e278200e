"""Streaming sources (SURVEY.md §2.1).

S1 — monitored-directory file source. The reference polls a directory
every 1000 ms and emits each new line
(``chapter2/BasicStreamingOperations.java:51-62``, TextInputFormat +
PROCESS_CONTINUOUSLY). Spark's file stream source natively monitors the
input directory per micro-batch; ``maxFilesPerTrigger`` plays the role
of the poll throttle. Schemas are always declared, never inferred
(SURVEY.md §1.2).

S2 — Kafka source. The reference consumes a topic as strings with
consumer group, broker list, SASL/PLAIN and start-from-latest
(``chapter3/WindowOperations.java:46-69``). The Spark twin is the
``kafka`` data source with the matching options; records surface as a
DataFrame with binary key/value that we cast to string — the same
SimpleStringSchema shape.

At scale: the file source lists the directory per trigger (use compact
registries / fewer-larger files at 100 TB); Kafka parallelism follows
topic partitions — one Spark task per partition, no shuffle at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from demo_apache_flink_streaming_mode_spark.schemas import AUDIT_TRAIL_CSV, BROWSER_EVENTS_CSV


def file_stream(spark: SparkSession, path: str, schema: StructType,
                fmt: str = "csv", max_files_per_trigger: int | None = None,
                **options: str) -> DataFrame:
    """S1 — unbounded stream over a monitored directory.

    Batch twin: ``sources.batch`` readers over the same path/schema.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def audit_trail_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """S1+T1 — the reference's audit-trail CSV wire format, streamed.

    Quote handling and positional int/long casts are native to the CSV
    source (vs the hand parse in ``chapter2/AuditTrail.java:17-28``);
    epoch-ms becomes a real event-time timestamp once, at ingest.
    """
    raw = file_stream(spark, path, AUDIT_TRAIL_CSV, "csv",
                      max_files_per_trigger, quote='"')
    return raw.withColumn("event_time", F.timestamp_millis(F.col("epoch_ms")))


def browser_events_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int | None = None) -> DataFrame:
    """S1 twin of the browser-events generator feed
    (``datasource/BrowserStreamDataGenerator.java:29-95``)."""
    raw = file_stream(spark, path, BROWSER_EVENTS_CSV, "csv",
                      max_files_per_trigger, quote='"')
    return raw.withColumn("event_time", F.timestamp_millis(F.col("epoch_ms")))


def kafka_source_options(brokers: str, topic: str,
                         group_id: str | None = None,
                         starting_offsets: str = "latest",
                         sasl_plain: tuple[str, str] | None = None) -> dict[str, str]:
    """S2 option set for Spark's ``kafka`` source, as one pure dict.

    One option per reference consumer property
    (``chapter3/WindowOperations.java:46-66``): bootstrap.servers /
    group.id / security.protocol / sasl.mechanism / sasl.jaas.config
    travel under Spark's ``kafka.``-prefix passthrough; the topic
    subscription and setStartFromLatest() map to ``subscribe`` /
    ``startingOffsets``. Kept separate from the reader construction so
    the exact option names are contract-testable without the
    spark-sql-kafka jar on the classpath.
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if group_id is not None:
        opts["kafka.group.id"] = group_id
    if sasl_plain is not None:
        user, password = sasl_plain
        opts["kafka.security.protocol"] = "SASL_PLAINTEXT"
        opts["kafka.sasl.mechanism"] = "PLAIN"
        opts["kafka.sasl.jaas.config"] = (
            "org.apache.kafka.common.security.plain.PlainLoginModule "
            f'required username="{user}" password="{password}";')
    return opts


def kafka_stream(spark: SparkSession, brokers: str, topic: str,
                 group_id: str | None = None,
                 starting_offsets: str = "latest",
                 sasl_plain: tuple[str, str] | None = None) -> DataFrame:
    """S2 — Kafka topic as a stream of (key, value) strings.

    Mirrors ``chapter3/WindowOperations.java:46-69``: broker list,
    consumer group, string deserialization, start-from-latest, optional
    SASL/PLAIN. Requires the spark-sql-kafka package on the classpath
    (not bundled in this container — the plan builds; execution needs a
    broker).
    """
    reader = (spark.readStream.format("kafka")
              .options(**kafka_source_options(brokers, topic, group_id,
                                              starting_offsets, sasl_plain)))
    return reader.load().selectExpr("CAST(key AS STRING) AS key",
                                    "CAST(value AS STRING) AS value",
                                    "timestamp")
