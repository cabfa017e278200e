"""Streaming sinks (SURVEY.md §2.2).

K1 — file sink: row-format bucketed output with checkpointing
(reference: StreamingFileSink + SimpleStringEncoder,
``chapter2/BasicStreamingOperations.java:105-115``). Spark's file sink
is exactly-once via the checkpoint + file-manifest commit protocol.

K2 — Kafka sink. The reference configures Semantic.EXACTLY_ONCE on its
producer (``chapter4/EventTimeOperations.java:183-220``). Spark's Kafka
sink is AT-LEAST-ONCE (offsets tracked in the checkpoint; a retried
micro-batch can re-send). End-to-end exactly-once needs an idempotent
or transactional consumer downstream — this is a documented semantic
delta, not silently papered over. Use ``foreachBatch`` with your own
transactional producer when the downstream can't dedup.

K3 — console/debug sinks (the reference prints mid-pipeline; we keep
output at the sink where it belongs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery


def file_sink(df: DataFrame, path: str, checkpoint: str, fmt: str = "csv",
              output_mode: str = "append") -> DataStreamWriter:
    """K1 — exactly-once file sink (csv/parquet/json)."""
    return (df.writeStream.format(fmt)
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode))


def kafka_sink_options(brokers: str, topic: str, checkpoint: str) -> dict[str, str]:
    """K2 option set for Spark's ``kafka`` sink, as one pure dict
    (producer bootstrap.servers + target topic,
    ``chapter4/EventTimeOperations.java:187-206``; checkpointLocation is
    Spark's delivery-tracking anchor). Contract-testable without the
    connector jar."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_sink(df: DataFrame, brokers: str, topic: str,
               checkpoint: str) -> DataStreamWriter:
    """K2 — Kafka sink (at-least-once; see module docstring).

    Expects string/binary ``key`` and ``value`` columns, the same
    record shape the reference serializes
    (``chapter4/EventTimeOperations.java:187-206``).
    """
    cols = df.columns
    out = df.selectExpr(
        *(["CAST(key AS STRING) AS key"] if "key" in cols else []),
        "CAST(value AS STRING) AS value")
    return (out.writeStream.format("kafka")
            .options(**kafka_sink_options(brokers, topic, checkpoint)))


def console_sink(df: DataFrame, output_mode: str = "append",
                 truncate: bool = False) -> DataStreamWriter:
    """K3 — console sink (the reference's ``.print()``)."""
    return (df.writeStream.format("console")
            .option("truncate", truncate).outputMode(output_mode))


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append",
                  timeout_s: int = 120) -> StreamingQuery:
    """Test/debug helper: drain all currently-available input into an
    in-memory table `name` (query runs with availableNow and terminates).

    The memory sink collects to the driver — test-scale only, never a
    production path.
    """
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return q
