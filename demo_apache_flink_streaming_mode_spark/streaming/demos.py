"""The reference's entry-point pipelines, composed end-to-end
(SURVEY.md §3, EP1-EP3) over its own CSV wire formats.

A user of the reference repo points these at the same kind of
monitored directory its generators write
(``data/raw_audit_trail/audit_trail_*.csv``,
``data/raw_browser_events/browser_events*.csv``) and gets the same
outputs from Spark Structured Streaming. Each returns unstarted
writers/DataFrames so callers pick trigger + lifecycle
(``trigger(availableNow=True)`` for drain-and-stop,
``processingTime`` for continuous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from demo_apache_flink_streaming_mode_spark.streaming import pipelines, sinks, sources, stateful


def ep1_basic_streaming(spark: SparkSession, in_dir: str, out_dir: str,
                        checkpoint: str, width: str = "3 seconds"):
    """EP1 — file-monitor source -> parse -> global tumbling count -> file
    sink (``chapter2/BasicStreamingOperations.java``).

    Returns (records_stream, sink_writer): the parsed record stream (the
    reference also prints/forks it) and the windowed-count file sink.
    """
    records = sources.audit_trail_stream(spark, in_dir)
    counts = pipelines.tumbling_count(
        records.withWatermark("event_time", "0 seconds"), "event_time", width)
    return records, sinks.file_sink(counts, out_dir, checkpoint, fmt="csv")


def ep2_window_join(spark: SparkSession, dir_a: str, dir_b: str,
                    width: str = "5 seconds",
                    delay: str = "10 seconds") -> DataFrame:
    """EP2 — two audit-trail streams joined per tumbling window on user
    (``chapter3/WindowJoin.java:119-158``); emits (user, window) pairs —
    the reference's JoinFunction projects (user, 1) per matched pair.
    """
    a = sources.audit_trail_stream(spark, dir_a).select(
        "user", "event_time", F.col("id").alias("id"))
    b = sources.audit_trail_stream(spark, dir_b).select(
        "user", "event_time", F.col("id").alias("id"))
    joined = pipelines.window_join(a, b, "user", "event_time", width, delay)
    return joined.select("user", "window_start", F.lit(1).alias("cnt"))


def ep3_event_time(spark: SparkSession, in_dir: str,
                   lateness: str = "2 seconds",
                   width: str = "1 second") -> DataFrame:
    """EP3 — event-time windowed count with lateness tolerance
    (``chapter4/EventTimeOperations.java``): event time from the
    record's own timestamp, 2 s watermark buffer, 1 s tumbling count.
    Late drops are observable via
    StreamingQueryProgress.stateOperators[*].numRowsDroppedByWatermark
    (W3 delta — Spark has no late-data side output; the batch twin
    ``operators.eventtime.classify_late`` reproduces the split).
    Sink with ``sinks.kafka_sink`` (K2) or any other writer.
    """
    records = sources.audit_trail_stream(spark, in_dir)
    return pipelines.tumbling_count(
        pipelines.with_event_time(records, "event_time", lateness),
        "event_time", width)


def ep_browser_sessions(spark: SparkSession, in_dir: str) -> DataFrame:
    """Chapter-6 exercise — per-user dwell-time sessionization over the
    browser-events feed (``chapter6_exercise/AnalyzeBrowserEvents.java:
    115-181``): emits the previous action's duration per event, with
    Login/Logout start/end semantics, via true keyed state."""
    ev = sources.browser_events_stream(spark, in_dir)
    return stateful.action_durations(
        ev.select("user", "event_time", F.col("id").alias("event_id"), "action"),
        key="user", ts="event_time", action_col="action",
        start_action="Login", end_action="Logout", tiebreak="event_id")
