"""Event time, watermarks, late data — batch twins (SURVEY.md §2.6).

W1 (event-time mode) is implicit in Spark: every window/watermark here
operates on the record's own TimestampType column, converted once at
ingest — the reference's ``TimeCharacteristic.EventTime`` +
timestamp extractor (``chapter4/EventTimeOperations.java:48,93-99``).

W2/W3 (punctuated watermark + late-data side output): Spark's watermark
is ``max(event_time) - delay`` advanced per micro-batch, and rows later
than it are *dropped*, not side-output. The engine's policy (documented
semantic delta, SURVEY.md §2.6 W3):
  (a) streaming: expose drop counts from StreamingQueryProgress
      (streaming.runner.watermark_metrics);
  (b) batch twin below: classify each record against the watermark a
      punctuated assigner would have had at its arrival, so late data is
      *observable* as a column (and the late stream is a filter away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import epoch_ms


def classify_late(df: DataFrame, ts: str, arrival_order: list,
                  buffer_ms: int) -> DataFrame:
    """W2/W3 batch twin — flag records that arrive behind the watermark.

    The watermark observed *at* an event = max event-time over all
    previously-arrived records minus `buffer_ms` (the reference's 2 s
    lateness buffer, ``chapter4/EventTimeOperations.java:104,121-123``).
    A record is late iff its own event time < that watermark.

    The global arrival-ordered window mirrors the reference's
    parallelism-1 punctuated assigner — a sequential device by nature.
    (The streaming form distributes: Spark maintains the global watermark
    across partitions itself; see streaming.runner.)
    """
    w = (W.orderBy(*arrival_order)
         .rowsBetween(W.unboundedPreceding, -1))
    wm = F.max(epoch_ms(F.col(ts))).over(w) - buffer_ms
    return df.withColumn("watermark_ms", wm).withColumn(
        "is_late", F.coalesce(epoch_ms(F.col(ts)) < wm, F.lit(False)))
