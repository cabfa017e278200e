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

    A running max over a total arrival order is sequential if computed
    naively (one global window = every row through ONE task). It is
    decomposable, so this runs in two phases, keyed by the leading
    arrival-order component (the "arrival bucket"):

      1. per-bucket running max over the remaining order components —
         hash-partitioned by bucket, fully parallel;
      2. per-bucket max -> cumulative max over *strictly earlier*
         buckets — a window over one row per bucket (tiny at any data
         scale: buckets are arrival epochs), broadcast back.

    watermark(row) = max(phase-2 carry-in, phase-1 within-bucket max)
    − buffer, identical to the sequential definition because the
    arrival order sorts by bucket first.

    (The streaming form needs none of this: Spark maintains the global
    watermark across partitions itself; see streaming.runner.)
    """
    ms = epoch_ms(F.col(ts))
    if len(arrival_order) < 2:
        # no sub-bucket order to parallelize over: sequential fallback
        w = (W.orderBy(*arrival_order)
             .rowsBetween(W.unboundedPreceding, -1))
        wm = F.max(ms).over(w) - buffer_ms
        return df.withColumn("watermark_ms", wm).withColumn(
            "is_late", F.coalesce(ms < wm, F.lit(False)))
    bucket, within = arrival_order[0], list(arrival_order[1:])
    d = df.withColumn("__bkt", bucket).withColumn("__ms", ms)
    w_in = (W.partitionBy("__bkt").orderBy(*within)
            .rowsBetween(W.unboundedPreceding, -1))
    d = d.withColumn("__in_max", F.max("__ms").over(w_in))
    heads = d.groupBy("__bkt").agg(F.max("__ms").alias("__bmax"))
    w_b = W.orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
    heads = heads.select("__bkt", F.max("__bmax").over(w_b).alias("__prev_max"))
    d = d.join(F.broadcast(heads), "__bkt")
    # greatest() skips nulls; null only when no preceding row exists at all
    wm = F.greatest("__in_max", "__prev_max") - buffer_ms
    return (d.withColumn("watermark_ms", wm)
            .withColumn("is_late", F.coalesce(F.col("__ms") < wm, F.lit(False)))
            .drop("__bkt", "__ms", "__in_max", "__prev_max"))
