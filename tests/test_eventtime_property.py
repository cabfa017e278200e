"""Property test: the two-phase parallel watermark classifier equals
the literal sequential punctuated-watermark simulation.

``classify_late`` replaces the naive one-global-window running max with
a per-bucket phase + a tiny cross-bucket carry window so it scales;
that decomposition (carry-in vs within-bucket max, null handling at
each bucket's first row, buckets whose every row is late) is exactly
what hypothesis should attack.  Both the multi-component path and the
single-component sequential fallback are driven against one reference:
watermark(row) = max(event-time of all strictly-earlier arrivals) −
buffer, late iff own event time < watermark (reference semantics,
chapter4/EventTimeOperations.java:104,121-123).
"""

from __future__ import annotations

import hypo
from hypothesis import given, strategies as st
from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators.eventtime import (
    classify_late)

BUFFER_MS = 7

arrivals_strategy = st.lists(
    st.tuples(st.integers(0, 3),     # arrival bucket (epoch)
              st.integers(0, 40)),   # event-time ms
    min_size=1, max_size=16)


def _ref(rows, buffer_ms):
    """rows: (bucket, eid, event_ms), arrival order = (bucket, eid).
    Returns {eid: (watermark_ms_or_None, is_late)}."""
    out = {}
    seen_max = None
    for bkt, eid, ms in sorted(rows, key=lambda r: (r[0], r[1])):
        wm = None if seen_max is None else seen_max - buffer_ms
        out[eid] = (wm, wm is not None and ms < wm)
        seen_max = ms if seen_max is None else max(seen_max, ms)
    return out


def _run(spark, rows, arrival_order):
    df = spark.createDataFrame(rows, "bkt int, eid long, ms_raw long") \
        .withColumn("ts", F.timestamp_millis("ms_raw"))
    got = classify_late(df, "ts", arrival_order, BUFFER_MS).collect()
    return {r["eid"]: (r["watermark_ms"], r["is_late"]) for r in got}


@hypo.budget(25)
@given(arrivals_strategy)
def test_classify_late_two_phase_matches_sequential(spark, raw):
    rows = [(bkt, eid, ms) for eid, (bkt, ms) in enumerate(raw)]
    got = _run(spark, rows, [F.col("bkt"), F.col("eid")])
    assert got == _ref(rows, BUFFER_MS)


@hypo.budget(15)
@given(arrivals_strategy)
def test_classify_late_fallback_matches_sequential(spark, raw):
    # single-component arrival order exercises the sequential-window
    # fallback; fold (bucket, eid) into ONE unique order key (eid < 100,
    # so bkt*100+eid sorts identically to the lexicographic pair)
    rows = [(bkt * 100 + eid, eid, ms) for eid, (bkt, ms) in enumerate(raw)]
    got = _run(spark, rows, [F.col("bkt")])
    assert got == _ref(rows, BUFFER_MS)
