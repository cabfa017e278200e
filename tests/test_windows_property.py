"""Property tests: the count-window family and the dynamic-gap session
operator against sequential references on hypothesis-generated event
sequences.

The constructed-case tests pin the rules where they differ from naive
formulations (running-max-of-ends vs lag, fired-windows-only vs every
bucket); these drive the same rules over random sequences — duplicate
timestamps, gap collisions, N exactly on/off a trigger boundary, size
vs slide in every relation (tumbling, overlapping, gappy).
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, strategies as st
from pyspark.sql import functions as F

import hypo
from demo_apache_flink_streaming_mode_spark.operators import windows as WO

# boundary-seeking strategies (exact-tie session gaps, trigger-boundary
# counts): higher smoke budget than the generic property modules, and
# hypo.budget raises it to >=250 under --hypothesis-profile=thorough
SLOW = hypo.budget(40)

# (key, ms, gap_ms) events; small ms range + gap range → frequent
# exact boundary collisions (ms == running end) and duplicate ms
session_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 300), st.integers(1, 80)),
    min_size=1, max_size=20)

# (key, value) rows; the order column is the generated index (unique,
# total order — row_number over it is deterministic)
keyed_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 100)),
    min_size=1, max_size=25,
).map(lambda rs: [(k, i + 1, v) for i, (k, v) in enumerate(rs)])


def _ref_sessions(rows):
    """Running-max-of-ends merge under Flink's INCLUSIVE
    ``TimeWindow.intersects``: a session closes only when an event
    starts strictly AFTER the max end of every prior interval in the
    session (an event exactly AT the running end still merges —
    ``EventTimeSessionWindowsTest.testMergeConsecutiveWindows``)."""
    per = defaultdict(list)
    for k, ms, g in rows:
        per[k].append((ms, g))
    out = set()
    for k, evs in per.items():
        evs.sort()
        start = end = mx = n = None
        for ms, g in evs:
            if start is None or ms > end:
                if start is not None:
                    out.add((k, start, n, start, mx))
                start, end, n, mx = ms, ms + g, 1, ms
            else:
                end, n, mx = max(end, ms + g), n + 1, ms
        out.add((k, start, n, start, mx))
    return out


@SLOW
@given(rows=session_rows)
def test_dynamic_session_matches_reference(spark, rows):
    df = (spark.createDataFrame(rows, "user_id long, ms long, gap_ms long")
          .select("user_id", "gap_ms",
                  F.timestamp_millis(F.col("ms")).alias("ts")))
    got = {(r.user_id, r.session_start, r.n, r.min_ts, r.max_ts)
           for r in WO.dynamic_session_stats(df, "ts", "user_id",
                                             F.col("gap_ms")).collect()}
    assert got == _ref_sessions(rows)


@SLOW
@given(rows=st.lists(st.tuples(st.integers(1, 2), st.integers(0, 120)),
                     min_size=1, max_size=20),
       gap=st.integers(1, 40))
def test_fixed_session_matches_reference(spark, rows, gap):
    """Fixed-gap sibling of the dynamic property: session_stats must
    follow the same inclusive merge rule (a new session only when
    diff > gap), which for a constant gap equals the running-max
    rule."""
    df = (spark.createDataFrame(rows, "user_id long, ms long")
          .select("user_id", F.timestamp_millis(F.col("ms")).alias("ts")))
    got = {(r.user_id, r.session_start, r.n, r.min_ts, r.max_ts)
           for r in WO.session_stats(df, "ts", f"{gap} milliseconds",
                                     "user_id").collect()}
    assert got == _ref_sessions([(k, ms, gap) for k, ms in rows])


def test_session_exact_touch_merges(spark):
    """Boundary-tie rule, pinned in BOTH directions (r8: reverted to
    Flink's actual semantics after the r7 advice flag).  Flink 1.9.1
    ``TimeWindow.intersects`` is inclusive (``start <= other.end &&
    end >= other.start``), so the per-event windows [0,1) and [1,2)
    MERGE (``EventTimeSessionWindowsTest.testMergeConsecutiveWindows``)
    — an event at exactly ``prev_ts + gap`` joins the SAME session.
    Dynamic form: [(1, 0ms, gap 1ms), (1, 1ms, gap 1ms)] -> ONE
    two-event session."""
    df = (spark.createDataFrame([(1, 0, 1), (1, 1, 1)],
                                "user_id long, ms long, gap_ms long")
          .select("user_id", "gap_ms",
                  F.timestamp_millis(F.col("ms")).alias("ts")))
    got = sorted((r.session_start, r.n) for r in WO.dynamic_session_stats(
        df, "ts", "user_id", F.col("gap_ms")).collect())
    assert got == [(0, 2)]

    # fixed-gap twin: events at 0 and 5000 ms with a 5 s gap -> merge
    d2 = (spark.createDataFrame([(1, 0), (1, 5000)], "user_id long, ms long")
          .select("user_id", F.timestamp_millis(F.col("ms")).alias("ts")))
    got2 = sorted((r.session_start, r.n) for r in WO.session_stats(
        d2, "ts", "5 seconds", "user_id").collect())
    assert got2 == [(0, 2)]

    # control: one microsecond PAST the gap splits — the boundary is
    # exact at Spark's full timestamp resolution, not a semantic slop
    d3 = (spark.createDataFrame([(1,)], "user_id long")
          .select("user_id",
                  F.expr("timestamp_micros(0)").alias("ts"))
          .union(spark.createDataFrame([(1,)], "user_id long")
                 .select("user_id",
                         F.expr("timestamp_micros(5000001)").alias("ts"))))
    got3 = sorted(r.n for r in WO.session_stats(d3, "ts", "5 seconds",
                                                "user_id").collect())
    assert got3 == [1, 1]


@SLOW
@given(rows=keyed_rows, size=st.sampled_from([1, 3, 4]))
def test_count_window_matches_reference(spark, rows, size):
    """Tumbling count windows: 0-based rank div size buckets, trailing
    partial KEPT with its actual n."""
    per = defaultdict(list)
    for k, i, v in rows:
        per[k].append(v)  # rows are already in index order
    want = set()
    for k, vs in per.items():
        for w in range((len(vs) + size - 1) // size):
            chunk = vs[w * size:(w + 1) * size]
            want.add((k, w, len(chunk), float(sum(chunk)),
                      float(min(chunk)), float(max(chunk))))
    df = spark.createDataFrame(
        [(k, i, float(v)) for k, i, v in rows],
        "user_id long, idx long, value double")
    got = {(r.user_id, r.window_id, r.n, r.sum_value, r.min_value,
            r.max_value)
           for r in WO.count_window_agg(df, "user_id", ["idx"], "value",
                                        size).collect()}
    assert got == want


@SLOW
@given(rows=keyed_rows, size=st.sampled_from([1, 3, 5]),
       slide=st.sampled_from([1, 2, 5]))
def test_sliding_count_window_matches_reference(spark, rows, size, slide):
    """Sliding count windows: window w fires at the w*slide-th record
    (absent if the trigger never fires) and covers the last `size`
    records at that point, partial at the stream head."""
    per = defaultdict(list)
    for k, i, v in rows:
        per[k].append(v)
    want = set()
    for k, vs in per.items():
        for w in range(1, len(vs) // slide + 1):
            chunk = vs[max(w * slide - size, 0):w * slide]
            want.add((k, w, len(chunk), float(sum(chunk)),
                      float(min(chunk)), float(max(chunk)), w * slide))
    df = spark.createDataFrame(
        [(k, i, float(v)) for k, i, v in rows],
        "user_id long, idx long, value double")
    got = {(r.user_id, r.window_id, r.n, r.sum_value, r.min_value,
            r.max_value, r.trigger_rn)
           for r in WO.sliding_count_window_agg(
               df, "user_id", ["idx"], "value", size, slide).collect()}
    assert got == want
