"""Property tests: the §2-core ValueState batch twins (ST1 repeat-action
alert, ST2 dwell-time sessionization) against sequential state-machine
references.

The references walk each key's events in (ts, event_id) order with a
literal mutable state cell — the Java semantics restated — so the
lag-window twins must reproduce clear-on-Logout, consecutive Logouts,
duplicate timestamps (tiebreak by event_id), and exact-threshold
boundaries on random sequences.
"""

from __future__ import annotations

from collections import defaultdict

import hypo
from hypothesis import given, strategies as st
from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators import stateful as ST

ACTIONS = ["Login", "Logout", "View", "Delete"]

events = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 50),
              st.sampled_from(ACTIONS)),
    min_size=1, max_size=25,
).map(lambda rs: [(k, i + 1, ms, a) for i, (k, ms, a) in enumerate(rs)])

SLOW = hypo.budget(15)


def _by_key_ordered(rows):
    per = defaultdict(list)
    for k, eid, ms, a in rows:
        per[k].append((ms, eid, a))
    for k in per:
        per[k].sort()
    return per


@SLOW
@given(rows=events, threshold=st.sampled_from([1, 10, 25]))
def test_repeat_action_alert_matches_reference(spark, rows, threshold):
    """ST1: per-key ValueState over Delete events only — alert when the
    previous Delete is < threshold ms ago (boundary: == is NO alert)."""
    want = set()
    for k, evs in _by_key_ordered(rows).items():
        prev = None
        for ms, eid, a in evs:
            if a != "Delete":
                continue
            if prev is not None and ms - prev < threshold:
                want.add((k, eid, ms - prev))
            prev = ms
    df = (spark.createDataFrame(
        rows, "user_id long, event_id long, ms long, action string")
        .select("user_id", "event_id", "action",
                F.timestamp_millis(F.col("ms")).alias("ts")))
    got = {(r.user_id, r.event_id, r.time_diff_ms)
           for r in ST.repeat_action_alert(
               df, "user_id", "ts", "action", "Delete",
               threshold).collect()}
    assert got == want


@SLOW
@given(rows=events)
def test_action_durations_matches_reference(spark, rows):
    """ST2: dual ValueState (last action, last start) with Logout
    clearing state and Login suppressing the duration — walked as a
    literal state machine."""
    want = {}
    for k, evs in _by_key_ordered(rows).items():
        state = None  # (action, ms) or None after Logout / at start
        for ms, eid, a in evs:
            if state is None or a == "Login":
                want[(k, eid)] = ("None", 0)
            else:
                want[(k, eid)] = (state[0], ms - state[1])
            state = None if a == "Logout" else (a, ms)
    df = (spark.createDataFrame(
        rows, "user_id long, event_id long, ms long, action string")
        .select("user_id", "event_id", "action",
                F.timestamp_millis(F.col("ms")).alias("ts")))
    got = {(r.user_id, r.event_id): (r.prev_action, r.duration_ms)
           for r in ST.action_durations(
               df, "user_id", "ts", "action", "Login",
               "Logout").collect()}
    assert got == want
