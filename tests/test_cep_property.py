"""Property test: the window-based batch funnel equals an independent
pure-Python NFA on random keyed event sequences.

The DataFrame funnel threads qualified-step timestamps through window
running-maxes — subtle enough (strict predecessors, gap windows, ties)
that the oracle alone is thin evidence: hypothesis drives both the
declarative form and a direct sequential reference over the same random
inputs, including pathological shapes (all one type, duplicate
timestamps, interleaved keys) the fixture data may never produce.
"""

from __future__ import annotations

import hypo
from hypothesis import given, strategies as st

from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators import cep

STEPS = ["a", "b", "c"]
WITHIN = 10


def _reference(rows, steps, within):
    """Sequential NFA: latest qualified ts per step, strict-predecessor
    evaluation — written independently of the DataFrame form."""
    out = []
    state: dict[int, list[int | None]] = {}
    for key, eid, ts, ty in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        qs = state.setdefault(key, [None] * len(steps))
        new = list(qs)
        for i, step in enumerate(steps):
            if ty != step:
                continue
            if i == 0:
                new[0] = ts
            elif qs[i - 1] is not None and qs[i - 1] >= ts - within:
                new[i] = ts
                if i == len(steps) - 1:
                    out.append((key, eid, ts, qs[i - 1]))
        state[key] = new
    return sorted(out)


events_strategy = st.lists(
    st.tuples(st.integers(0, 2),            # key
              st.integers(0, 11),           # ts (collisions likely)
              st.sampled_from(STEPS + ["x"])),  # type incl. non-step noise
    min_size=0, max_size=18)


@hypo.budget(25)
@given(events_strategy)
def test_funnel_matches_reference(spark, raw):
    rows = [(key, eid, ts, ty) for eid, (key, ts, ty) in enumerate(raw)]
    df = spark.createDataFrame(
        [(k, e, ts, ty) for k, e, ts, ty in rows],
        "user_id int, event_id int, ms long, event_type string"
    ).withColumn("ts", F.timestamp_millis(F.col("ms"))).drop("ms")
    got = sorted(
        (r["user_id"], r["event_id"], r["complete_ms"], r["prev_step_ms"])
        for r in cep.funnel_matches(df, STEPS, WITHIN).collect())
    assert got == _reference(rows, STEPS, WITHIN)
