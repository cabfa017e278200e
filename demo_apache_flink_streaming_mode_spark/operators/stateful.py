"""Stateful per-key operators — batch twins (SURVEY.md §2.7).

The reference implements both with RichMapFunction + ValueState. The
batch-expressible twin of single-value keyed state is ``lag()`` over an
event-ordered per-key window: every non-special event overwrites the
state completely, so "state at event i" == "the previous event, unless a
reset happened there". The streaming forms (true keyed state via
transformWithStateInPandas) live in ``streaming.stateful`` and share
these semantics.

Ordering must be total for determinism: (ts, event_id) — ts alone can
tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import epoch_ms


def repeat_action_alert(df: DataFrame, key: str, ts: str, action_col: str,
                        action: str, threshold_ms: int,
                        order_tiebreak: str = "event_id") -> DataFrame:
    """ST1 — alert when the same key repeats `action` within `threshold_ms`.

    Reference: per-user ValueState("last-delete"); on each Delete, alert
    if the previous Delete was < 10 000 ms ago, always update state;
    non-alerts filtered out (``chapter5/StatefulOperations.java:83-143``).
    Since only `action` rows read or write the state, the twin is a lag
    over the action-filtered stream.
    """
    acts = df.filter(F.col(action_col) == action)
    w = W.partitionBy(key).orderBy(ts, order_tiebreak)
    acts = acts.withColumn("prev_ms", F.lag(epoch_ms(F.col(ts))).over(w))
    return (acts
            .withColumn("time_diff_ms", epoch_ms(F.col(ts)) - F.col("prev_ms"))
            .filter(F.col("prev_ms").isNotNull() &
                    (F.col("time_diff_ms") < threshold_ms))
            .select(key, "event_id", F.col("time_diff_ms")))


def action_durations(df: DataFrame, key: str, ts: str, action_col: str,
                     start_action: str, end_action: str,
                     order_tiebreak: str = "event_id") -> DataFrame:
    """ST2 — emit the PREVIOUS action's dwell time on each event.

    Reference (``chapter6_exercise/AnalyzeBrowserEvents.java:115-181``),
    with Login=`start_action`, Logout=`end_action`:
      - state empty (first event, or previous event was end_action which
        cleared it) -> emit ("None", 0)
      - current == start_action -> emit ("None", 0) (duration n/a)
      - else -> emit (prev_action, ts - prev_ts)
    State update: end_action clears; every other event overwrites — hence
    state == lag(event) unless lag(event) was end_action.
    """
    w = W.partitionBy(key).orderBy(ts, order_tiebreak)
    prev_a = F.lag(action_col).over(w)
    prev_ms = F.lag(epoch_ms(F.col(ts))).over(w)
    state_empty = prev_a.isNull() | (prev_a == end_action)
    no_duration = state_empty | (F.col(action_col) == start_action)
    return df.select(
        key, "event_id",
        F.when(no_duration, F.lit("None")).otherwise(prev_a).alias("prev_action"),
        F.when(no_duration, F.lit(0)).otherwise(epoch_ms(F.col(ts)) - prev_ms)
         .cast("long").alias("duration_ms"),
    )
