"""Complex-event-processing (CEP) pattern detection over keyed event
sequences — the DataFrame re-expression of FlinkCEP-style
``begin(A).followedBy(B).followedBy(C).within(t)`` patterns
(the natural extension of the reference's keyed-state operators,
chapter4/StatefulOperations.java:42-96, to multi-step sequences).

Semantics (relaxed contiguity, as FlinkCEP ``followedBy``): a match
completes at an event of the LAST step type for which there exists a
chain e_0 < e_1 < ... < e_{k} of events of the step types, in order,
each consecutive gap <= ``within_ms``. Non-step events between chain
links are ignored.

Execution shape: one shuffle on the key, one sort per partition, then
k running-max window passes over the SAME (key, time) ordering — Spark
plans a single Exchange+Sort reused by every pass, so pattern length
adds zero shuffles. State per row is one timestamp per step (the latest
"qualified" occurrence), exactly the ValueState a Flink CEP NFA would
keep for this pattern class — but expressed declaratively so Catalyst
parallelizes it per key at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def funnel_matches(events: DataFrame, steps: list[str], within_ms: int,
                   key: str = "user_id", ts: str = "ts",
                   type_col: str = "event_type",
                   tiebreak: str = "event_id") -> DataFrame:
    """Detect ``steps[0] -> steps[1] -> ... -> steps[-1]`` per key, each
    consecutive gap <= ``within_ms``.

    Returns one row per completing event (the last step):
    (key, event_id of the completion, complete_ms, prev_step_ms = the
    latest qualified occurrence of the second-to-last step that the
    completion chained from).

    Strictly-earlier predecessors only (rowsBetween ... -1): a row never
    chains to itself even when event types could collide at one
    timestamp; ties at identical timestamps resolve by ``tiebreak`` so
    the window order — and therefore the match set — is deterministic.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    ms = F.unix_millis(F.col(ts))
    df = events.select(F.col(key), F.col(tiebreak), F.col(type_col).alias("_ty"),
                       ms.alias("_ms"))
    order = W.partitionBy(key).orderBy("_ms", tiebreak)
    prev = order.rowsBetween(W.unboundedPreceding, -1)

    # q_i = event time when this row is a *qualified* occurrence of
    # step i (its predecessor chain exists); carried forward as a
    # running max so the next step sees the latest qualified one.
    df = df.withColumn("_q", F.when(F.col("_ty") == steps[0], F.col("_ms")))
    for step in steps[1:]:
        df = df.withColumn("_p", F.max("_q").over(prev))
        df = df.withColumn(
            "_q", F.when((F.col("_ty") == step)
                         & (F.col("_p") >= F.col("_ms") - within_ms),
                         F.col("_ms")))
    return (df.filter(F.col("_q").isNotNull())
            .select(F.col(key), F.col(tiebreak),
                    F.col("_ms").alias("complete_ms"),
                    F.col("_p").alias("prev_step_ms")))
