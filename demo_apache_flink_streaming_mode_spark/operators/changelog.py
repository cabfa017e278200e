"""Changelog / upsert-stream semantics (Flink dynamic tables).

The reference engine's table runtime models every keyed stream as a
CHANGELOG — a sequence of upserts and deletes per key — and derives a
"dynamic table" from it (the Flink retract/upsert-stream model; the
demo's keyed ValueState operators in
``chapter5/StatefulOperations.java:83-143`` are exactly this pattern:
each user's stream mutates one evolving state cell). Spark-first
re-expression:

* A changelog is just a DataFrame with (key, order, op, payload).
* Materializing the dynamic table ("apply the changelog") is a
  descending ``row_number`` window — one shuffle on the key, no
  iteration, no state replay.
* Retract-aware aggregation (Flink needs retractions because a key's
  old contribution must be withdrawn when it updates) collapses to
  plain aggregation over the MATERIALIZED state: the window already
  discarded superseded versions, so nothing needs retracting.

At 100 TB the apply is one hash-partitioned shuffle on the key plus a
per-key sort of that key's own versions — the same cost class as any
keyed window, and far cheaper than replaying the log through
sequential state. The streaming twin (``streaming.pipelines.
upsert_state_stream``) keeps one ``max_by`` cell per key in update
mode — the literal Spark analog of Flink's upsert stream, emitting a
new row (or delete tombstone) whenever a key's state changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Op markers. Deletes are kept as TOMBSTONES by apply_changelog so an
# upsert sink (Kafka compacted topic, KV store) can propagate the
# deletion; latest_state drops them for the "current table" view.
OP_UPSERT = "U"
OP_DELETE = "D"


def derive_ops(events: DataFrame, delete_when: Column,
               op_col: str = "op") -> DataFrame:
    """Tag each event with a changelog op: DELETE where ``delete_when``
    holds, else UPSERT. Pure projection — no shuffle.

    NULL handling is explicit: a NULL predicate (e.g. a nullable
    tombstone column) is an UPSERT, never a silent drop — the
    ``coalesce(False)`` makes the three-valued-logic fallthrough a
    stated contract rather than an accident of ``when/otherwise``, and
    the cl_* oracles compare with ``IS DISTINCT FROM`` to match."""
    return events.withColumn(
        op_col,
        F.when(F.coalesce(delete_when, F.lit(False)), OP_DELETE)
        .otherwise(OP_UPSERT))


def apply_changelog(cl: DataFrame, key: str, order_cols: list[str],
                    op_col: str = "op") -> DataFrame:
    """Materialize the dynamic table: per key, the LAST version in
    ``order_cols`` order wins. Delete winners survive as tombstone rows
    (``is_deleted = true``, Kafka-compaction style) so downstream can
    either drop them (:func:`latest_state`) or forward the deletion.

    Adds ``n_changes`` (total changelog entries folded into this key) —
    computed in the same window pass, no second aggregation.
    """
    w = W.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (cl
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("n_changes", F.count("*").over(W.partitionBy(key)))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("is_deleted", F.col(op_col) == OP_DELETE))


def latest_state(cl: DataFrame, key: str, order_cols: list[str],
                 op_col: str = "op") -> DataFrame:
    """The current table: apply the changelog and drop tombstones —
    keys whose most recent op is a DELETE are absent, exactly Flink's
    upsert-stream materialization."""
    return (apply_changelog(cl, key, order_cols, op_col)
            .filter(~F.col("is_deleted"))
            .drop("is_deleted"))


def state_summary(state: DataFrame, dims: list[str],
                  value_col: str) -> DataFrame:
    """Retract-aware aggregate over the materialized state: group the
    CURRENT rows, not the raw log. In Flink this query needs retraction
    support (an update moves a key between groups, so its old group
    must give the contribution back); over the materialized table it is
    a plain hash aggregate — superseded versions are already gone.

    DECIMAL(38,6) sum for engine-portable addition (see
    ``functions.scalars``).
    """
    return (state.groupBy(*dims)
            .agg(F.count("*").alias("n_keys"),
                 F.sum(F.col(value_col).cast("decimal(38,6)"))
                 .cast("double").alias("sum_value")))
