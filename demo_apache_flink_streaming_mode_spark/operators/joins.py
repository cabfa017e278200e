"""Joins (SURVEY.md §2.5).

J1 (the reference's windowed stream-stream inner equi-join,
``chapter3/WindowJoin.java:119-158``) plus the general join surface the
DataFrame API gives for free (outer/semi/anti — absent in the reference
but exposed by the engine).

Scale notes: the window join tags both sides with an aligned window
column and equi-joins on (key, window) — the window key bounds state in
streaming and gives Catalyst a plain shuffled hash/sort-merge join in
batch. Small dimensions should be broadcast (see plans.tpch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def window_join(left: DataFrame, right: DataFrame, key: str, ts: str,
                width: str, suffixes: tuple[str, str] = ("_l", "_r"),
                how: str = "inner") -> DataFrame:
    """J1 — tumbling-window equi-join.

    Within each window, matching keys produce the full cross product of
    pairs — exactly the reference's JoinFunction semantics
    (``chapter3/WindowJoin.java:141-158``, 2x3 matches -> 6 rows).

    ``how`` extends the reference's inner-only join: "left"/"right"/
    "full" keep unmatched rows with nulls on the other side — Flink
    needs a CoGroupFunction for this, Spark exposes it as the join
    type, and the streaming form is supported natively (watermarked
    outer stream-stream join; unmatched rows emit once the watermark
    passes the window end).
    """
    lw = left.withColumn("w", F.window(ts, width))
    rw = right.withColumn("w", F.window(ts, width))
    lsel = lw.select(F.col(key).alias("join_key"), F.col("w"),
                     *[F.col(c).alias(c + suffixes[0]) for c in left.columns if c != key])
    rsel = rw.select(F.col(key).alias("join_key"), F.col("w"),
                     *[F.col(c).alias(c + suffixes[1]) for c in right.columns if c != key])
    joined = lsel.join(rsel, ["join_key", "w"], how)
    return joined.select(
        F.col("join_key").alias(key),
        F.unix_millis(F.col("w.start")).alias("window_start"),
        *[c for c in joined.columns if c.endswith(suffixes[0]) or c.endswith(suffixes[1])],
    )


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              tiebreak: list[str] | None = None) -> DataFrame:
    """Backward as-of (left) join: each left row picks the LATEST right
    row with ``right_ts <= left_ts`` on the same key; unmatched left
    rows keep nulls. The classic time-series alignment operator the
    DataFrame API lacks (DuckDB spells it ``ASOF LEFT JOIN``).

    Execution shape (scale-first): both sides are tagged and unioned,
    then one ``Window.partitionBy(key).orderBy(ts, side, tiebreak)``
    pass carries the last-seen right payload forward
    (``last(ignorenulls=True)`` over an unbounded-preceding frame) and
    left rows are filtered back out. ONE shuffle on the key + a per-key
    sort — no range cross-product, no per-row probe, and state is O(1)
    per key in a streaming form. At equal timestamps the right row
    sorts first, so a same-timestamp right row IS visible to the left
    row (<= semantics).

    The right payload travels as ONE struct carried by a single
    ``last(ignorenulls=True)``, so every output right column comes from
    the SAME right row even when payload columns legitimately contain
    NULLs (a per-column carry could mix rows). Right rows colliding on
    (key, right_ts) resolve deterministically: the carried row is the
    greatest by ``tiebreak`` (right column names; default = the whole
    payload struct, compared field-by-field in right-column order).

    Contract: ``key`` is the only shared column name; payload column
    names must be disjoint across the two sides.
    """
    from pyspark.sql.types import StructType

    lcols = [c for c in left.columns if c != key]
    rcols = [c for c in right.columns if c != key]
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtype = StructType([right.schema[c] for c in rcols])
    l = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rtype).alias("__rpay"))
    r = right.select(
        F.col(key), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols]).alias("__rpay"))
    tb = ([F.col(f"__rpay.{c}") for c in tiebreak] if tiebreak
          else [F.col("__rpay")])
    w = (W.partitionBy(key).orderBy("__ts", "__side", *tb)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = l.unionByName(r).select(
        key, "__side", *lcols,
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"))
    return carried.filter(F.col("__side") == 1).select(
        key, *lcols, *[F.col(f"__rpay.{c}").alias(c) for c in rcols])


def interval_join(left: DataFrame, right: DataFrame,
                  left_ts: str, right_ts: str,
                  lower_ms: int, upper_ms: int) -> DataFrame:
    """Interval join WITHOUT an equi key: pairs where
    ``right_ts ∈ [left_ts + lower_ms, left_ts + upper_ms]`` (Flink's
    DataStream interval join; stock Spark would plan a nested-loop).

    Execution shape (grid binning): with span = upper - lower, each
    right row lands in ONE time bin (``ts div span``) and each left row
    explodes to its exactly-two candidate bins, turning the range
    predicate into an equi-join on the bin id + an exact residual
    filter. Every matching pair is produced exactly once (the right
    row's bin is unique), bins are integer arithmetic (no float
    boundary error), and at 100 TB the plan is one shuffle on a
    well-distributed bin key instead of an O(n^2) nested loop. The
    replicated side is shuffle_hash-hinted (post-explode size estimates
    are unreliable and must not pick a broadcast).

    Contract: payload column names disjoint; timestamps non-negative
    epoch-ms longs; lower_ms < upper_ms.
    """
    span = upper_ms - lower_ms
    if span <= 0:
        raise ValueError("interval_join requires lower_ms < upper_ms")
    base = F.expr(f"({left_ts} + {lower_ms}) div {span}")
    l = left.withColumn("__bin", F.explode(F.array(base, base + 1)))
    r = right.withColumn("__bin", F.expr(f"{right_ts} div {span}"))
    out = (l.join(r.hint("shuffle_hash"), "__bin")
           .filter((F.col(right_ts) >= F.col(left_ts) + lower_ms)
                   & (F.col(right_ts) <= F.col(left_ts) + upper_ms)))
    return out.drop("__bin")
