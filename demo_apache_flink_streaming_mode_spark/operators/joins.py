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

from pyspark.sql import DataFrame, functions as F


def window_join(left: DataFrame, right: DataFrame, key: str, ts: str,
                width: str, suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """J1 — tumbling-window inner equi-join.

    Within each window, matching keys produce the full cross product of
    pairs — exactly the reference's JoinFunction semantics
    (``chapter3/WindowJoin.java:141-158``, 2x3 matches -> 6 rows).
    """
    lw = left.withColumn("w", F.window(ts, width))
    rw = right.withColumn("w", F.window(ts, width))
    lsel = lw.select(F.col(key).alias("join_key"), F.col("w"),
                     *[F.col(c).alias(c + suffixes[0]) for c in left.columns if c != key])
    rsel = rw.select(F.col(key).alias("join_key"), F.col("w"),
                     *[F.col(c).alias(c + suffixes[1]) for c in right.columns if c != key])
    joined = lsel.join(rsel, ["join_key", "w"], "inner")
    return joined.select(
        F.col("join_key").alias(key),
        F.unix_millis(F.col("w.start")).alias("window_start"),
        *[c for c in joined.columns if c.endswith(suffixes[0]) or c.endswith(suffixes[1])],
    )
