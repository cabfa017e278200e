"""Row-level transforms: projection, filter, split, merge (SURVEY.md §2.3).

All four reference capabilities (T1-T4) are pure narrow operations here —
no shuffle, fully pipelined inside whole-stage codegen, and filters/
projections push down to the parquet scan. They work identically on batch
and streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def parse_project(events: DataFrame) -> DataFrame:
    """T1 — typed projection + literal tagging.

    Reference: string->POJO parse + POJO->tuple projection adding count=1
    (``chapter2/BasicStreamingOperations.java:64-71,86-88``). The CSV parse
    itself is the source's job (sources.batch/files); here we keep the
    canonical "project columns + lit(1)" shape.
    """
    return events.select(
        "event_id", "user_id", "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        F.lit(1).alias("cnt"),
    )


def keep(df: DataFrame, predicate: Column) -> DataFrame:
    """T2 — filter (``chapter5/StatefulOperations.java:129-143``)."""
    return df.filter(predicate)


def split_stream(df: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """T3 — predicate split (side-output pattern).

    Reference routes rows to a main vs side output in one ProcessFunction
    pass (``chapter2/StreamSplitAndMerge.java:68-102``). Spark-first form:
    two filters over one lineage — Catalyst pushes both predicates to the
    scan, and with cached/ exchange-reused input the source is read once.
    """
    return df.filter(predicate), df.filter(~predicate)


def merge_streams(branches: dict[str, DataFrame], columns: list[str]) -> DataFrame:
    """T4 — heterogeneous merge (connect + CoMapFunction).

    Reference normalizes two differently-typed streams to a common tuple
    then co-processes (``chapter2/StreamSplitAndMerge.java:114-167``).
    Spark-first: normalize each branch to the shared schema with a literal
    source tag, then unionByName — an O(0) narrow op, no shuffle.
    """
    out = None
    for tag, df in branches.items():
        b = df.select(F.lit(tag).alias("src"), *columns)
        out = b if out is None else out.unionByName(b)
    assert out is not None, "merge_streams needs at least one branch"
    return out
