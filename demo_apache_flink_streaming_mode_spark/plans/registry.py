"""Merged query registry — the engine's judged surface.

``queries()`` / ``oracle_sql()`` feed ``__spark_entry__.py`` (the
driver contract); tests and bench.py iterate the same registry.
"""

from __future__ import annotations

from demo_apache_flink_streaming_mode_spark.plans import queries_events, queries_llm, queries_tpch
from demo_apache_flink_streaming_mode_spark.plans.base import Query, QueryFn

ALL_QUERIES: list[Query] = (
    queries_events.QUERIES + queries_tpch.QUERIES + queries_llm.QUERIES
)

_BY_NAME: dict[str, Query] = {q.name: q for q in ALL_QUERIES}
assert len(_BY_NAME) == len(ALL_QUERIES), "duplicate query names"

FLAGSHIP = "a4_tumbling_count_keyed"


def get(name: str) -> Query:
    return _BY_NAME[name]


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in ALL_QUERIES}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in ALL_QUERIES if q.oracle is not None}
