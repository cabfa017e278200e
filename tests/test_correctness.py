"""Mirror of the driver's correctness gate: every registry query vs its
DuckDB oracle (row count + columns + order-insensitive values)."""

from __future__ import annotations

import pytest

from demo_apache_flink_streaming_mode_spark.plans.registry import ALL_QUERIES

from tests.oracle import compare, duckdb_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("query", [q for q in ALL_QUERIES if q.oracle],
                         ids=lambda q: q.name)
def test_query_matches_oracle(spark, con, query):
    problems = compare(query.fn(spark, SF), con, query.oracle)
    assert not problems, f"{query.name}: " + "; ".join(problems)


@pytest.mark.parametrize("query", [q for q in ALL_QUERIES if not q.oracle],
                         ids=lambda q: q.name)
def test_rows_only_queries_run(spark, query):
    assert query.fn(spark, SF).count() >= 0
