"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``demo_apache_flink_streaming_mode_spark``
(operators + plans.registry); this module only adapts it to the
driver's entry-point shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from demo_apache_flink_streaming_mode_spark.plans import registry
from demo_apache_flink_streaming_mode_spark.session import ensure_runtime_confs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A4 keyed tumbling window count) on sf0.001."""
    ensure_runtime_confs(spark)
    return registry.get(registry.FLAGSHIP).fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.10)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (column names/types aligned)."""
    return registry.oracle_sql()
