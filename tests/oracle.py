"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables and compares row count, column names, and the
order-insensitive multiset of row values (exact equality, floats
included — the engine's numerics are designed to be bit-identical).
"""

from __future__ import annotations

import math

import duckdb

from demo_apache_flink_streaming_mode_spark.schemas import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        return ("nan",) if math.isnan(v) else ("f", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return v


def compare(spark_df, con, sql: str) -> list[str]:
    """Return list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    sdf = spark_df.toPandas()
    odf = con.execute(sql).fetchdf()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return [f"columns differ: spark={scols} oracle={ocols}"]
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    srows = sorted(
        (tuple(_norm(v) for v in row) for row in sdf[scols].itertuples(index=False)),
        key=repr)
    orows = sorted(
        (tuple(_norm(v) for v in row) for row in odf[scols].itertuples(index=False)),
        key=repr)
    if srows != orows:
        only_s = [r for r in srows if r not in set(map(tuple, orows))][:3]
        only_o = [r for r in orows if r not in set(map(tuple, srows))][:3]
        problems.append(
            f"values differ; spark-only sample={only_s} oracle-only sample={only_o}")
    return problems
