"""Edge-case tests for asof_join and salted_join (hand-built inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators.joins import asof_join
from demo_apache_flink_streaming_mode_spark.operators.scale import salted_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 5, "t1"), ("A", 10, "t2"), ("A", 20, "t3"), ("B", 7, "t4")],
        "sym string, t_ms long, trade_id string")
    quotes = spark.createDataFrame(
        [("A", 4, 100.0), ("A", 10, 101.0), ("A", 15, 102.0), ("C", 1, 9.0)],
        "sym string, q_ms long, px double")
    return trades, quotes


def test_asof_picks_latest_at_or_before(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {r["trade_id"]: (r["q_ms"], r["px"])
           for r in asof_join(trades, quotes, "sym", "t_ms", "q_ms").collect()}
    assert out["t1"] == (4, 100.0)        # strictly-before quote
    assert out["t2"] == (10, 101.0)       # equal timestamp IS visible (<=)
    assert out["t3"] == (15, 102.0)       # latest of several, not just any
    assert out["t4"] == (None, None)      # key with no quotes -> nulls


def test_asof_no_right_rows_at_all(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes.filter(F.lit(False)), "sym", "t_ms", "q_ms")
    rows = out.collect()
    assert len(rows) == 4 and all(r["px"] is None for r in rows)


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("lv"))
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(7)], "k long, rv string")
    plain = sorted(left.join(right, "k").collect())
    salted = sorted(salted_join(left, right, "k", buckets=8).collect())
    assert plain == salted


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, lv string")
    right = spark.createDataFrame([(1, "x")], "k long, rv string")
    rows = {r["k"]: r["rv"]
            for r in salted_join(left, right, "k", buckets=4, how="left").collect()}
    assert rows == {1: "x", 99: None}


def test_salted_join_rejects_right_outer(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="right")


def test_interval_join_boundaries_and_bins(spark):
    from demo_apache_flink_streaming_mode_spark.operators.joins import interval_join
    left = spark.createDataFrame([(1, 1000), (2, 5000)], "lid long, lt long")
    right = spark.createDataFrame(
        [(10, 899), (11, 900), (12, 1100), (13, 1101), (14, 999_999),
         (15, 4899), (16, 4900), (17, 5100), (18, 5101)],
        "rid long, rt long")
    out = sorted((r["lid"], r["rid"]) for r in
                 interval_join(left, right, "lt", "rt", -100, 100).collect())
    # inclusive at both edges, exclusive just past them, bins can't drop pairs
    assert out == [(1, 11), (1, 12), (2, 16), (2, 17)]


def test_interval_join_one_sided_lag(spark):
    from demo_apache_flink_streaming_mode_spark.operators.joins import interval_join
    left = spark.createDataFrame([(1, 1000)], "lid long, lt long")
    right = spark.createDataFrame([(10, 985), (11, 995), (12, 1004)],
                                  "rid long, rt long")
    out = sorted(r["rid"] for r in
                 interval_join(left, right, "lt", "rt", -15, -5).collect())
    assert out == [10, 11]  # strictly-before window [lt-15, lt-5]


def test_interval_join_rejects_empty_interval(spark):
    from demo_apache_flink_streaming_mode_spark.operators.joins import interval_join
    import pytest as pt
    df = spark.createDataFrame([(1, 1)], "a long, t long")
    with pt.raises(ValueError):
        interval_join(df, df.withColumnRenamed("a", "b"), "t", "t", 5, 5)
