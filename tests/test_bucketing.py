"""Bucketed-table co-located join: the declare-the-layout-once scale
path (operators.scale.write_bucketed).

Writes lineitem + orders bucketed by orderkey into the session
warehouse, then asserts the bucket-to-bucket join plan contains NO
Exchange on either side (with broadcast disabled so the assertion is
meaningful) and returns exactly the unbucketed join's rows."""

from __future__ import annotations

import pytest

from demo_apache_flink_streaming_mode_spark.operators.scale import write_bucketed
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def bucketed_tables(spark):
    from pyspark.sql import functions as F
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    write_bucketed(orders, "b_orders", "l_orderkey", buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_shuffle(spark, no_broadcast, bucketed_tables):
    j = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_join_matches_plain_join(spark, no_broadcast, bucketed_tables):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders")
    plain = li.join(orders,
                    li.l_orderkey == orders.o_orderkey).count()
    assert spark.table("b_lineitem").join(
        spark.table("b_orders"), "l_orderkey").count() == plain


def test_judged_bucketed_query_join_no_exchange(spark, no_broadcast):
    """The JUDGED query q_bucketed_join_priority must actually exploit
    the layout: its join (both sides pre-bucketed+sorted by the key)
    plans with ZERO Exchange and zero per-task Sort; only the final
    5-row groupBy may shuffle. Guards the scale claim behind the green
    driver row."""
    from demo_apache_flink_streaming_mode_spark.plans.queries_tpch import (
        _bucketed_orders_lineitem, q_bucketed_join_priority)
    o, l = _bucketed_orders_lineitem(spark, SF)
    j = o.hint("merge").join(l, o["o_orderkey"] == l["l_orderkey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed judged join shuffles:\n" + plan
    assert "SortMergeJoin" in plan
    # bucket-sorted writes make the SMJ sort-free too
    assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
    # end-to-end: exactly one exchange total (the tiny final agg)
    full = q_bucketed_join_priority(spark, SF)
    fplan = full._jdf.queryExecution().executedPlan().toString()
    # the only allowed shuffle is the final agg's (partial aggs feed
    # one Exchange on o_orderpriority — 5 distinct values)
    assert fplan.count("Exchange") <= 2, fplan


def test_write_bucketed_rejects_append(spark):
    """mode='append' would put a second file in each bucket; under the
    session's legacy bucketedTableScan.outputOrdering=true the reader
    would skip the per-task Sort over unsorted concatenated input —
    silently wrong SMJ results. write_bucketed must refuse up front
    (r5 ADVICE)."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    with pytest.raises(ValueError, match="one-file-per-bucket"):
        write_bucketed(li, "b_reject_append", "l_orderkey", buckets=8,
                       mode="append")
    assert not spark.catalog.tableExists("b_reject_append")


def test_write_bucketed_asserts_single_file_buckets(spark, bucketed_tables):
    """The post-write invariant check runs and passes on a proper
    repartition-first write; a hand-broken multi-file layout fails it."""
    from demo_apache_flink_streaming_mode_spark.operators.scale import (
        assert_single_file_buckets)
    assert_single_file_buckets(spark, "b_lineitem", 8)  # passes
    with pytest.raises(AssertionError, match="multi-file buckets"):
        assert_single_file_buckets(spark, "b_lineitem", 1)


def test_bucketed_agg_no_shuffle(spark, no_broadcast, bucketed_tables):
    """groupBy on the bucket key also exploits the layout: the partial/
    final aggregate pair collapses to one stage, no exchange."""
    agg = spark.table("b_lineitem").groupBy("l_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed groupBy still shuffles:\n" + plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy layout: a filter on the partition column
    must surface as a PartitionFilter (directories skipped at planning
    time — the 100 TB table-layout counterpart to predicate pushdown,
    which only prunes row groups WITHIN files)."""
    from pyspark.sql import functions as F
    from demo_apache_flink_streaming_mode_spark.sources.batch import load_table
    ev = load_table(spark, SF, "events").select("event_id", "event_type", "value")
    out = str(tmp_path / "by_type")
    ev.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "event_type" in seg, f"partition filter not applied: {seg}"
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across write batches: a later batch adds a
    column; mergeSchema reads both vintages with the union schema and
    NULLs for the missing column — the 100 TB reality of tables whose
    schema grows over years of writes."""
    from pyspark.sql import functions as F
    out = str(tmp_path / "evolving")
    v1 = spark.range(3).select(F.col("id"), F.lit("a").alias("tag"))
    v1.write.parquet(out + "/batch=1")
    v2 = spark.range(3, 6).select(F.col("id"), F.lit("b").alias("tag"),
                                  (F.col("id") * 10).alias("score"))
    v2.write.parquet(out + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "tag", "score", "batch"}
    rows = {r["id"]: (r["tag"], r["score"]) for r in merged.collect()}
    assert rows[0] == ("a", None) and rows[5] == ("b", 50)
    assert len(rows) == 6
