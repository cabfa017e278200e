"""Analytic queries over the TPC-H-ish star schema.

The reference has no SQL/analytic layer — these exercise the engine
surface SURVEY.md §2.9 says we get from the DataFrame API (multi-way
joins, outer/semi/anti, rollup, pivot, ranking, distinct aggregates) and
are where join-strategy/scale decisions show: fixed-size dims
(region/nation) are broadcast explicitly; everything else is left to
Catalyst + AQE (sort-merge or shuffled hash on the join keys, skew
handled at runtime).

Engine-portable numerics: every double aggregate goes through
DECIMAL(38,6) (see functions.scalars.decimal_sum); timestamps are
projected as epoch-ms BIGINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import decimal_sum
from demo_apache_flink_streaming_mode_spark.plans.base import Query
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table


def _dsum(col):
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates.

    The shipdate filter + 7-column projection push down to the parquet
    scan; partial aggregation leaves 4 groups to shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2000-12-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(decimal_sum("l_quantity").alias("sum_qty"),
                 decimal_sum("l_extendedprice").alias("sum_base_price"),
                 _dsum(disc_price).alias("sum_disc_price"),
                 _dsum(charge).alias("sum_charge"),
                 (decimal_sum("l_quantity") / F.count("*")).alias("avg_qty"),
                 (decimal_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
                 (decimal_sum("l_discount") / F.count("*")).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + top-10 by aggregated revenue."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("l_orderkey",
                     F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
                     "o_orderpriority")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join through region->nation->cust/supp.

    region (5 rows) and nation (25 rows) are broadcast — they stay
    fixed-size at any scale factor, so this holds at 100 TB.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region")
                         .filter(F.col("r_name") == "ASIA"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, sf_dir, "lineitem")
    return (li
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(customer, (F.col("o_custkey") == F.col("c_custkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue")))


def q_top3_parts_per_brand(spark, sf_dir):
    """Top-k per group via ranking window (deterministic tie-break)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (li.join(part, F.col("l_partkey") == F.col("p_partkey"))
           .groupBy("p_brand", "p_partkey")
           .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("revenue")))
    from pyspark.sql import Window as W
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (rev.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("p_brand", "rnk", "p_partkey", "revenue"))


def q_customers_without_orders(spark, sf_dir):
    """Anti join (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .select("c_custkey", "c_name"))


def q_customers_with_big_order(spark, sf_dir):
    """Semi join (EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (cust.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .select("c_custkey", "c_acctbal"))


def q_rollup_status(spark, sf_dir):
    """ROLLUP grouping sets with count + exact decimal sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"), decimal_sum("l_quantity").alias("sum_qty")))


def q_cube_status(spark, sf_dir):
    """CUBE grouping sets — all 2^k margin combinations (vs ROLLUP's
    hierarchy), same single-shuffle grouping-sets expansion."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 decimal_sum("l_quantity").alias("sum_qty")))


def q_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT set semantics (§2.9: absent in the reference,
    free here): customers who bought in 1996 but not in 1997, plus the
    count of those who bought in both — one query touching both
    distinct-set operators.
    """
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter((F.col("o_orderdate") >= "1996-01-01")
                        & (F.col("o_orderdate") < "1997-01-01")
                        ).select("o_custkey")
    y97 = orders.filter((F.col("o_orderdate") >= "1997-01-01")
                        & (F.col("o_orderdate") < "1998-01-01")
                        ).select("o_custkey")
    churned = y96.subtract(y97).select(
        F.col("o_custkey").alias("custkey"), F.lit("churned").alias("cohort"))
    both = (y96.intersect(y97)
            .select(F.col("o_custkey").alias("custkey"),
                    F.lit("retained").alias("cohort")))
    return churned.unionByName(both)


def q_pivot_status(spark, sf_dir):
    """Pivot: order counts per status column, per priority row."""
    orders = load_table(spark, sf_dir, "orders")
    return (orders.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"]).count()
            .na.fill(0)
            .select("o_orderpriority",
                    F.col("F").alias("n_f"), F.col("O").alias("n_o"),
                    F.col("P").alias("n_p")))


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: single-table multi-predicate scan + one sum.

    All three predicates (date range, discount band, quantity cap) push
    down to the parquet scan; the agg is a single partial+final sum —
    the cheapest possible plan shape, and the canonical pushdown check.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"))
                  .alias("revenue"))


def q_sql_text_interface(spark, sf_dir):
    """SURVEY §2.9 claims the SQL-text surface comes at zero marginal
    cost because the DataFrame API is the engine's substrate — this
    query PROVES it: a grouped revenue aggregate written as SQL TEXT
    over registered temp views, hitting the same Catalyst pipeline
    (pushdown, pruning, partial aggregation) as every DataFrame query.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sql_li")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("sql_part")
    return spark.sql("""
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM sql_li JOIN sql_part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        GROUP BY p_brand
    """)


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: join + conditional aggregate ratio.

    Part is the build side; the promo share is two decimal sums (both
    order-independent) divided once at the end — deterministic double.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01"))
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0.0))
    return (li.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .agg((F.lit(100.0) * _dsum(promo) / _dsum(disc))
                 .alias("promo_revenue")))


def q_salted_join_priority(spark, sf_dir):
    """Skew-resistant salted equi-join (operators.scale.salted_join).

    lineitem joins orders on (orderkey, salt) with orders replicated per
    salt bucket, so a pathologically hot orderkey would spread over 16
    tasks. Values are identical to the plain join — the oracle IS the
    plain join.
    """
    from demo_apache_flink_streaming_mode_spark.operators.scale import salted_join
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (salted_join(li, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                        "l_orderkey", buckets=16)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_lines"),
                 decimal_sum("l_quantity").alias("sum_qty")))


def _bucketed_orders_lineitem(spark, sf_dir):
    """Persist orders + lineitem bucketed AND bucket-sorted by the join
    key (``operators.scale.write_bucketed``, 8 buckets), once per
    (session, sf) — the declare-the-layout-once scale path. Table
    names carry the sf tag so sf0.001 warmup and sf0.1 bench runs keep
    separate layouts, plus the pid (see below); ``tableExists`` makes
    repeated calls within a session (bench passes) reuse the files.
    Returns (orders_table, lineitem_table) DataFrames whose merge join
    needs NO Exchange on either side (asserted in
    tests/test_bucketing.py)."""
    import os
    import re
    import shutil
    from urllib.parse import urlparse
    from demo_apache_flink_streaming_mode_spark.operators.scale import (
        write_bucketed)
    tag = re.sub(r"[^0-9a-z]", "_",
                 os.path.basename(sf_dir.rstrip("/")).lower())
    # pid-scoped names (r5 ADVICE): the in-memory catalog is
    # per-session, so a fresh session always rewrote anyway — but two
    # LIVE sessions sharing one warehouse dir (bench and driver_check
    # in parallel) could rmtree each other's files mid-read under a
    # shared name. A pid suffix makes collision impossible; dead
    # sessions' leftover dirs are reclaimed on pid reuse below, and
    # the warehouse is disposable test state.
    ot = f"b5_orders_{tag}_{os.getpid()}"
    lt = f"b5_lineitem_{tag}_{os.getpid()}"

    def ensure(name, df, key):
        if spark.catalog.tableExists(name):
            return
        # pid reuse: an earlier dead process with this pid may have
        # left files while this session's catalog lacks the table —
        # saveAsTable would refuse (LOCATION_ALREADY_EXISTS); the name
        # is pid-scoped, so only dead-session leftovers are removed
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        write_bucketed(df, name, key, buckets=8)

    ensure(ot, load_table(spark, sf_dir, "orders")
           .select("o_orderkey", "o_orderpriority"), "o_orderkey")
    ensure(lt, load_table(spark, sf_dir, "lineitem")
           .select("l_orderkey", "l_quantity"), "l_orderkey")
    return spark.table(ot), spark.table(lt)


def q_bucketed_join_priority(spark, sf_dir):
    """Shuffle-free co-located join via bucketed table layout: both
    sides pre-bucketed+sorted on the join key, so the merge join runs
    with no Exchange (and no per-task Sort) on either side — Spark's
    answer to the reference's keyBy partitioning contract, paid once at
    write time and reused by every downstream join. Values are
    identical to the plain join — the oracle IS the plain join (same
    SQL as the salted variant, which proves all three plans agree)."""
    o, l = _bucketed_orders_lineitem(spark, sf_dir)
    return (o.hint("merge")
            .join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_lines"),
                 decimal_sum("l_quantity").alias("sum_qty")))


def q_distinct_parts_per_supplier(spark, sf_dir):
    """Exact distinct aggregate (expands to two-phase agg in the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_suppkey")
            .agg(F.countDistinct("l_partkey").alias("n_parts"),
                 F.count("*").alias("n_items")))


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 3-way join over returned lineitems, revenue per
    customer, deterministic top-20.

    Returnflag filter + projection push to the lineitem scan; customer
    is small relative to lineitem but unbounded, so the join strategy is
    left to Catalyst/AQE (sort-merge or shuffled hash on the keys) —
    only the provably-fixed-size dims get explicit broadcast hints in
    this module.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(cust, F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
           .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("revenue")))
    return (rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20))


def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join + two-level aggregation
    (orders per customer, then customers per order count).

    The outer join keeps order-less customers (count 0); the second
    groupBy's input is one row per customer, so the distribution agg is
    tiny. TakeOrderedAndProject is avoided — the result is the full
    distribution, a handful of rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING subquery (orders whose total quantity
    exceeds a threshold) joined back to customer + orders.

    The qualifying-orderkey set is produced by a decimal-sum groupBy
    over lineitem and is small by construction -> broadcast to the
    detail join; the final quantity re-aggregation groups one row per
    (customer, order) pair.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(decimal_sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 150))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (orders.join(F.broadcast(big),
                        F.col("o_orderkey") == F.col("l_orderkey"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_name", "o_orderkey",
                    F.col("o_totalprice"), F.col("total_qty")))


def q4_late_shipments(spark, sf_dir):
    """TPC-H Q4 shape: correlated-EXISTS semi join with a cross-table
    predicate — orders (one quarter) having at least one lineitem
    shipped more than 60 days after the order date, counted by
    priority.

    The semi join carries a non-equi component (l_shipdate >
    o_orderdate + 60 days), so the dedup happens in the join itself —
    no distinct/exists materialization; priority counts aggregate one
    row per qualifying order.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01"))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = ((F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")
               + F.expr("INTERVAL 60 DAYS")))
    return (orders.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


def q12_priority_by_returnflag(spark, sf_dir):
    """TPC-H Q12 shape: join + two-bucket conditional counts per
    category (urgent vs non-urgent orders per lineitem return flag,
    one ship year)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.count(F.when(urgent, 1)).alias("high_line_count"),
                 F.count(F.when(~urgent, 1)).alias("low_line_count")))


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue per supplier, then a scalar-subquery
    max filter (the 'view + where revenue = (select max)' form).

    The max side is a 1-row aggregate of the already-aggregated
    per-supplier revenue -> broadcast; equality on the decimal-sum
    double is engine-portable because both sides compute the identical
    value.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    sup = load_table(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("total_revenue")))
    top = rev.agg(F.max("total_revenue").alias("mr"))
    return (rev.join(F.broadcast(top), F.col("total_revenue") == F.col("mr"))
            .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue"))


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: per-part average-quantity subquery joined back
    to the detail rows (lineitems below half their part's average
    quantity, for one brand), then a single-scalar revenue sum.

    The avg subquery aggregates lineitem once per part and is bounded
    by |part| -> broadcast to the detail join; the threshold compare
    (0.5 * decimal-sum avg) is the same double op chain on both
    engines.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    avg_q = (li.join(F.broadcast(part),
                     F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("l_partkey")
             .agg((decimal_sum("l_quantity") / F.count("*")).alias("avg_qty")))
    return (li.join(F.broadcast(avg_q.withColumnRenamed("l_partkey", "ap")),
                    (F.col("l_partkey") == F.col("ap"))
                    & (F.col("l_quantity") < 0.5 * F.col("avg_qty")))
            .agg((_dsum(F.col("l_extendedprice")) / F.lit(7.0))
                 .alias("avg_yearly")))


def q19_disjunctive_pricing(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs join predicate (three brand/size/
    quantity bands) — the disjunct-pushdown stress: each AND-clause
    constrains both sides, and the common l_partkey = p_partkey
    equi-component must still drive the join strategy.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(5, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 35)))
    return j.filter(band).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"))


def q22_idle_balance(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold (global average
    positive balance) + anti join (customers with no orders), grouped
    by market segment.

    The global-average side is a 1-row broadcast; the anti join is the
    same LeftAnti the q_customers_without_orders query proves, here
    composed under a cross-filter.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg((decimal_sum("c_acctbal") / F.count("*")).alias("ab")))
    rich = (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab")))
    idle = rich.join(orders, F.col("c_custkey") == F.col("o_custkey"),
                     "left_anti")
    return (idle.groupBy("c_mktsegment")
            .agg(F.count("*").alias("numcust"),
                 decimal_sum("c_acctbal").alias("totacctbal")))


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    ship year — the nation dim joins twice (supplier side + customer
    side) under a symmetric OR pair predicate.

    Both nation legs broadcast (25 rows at any scale); the OR pair
    filter runs after the name attach, so the big joins stay pure
    equi-joins on their keys.
    """
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nkey"),
                                   F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nkey"),
                                   F.col("n_name").alias("cust_nation")))
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    pair = (((F.col("supp_nation") == "NATION_12")
             & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10")
               & (F.col("cust_nation") == "NATION_12")))
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
            .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue")))


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's market share of a region's imports
    of one part type, per order year — a conditional-aggregate ratio
    over an 8-way join.

    part (type filter) bounds the detail early; region/nation legs are
    broadcast; the share is two decimal sums (conditional numerator /
    total) divided once — engine-portable.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region")
                         .filter(F.col("r_name") == "AMERICA"))
    nation = load_table(spark, sf_dir, "nation")
    n_cust = F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"),
                                       F.col("n_regionkey").alias("cn_rkey")))
    n_supp = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                       F.col("n_name").alias("supp_nation")))
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY").select("p_partkey")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("supp_nation") == "NATION_12", vol).otherwise(
        F.lit(0.0))
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
            .join(region, F.col("cn_rkey") == F.col("r_regionkey"))
            .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg((_dsum(national) / _dsum(vol)).alias("mkt_share")))


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted): profit per supplier nation per order
    year over parts matching a name substring.

    Adaptation: the synthetic schema has no partsupp table, so profit
    is l_extendedprice*(1-l_discount) without the ps_supplycost
    subtraction — the join/agg shape (part name filter -> detail ->
    supplier nation x order year rollup) is what's exercised.
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")).select("p_partkey")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("sum_profit")))


def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted): suppliers who were the SOLE late
    shipper on a finished multi-supplier order — the double-correlated
    EXISTS + NOT EXISTS pattern.

    Adaptation: the synthetic lineitem has no commit/receipt dates, so
    "late" is l_shipdate > o_orderdate + 90 days. Both correlated legs
    are equi-joins on l_orderkey with a suppkey-inequality residual
    (semi for "another supplier exists", anti for "no other late
    supplier") — no distinct materialization, no cross product.
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation")
                         .filter(F.col("n_name") == "NATION_3"))
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    others = li.select(F.col("l_orderkey").alias("o2_okey"),
                       F.col("l_suppkey").alias("o2_skey"))
    late_others = late.select(F.col("l_orderkey").alias("o3_okey"),
                              F.col("l_suppkey").alias("o3_skey"))
    l1 = (late
          .join(others, (F.col("o2_okey") == F.col("l_orderkey"))
                & (F.col("o2_skey") != F.col("l_suppkey")), "left_semi")
          .join(late_others, (F.col("o3_okey") == F.col("l_orderkey"))
                & (F.col("o3_skey") != F.col("l_suppkey")), "left_anti"))
    return (l1.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("s_suppkey", "s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(20))


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted): minimum-cost supplier per part — the
    correlated-MIN-subquery pattern, resolved as aggregate + self-join.

    Adaptation: the synthetic schema has no partsupp, so supply cost of
    a (part, supplier) pair is the minimum observed unit price
    min(l_extendedprice / l_quantity) in lineitem — exact IEEE double
    division + MIN, identical on both engines.  The correlated
    "= (SELECT MIN(cost) ... WHERE same part)" becomes a per-part MIN
    aggregate joined back on (partkey, cost): one shuffle keyed by
    partkey for the aggregate, the join reuses the same key.  The dim
    chain (supplier -> nation -> region, EUROPE only) broadcasts the
    fixed-size nation/region; supplier stays an equi-join.  The size
    filter prunes part before anything wide happens.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region")
                         .filter(F.col("r_name") == "EUROPE"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") == 15).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    cost = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("cost")))
    pc = (cost.join(part, F.col("l_partkey") == F.col("p_partkey"))
          .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
          .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
          .join(region, F.col("n_regionkey") == F.col("r_regionkey")))
    min_cost = (pc.groupBy(F.col("p_partkey").alias("mc_pkey"))
                .agg(F.min("cost").alias("min_cost")))
    return (pc.join(min_cost, (F.col("p_partkey") == F.col("mc_pkey"))
                    & (F.col("cost") == F.col("min_cost")))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost")
            .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                     F.asc("p_partkey"))
            .limit(100))


def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (adapted): per-part inventory value filtered by a
    scalar-subquery threshold over the whole filtered set.

    Adaptation: no partsupp, so value(part) = sum(l_extendedprice *
    l_quantity) over lineitems shipped by suppliers of one nation; and
    because TPC-H's fixed FRACTION is itself spec'd to scale as
    0.0001/SF, the threshold here is the scale-free above-mean form:
    total / count(distinct part).  Both sides of the comparison are
    exact DECIMAL(38,6) sums cast to double, so the HAVING is
    engine-portable.  The 1-row threshold broadcasts; the only wide
    shuffle is the per-part aggregate.
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation")
                         .filter(F.col("n_name") == "NATION_3"))
    supplier = load_table(spark, sf_dir, "supplier")
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
          .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
          .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
          .select("l_partkey",
                  (F.col("l_extendedprice") * F.col("l_quantity")).alias("v")))
    val = li.groupBy("l_partkey").agg(_dsum(F.col("v")).alias("value"))
    thresh = li.agg((_dsum(F.col("v")) / F.countDistinct("l_partkey"))
                    .alias("thresh"))
    return (val.crossJoin(F.broadcast(thresh))
            .filter(F.col("value") > F.col("thresh"))
            .select("l_partkey", "value")
            .orderBy(F.desc("value"), F.asc("l_partkey")))


def q16_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier count per (brand, type, size)
    for an attribute band, minus a NOT-IN excluded-supplier set.

    Adaptation: the synthetic supplier has no comment column, so the
    Q16 '%Customer%Complaints%' exclusion becomes the low-balance set
    s_acctbal < 1200 — same NOT IN -> LeftAnti plan.  The excluded set
    is supplier-bounded (tiny vs lineitem) and hits the anti join
    before the wide distinct aggregate, so excluded rows never shuffle.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1200).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    return (li.join(excluded, F.col("l_suppkey") == F.col("s_suppkey"),
                    "left_anti")
            .join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"),
                     F.asc("p_type"), F.asc("p_size")))


def q20_promotion_candidates(spark, sf_dir):
    """TPC-H Q20 shape (adapted): suppliers qualified through a nested
    IN chain — part-name prefix -> per-(part, supplier) quantity
    exceeding half the part's single-year total -> supplier semi-join,
    nation-filtered.

    Adaptation: no partsupp availqty, so the correlated "availqty >
    0.5 * qty shipped that year" becomes "supplier's all-time shipped
    qty for the part > 0.5 * the part's 1996 total".  Both quantity
    sums are exact decimal sums; the candidate join is keyed on
    partkey on both sides (no broadcast of part-scaled sets — at
    100 TB part scales with SF, so AQE decides), and the final
    supplier qualification is a LeftSemi.
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation")
                         .filter(F.col("n_name") == "NATION_3"))
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    li_p = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    sp = (li_p.groupBy("l_partkey", "l_suppkey")
          .agg(decimal_sum("l_quantity").alias("sqty")))
    q96 = (li_p.filter((F.col("l_shipdate") >= "1996-01-01")
                       & (F.col("l_shipdate") < "1997-01-01"))
           .groupBy(F.col("l_partkey").alias("q_pkey"))
           .agg(decimal_sum("l_quantity").alias("qty96")))
    cand = (sp.join(q96, (F.col("l_partkey") == F.col("q_pkey"))
                    & (F.col("sqty") > 0.5 * F.col("qty96")))
            .select(F.col("l_suppkey").alias("c_skey")))
    return (supplier
            .join(cand, F.col("s_suppkey") == F.col("c_skey"), "left_semi")
            .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", "s_acctbal")
            .orderBy(F.asc("s_name")))


_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"

ORACLES = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_DSUM.format(x='l_quantity')} AS sum_qty,
               {_DSUM.format(x='l_extendedprice')} AS sum_base_price,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {_DSUM.format(x='l_quantity')} / COUNT(*) AS avg_qty,
               {_DSUM.format(x='l_extendedprice')} / COUNT(*) AS avg_price,
               {_DSUM.format(x='l_discount')} / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY 1, 2""",
    "q3_shipping_priority": f"""
        SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10""",
    "q5_local_supplier_volume": f"""
        SELECT n_name,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN supplier ON s_nationkey = n_nationkey
        JOIN customer ON c_nationkey = s_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1""",
    "q_top3_parts_per_brand": f"""
        WITH rev AS (
          SELECT p_brand, p_partkey,
                 {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        ranked AS (
          SELECT p_brand, p_partkey, revenue,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY revenue DESC, p_partkey ASC) AS rnk
          FROM rev)
        SELECT p_brand, CAST(rnk AS INT) AS rnk, p_partkey, revenue
        FROM ranked WHERE rnk <= 3""",
    "q_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_customers_with_big_order": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "q_rollup_status": f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               {_DSUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_set_ops": """
        WITH y96 AS (SELECT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o_orderdate <  TIMESTAMP '1997-01-01'),
             y97 AS (SELECT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                       AND o_orderdate <  TIMESTAMP '1998-01-01')
        SELECT o_custkey AS custkey, 'churned' AS cohort
        FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
        UNION ALL
        SELECT o_custkey AS custkey, 'retained' AS cohort
        FROM (SELECT o_custkey FROM y96 INTERSECT
              SELECT o_custkey FROM y97)""",
    "q_cube_status": f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               {_DSUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q_pivot_status": """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY 1""",
    "q6_forecast_revenue": f"""
        SELECT {_DSUM.format(x='l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24""",
    "q14_promo_revenue": f"""
        SELECT 100.0 * {_DSUM.format(
            x="CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'""",
    "q_salted_join_priority": f"""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               {_DSUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1""",
    # the bucketed layout must not change a single value: same plain
    # join as the salted variant's oracle
    "q_bucketed_join_priority": f"""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               {_DSUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1""",
    "q_distinct_parts_per_supplier": """
        SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_items
        FROM lineitem GROUP BY 1""",
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q13_order_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY 1)
        GROUP BY 1""",
    "q18_large_orders": f"""
        WITH big AS (SELECT l_orderkey,
                            {_DSUM.format(x='l_quantity')} AS total_qty
                     FROM lineitem GROUP BY 1
                     HAVING {_DSUM.format(x='l_quantity')} > 150)
        SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
        FROM orders
        JOIN big      ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey""",
    "q4_late_shipments": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1""",
    "q12_priority_by_returnflag": """
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                 AS high_line_count,
               COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1""",
    "q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey,
                 {_DSUM.format(x='l_extendedprice * (1 - l_discount)')}
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
    "q17_small_quantity_revenue": f"""
        WITH avg_q AS (
          SELECT l_partkey,
                 {_DSUM.format(x='l_quantity')} / COUNT(*) AS avg_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
          GROUP BY 1)
        SELECT {_DSUM.format(x='l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem JOIN avg_q ON lineitem.l_partkey = avg_q.l_partkey
        WHERE l_quantity < 0.5 * avg_qty""",
    "q19_disjunctive_pricing": f"""
        SELECT {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 5 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 35)""",
    "q22_idle_balance": f"""
        WITH ab AS (
          SELECT {_DSUM.format(x='c_acctbal')} / COUNT(*) AS ab
          FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment, COUNT(*) AS numcust,
               {_DSUM.format(x='c_acctbal')} AS totacctbal
        FROM customer, ab
        WHERE c_acctbal > ab
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1""",
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
            OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        GROUP BY 1, 2, 3""",
    "q8_market_share": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {_DSUM.format(
                   x="CASE WHEN n2.n_name = 'NATION_12'"
                     " THEN l_extendedprice * (1 - l_discount)"
                     " ELSE 0.0 END")}
             / {_DSUM.format(x='l_extendedprice * (1 - l_discount)')}
               AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1""",
    "q9_product_profit": f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')}
                 AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2""",
    "q21_waiting_supplier": """
        SELECT s_suppkey, s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders   ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20""",
    "q_sql_text_interface": f"""
        SELECT p_brand,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY p_brand""",
    "q2_min_cost_supplier": """
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
                 MIN(l_extendedprice / l_quantity) AS cost
          FROM lineitem GROUP BY 1, 2),
        pc AS (
          SELECT p_partkey, s_acctbal, s_name, n_name, cost
          FROM cost
          JOIN part     ON l_partkey = p_partkey AND p_size = 15
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, p_partkey, cost
        FROM pc
        WHERE cost = (SELECT MIN(cost) FROM pc p2
                      WHERE p2.p_partkey = pc.p_partkey)
        ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        LIMIT 100""",
    "q11_important_stock": f"""
        WITH li AS (
          SELECT l_partkey, l_extendedprice * l_quantity AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3')
        SELECT l_partkey, {_DSUM.format(x='v')} AS value
        FROM li GROUP BY 1
        HAVING {_DSUM.format(x='v')} >
               (SELECT {_DSUM.format(x='v')} / COUNT(DISTINCT l_partkey)
                FROM li)
        ORDER BY value DESC, l_partkey ASC""",
    "q16_supplier_count": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
          AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 1200)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""",
    "q20_promotion_candidates": f"""
        WITH sp AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 {_DSUM.format(x='l_quantity')} AS sqty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%' GROUP BY 1, 2),
        q96 AS (
          SELECT l_partkey AS pk, {_DSUM.format(x='l_quantity')} AS qty96
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY 1)
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (SELECT sk FROM sp JOIN q96 USING (pk)
                            WHERE sqty > 0.5 * qty96)
        ORDER BY s_name ASC""",
}

QUERIES = [
    Query("q1_pricing_summary", q1_pricing_summary, ORACLES["q1_pricing_summary"],
          "TPC-H Q1 shape: scan + 8-aggregate groupBy"),
    Query("q3_shipping_priority", q3_shipping_priority, ORACLES["q3_shipping_priority"],
          "TPC-H Q3 shape: 3-way join + deterministic top-10"),
    Query("q5_local_supplier_volume", q5_local_supplier_volume,
          ORACLES["q5_local_supplier_volume"],
          "TPC-H Q5 shape: 6-way join, broadcast fixed dims"),
    Query("q_top3_parts_per_brand", q_top3_parts_per_brand,
          ORACLES["q_top3_parts_per_brand"], "top-k per group via rank window"),
    Query("q_customers_without_orders", q_customers_without_orders,
          ORACLES["q_customers_without_orders"], "anti join / NOT EXISTS"),
    Query("q_customers_with_big_order", q_customers_with_big_order,
          ORACLES["q_customers_with_big_order"], "semi join / EXISTS"),
    Query("q_rollup_status", q_rollup_status, ORACLES["q_rollup_status"],
          "rollup grouping sets"),
    Query("q_cube_status", q_cube_status, ORACLES["q_cube_status"],
          "cube grouping sets (all margin combinations)"),
    Query("q_set_ops", q_set_ops, ORACLES["q_set_ops"],
          "INTERSECT/EXCEPT cohort split (churned vs retained buyers)"),
    Query("q_pivot_status", q_pivot_status, ORACLES["q_pivot_status"],
          "pivot to columns"),
    Query("q_distinct_parts_per_supplier", q_distinct_parts_per_supplier,
          ORACLES["q_distinct_parts_per_supplier"], "exact distinct aggregate"),
    Query("q6_forecast_revenue", q6_forecast_revenue, ORACLES["q6_forecast_revenue"],
          "TPC-H Q6 shape: multi-predicate pushdown scan + single sum"),
    Query("q14_promo_revenue", q14_promo_revenue, ORACLES["q14_promo_revenue"],
          "TPC-H Q14 shape: join + conditional-aggregate ratio"),
    Query("q_salted_join_priority", q_salted_join_priority,
          ORACLES["q_salted_join_priority"],
          "skew-resistant salted join (oracle = plain join)"),
    Query("q_bucketed_join_priority", q_bucketed_join_priority,
          ORACLES["q_bucketed_join_priority"],
          "bucketed-layout co-located join, no Exchange (oracle = plain join)"),
    Query("q10_returned_items", q10_returned_items, ORACLES["q10_returned_items"],
          "TPC-H Q10 shape: returned-item revenue per customer, top-20"),
    Query("q13_order_distribution", q13_order_distribution,
          ORACLES["q13_order_distribution"],
          "TPC-H Q13 shape: left outer join + two-level aggregation"),
    Query("q18_large_orders", q18_large_orders, ORACLES["q18_large_orders"],
          "TPC-H Q18 shape: HAVING-subquery semi-filter joined to detail"),
    Query("q4_late_shipments", q4_late_shipments, ORACLES["q4_late_shipments"],
          "TPC-H Q4 shape: correlated-EXISTS semi join, non-equi component"),
    Query("q12_priority_by_returnflag", q12_priority_by_returnflag,
          ORACLES["q12_priority_by_returnflag"],
          "TPC-H Q12 shape: join + two-bucket conditional counts"),
    Query("q15_top_supplier", q15_top_supplier, ORACLES["q15_top_supplier"],
          "TPC-H Q15 shape: scalar-subquery max over an aggregated view"),
    Query("q17_small_quantity_revenue", q17_small_quantity_revenue,
          ORACLES["q17_small_quantity_revenue"],
          "TPC-H Q17 shape: per-part avg subquery joined back to detail"),
    Query("q19_disjunctive_pricing", q19_disjunctive_pricing,
          ORACLES["q19_disjunctive_pricing"],
          "TPC-H Q19 shape: OR-of-ANDs predicate bands over a join"),
    Query("q22_idle_balance", q22_idle_balance, ORACLES["q22_idle_balance"],
          "TPC-H Q22 shape: scalar-subquery threshold + anti join"),
    Query("q7_volume_shipping", q7_volume_shipping,
          ORACLES["q7_volume_shipping"],
          "TPC-H Q7 shape: dual-nation join under symmetric OR pair"),
    Query("q8_market_share", q8_market_share, ORACLES["q8_market_share"],
          "TPC-H Q8 shape: conditional-ratio market share over 8-way join"),
    Query("q9_product_profit", q9_product_profit,
          ORACLES["q9_product_profit"],
          "TPC-H Q9 shape (adapted): profit by supplier nation x year"),
    Query("q21_waiting_supplier", q21_waiting_supplier,
          ORACLES["q21_waiting_supplier"],
          "TPC-H Q21 shape (adapted): sole-late-shipper EXISTS + NOT EXISTS"),
    Query("q_sql_text_interface", q_sql_text_interface,
          ORACLES["q_sql_text_interface"],
          "the same engine via SQL TEXT over temp views (§2.9 proof)"),
    Query("q2_min_cost_supplier", q2_min_cost_supplier,
          ORACLES["q2_min_cost_supplier"],
          "TPC-H Q2 shape (adapted): correlated-MIN cheapest supplier"),
    Query("q11_important_stock", q11_important_stock,
          ORACLES["q11_important_stock"],
          "TPC-H Q11 shape (adapted): value share above scalar threshold"),
    Query("q16_supplier_count", q16_supplier_count,
          ORACLES["q16_supplier_count"],
          "TPC-H Q16 shape: distinct suppliers per attrs minus NOT IN set"),
    Query("q20_promotion_candidates", q20_promotion_candidates,
          ORACLES["q20_promotion_candidates"],
          "TPC-H Q20 shape (adapted): nested-IN supplier qualification"),
]
