"""Full analytical SQL surface beyond the reference (SURVEY.md §2.4 lists
what the reference lacks: JOIN, GROUP BY, HAVING, ORDER BY, LIMIT, DISTINCT,
set ops, window functions, subqueries, expressions — all standard Spark).

Every query here is shaped for scale: dimension joins broadcast explicitly,
aggregations are partial-agg friendly (no distinct-heavy keys), sorts happen
after aggregation on already-small results, and filters sit directly on the
scan so Catalyst pushes them into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation over lineitem.
    Group keys are tiny (flag × status) → near-total map-side combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact (orders) ⨝ broadcast dims (customer→nation→region).
    customer is broadcast at test SF; at 100 TB it would be the one dim
    that shuffles — nation/region always broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … LIMIT with deterministic tie-break. Spark runs this as
    TakeOrderedAndProject — no global sort materialization."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 8)
    )


def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers holding both open ('O') and finished ('F')
    orders."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(done_c)


def except_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers holding open ('O') orders but no finished ('F')
    ones. (Every customer in the testdata has orders, so the naive
    "customers without orders" shape returns 0 rows — a vacuous oracle
    check; this variant is non-empty at every SF.)"""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return open_c.exceptAll(done_c)


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by totalprice (rank window, deterministic
    tie-break on orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date (rows-unbounded frame,
    tie-broken on orderkey for determinism)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: suppliers having any lineitem with quantity 50."""
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") == 50)
    return supplier.join(
        li, supplier.s_suppkey == li.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above the global average (scalar subquery shape —
    the aggregate is computed once and folded in as a literal-ish input)."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(F.avg("o_totalprice").alias("a"))
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .select("o_orderkey", "o_totalprice")
    )


def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN expression + grouped count (expressions in select list —
    absent from the reference, SURVEY.md §2.4)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return orders.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + grouping on orders (year/month rollup)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expressions: upper/substring/length/concat over part."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.substring(F.col("p_type"), 1, 5).alias("type5"),
        F.length(F.col("p_name")).alias("name_len"),
    )


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).filter(F.col("k") > 90)


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup over the events table — the batch-mode twin of
    the streaming windowed aggregation in streaming/events.py."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_min: int = 30) -> DataFrame:
    """Batch sessionization: per-user sessions closed by a >gap_min
    inactivity gap. lag → gap flag → running session counter → grouped
    rollup: two window passes over one user-partitioned shuffle, then a
    partial-agg groupBy — the classic scalable shape (the streaming twin
    with true incremental state lives in streaming/events.py)."""
    events = load_table(spark, sf_dir, "events")
    gapped = events.select(
        "user_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        "event_id",
        "value",
    ).withColumn(
        "new_session",
        F.when(
            F.col("epoch_s") - F.lag("epoch_s").over(
                Window.partitionBy("user_id").orderBy(
                    F.col("epoch_s").asc(), F.col("event_id").asc()
                )
            )
            > gap_min * 60,
            1,
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("epoch_s").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = gapped.withColumn("session_no", F.sum("new_session").over(w2))
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.min("epoch_s").alias("session_start"),
            F.max("epoch_s").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )


def join_agg_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (orders ⨝ lineitem on orderkey) + grouped agg: the
    canonical co-partitioned shuffle join. At 100 TB both sides bucket on
    orderkey so the join is shuffle-free; here AQE handles it."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
