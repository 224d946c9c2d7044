"""Reference-surface relational operators (SURVEY.md §2.1, S1-S20) expressed
as idiomatic DataFrame plans over the testdata tables.

The reference executes every SELECT by scanning row blobs and filtering
row-by-row after decode (reference: StorageEngine/SQLLayer/query_executor.cpp:216-224,
656-746 — its pushdown is advisory only, SURVEY.md §4). Here each shape is a
declarative plan, so Catalyst pushes filters and projections into the parquet
scan (PushedFilters/ReadSchema), prunes columns, and keeps everything inside
whole-stage codegen.

Each function takes (spark, sf_dir) and returns a DataFrame; aggregate columns
are aliased to match the DuckDB oracle SQL in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


# --- S4: point lookup (reference: query_executor.cpp:604-624, storage_engine.hpp:384-425) ---
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE pk = literal. The reference routes this to the row path (memtable
    + per-level SSTable get with bloom/sparse-index); in Spark the equality
    predicate is pushed into the parquet scan and row-group stats + optional
    bloom filters do the skipping."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 42).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


# --- S5: full scan (reference: query_executor.cpp:130-133, 268-284) ---
def full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region")


# --- S6: range/filtered scan (reference: query_executor.cpp:136-179, 286-303) ---
def range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(F.col("l_quantity") > 45).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-range scan (reference rangeQuery, storage_engine.hpp:253-286):
    closed interval on the key column → parquet min/max skipping."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey").between(100, 200)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# --- S7: projection (reference: query_executor.cpp:105-117, result_formatter.hpp:87-141) ---
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select("c_name", "c_acctbal").filter(F.col("c_custkey") == 7)


# --- S8: predicate tree =, !=, <, <=, >, >=, AND, OR (reference: query_executor.cpp:671-746) ---
def predicate_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
        | (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


def predicate_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") != "O") & (F.col("o_totalprice") <= 50000)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# --- S9-S12: aggregates COUNT/SUM/AVG/MIN/MAX (reference: query_executor.cpp:211-266) ---
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(F.col("l_quantity") > 10).agg(
        F.count("*").alias("cnt")
    )


def agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))


def agg_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(F.round(F.avg("l_quantity"), 6).alias("avg_qty"))


def agg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


# --- S13 done right: multi-aggregate in one pass (the reference silently
#     drops all but the last aggregate, query_executor.cpp:105-124; we keep
#     correct SQL semantics and note the divergence) ---
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


# --- S14: aggregation + WHERE (reference: query_executor.cpp:223-224) ---
def agg_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


# --- S15: UPDATE ... SET ... WHERE, modeled as the post-update table state
#     (reference: query_executor.cpp:505-568 does read-modify-write per row;
#     Spark-side state change is exercised through SamanvayEngine in tests,
#     here we express the equivalent declarative projection) ---
def update_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, F.lit("5-LOW"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )


# --- S16: DELETE ... WHERE, modeled as the post-delete table state
#     (reference: query_executor.cpp:453-500 writes tombstones) ---
def delete_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(~(F.col("c_acctbal") < 0)).select(
        "c_custkey", "c_name", "c_acctbal"
    )


# --- S3: INSERT-as-upsert, modeled as newest-sequence-wins merge of a batch
#     of fresh rows over the base table (reference: skiplist.hpp:170-187 —
#     in-place update on higher seq; query_executor.cpp:418-421 blind put) ---
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.htap import latest_version

    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    hot = spark.createDataFrame(
        [
            (1, "UPDATED CUSTOMER 1", 9999.99),
            (2, "UPDATED CUSTOMER 2", 8888.88),
            (900001, "NEW CUSTOMER", 0.0),
        ],
        "c_custkey bigint, c_name string, c_acctbal double",
    )
    return latest_version(customer, hot, key="c_custkey")
