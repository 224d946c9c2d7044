"""Bucketed-table layout for co-located fact-fact joins.

Writing both join sides bucketed (and sorted) by the join key lets Spark's
scan report the bucket partitioning, so a SortMergeJoin between them needs
NO Exchange on either side — and a groupBy on the same key downstream
reuses the partitioning too. At 100 TB this turns the heaviest repeated
shuffle (orders ⨝ lineitem on orderkey, re-run by every pipeline) into a
one-time layout cost; it is the batch analog of the reference's
primary-key-ordered SSTables (data pre-arranged by key so key-aligned
operations never re-sort — StorageEngine's design premise).

Tables are registered in the session catalog as external parquet tables
under a temp-dir path (the in-memory catalog forgets across sessions, so
the build is idempotent per session and re-points at the existing files).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

N_BUCKETS = 16

_BUCKET_SPECS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
}


def build_bucketed_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Idempotently materialize orders + lineitem bucketed by orderkey.
    Returns {logical name -> catalog table name}. Bucket count is fixed so
    both sides always agree (unequal bucket counts would reintroduce a
    shuffle on one side)."""
    base = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out: dict[str, str] = {}
    for name, key in _BUCKET_SPECS.items():
        tbl = f"samanvay_bkt_{base}_{name}"
        out[name] = tbl
        if spark.catalog.tableExists(tbl):
            continue
        path = os.path.join(
            tempfile.gettempdir(), f"samanvay_buckets_{base}", name
        )
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
    return out


def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_agg_orders_lineitem over the bucketed layout: identical rows,
    zero join-side Exchanges. The merge hint forces the SortMergeJoin that
    two 100-TB fact tables would get anyway (broadcast is off the table at
    that size); both scans read bucket-aligned files, so the join — and the
    per-key aggregate above it — run in one stage with no shuffle of either
    fact. Plan-asserted in tests/test_plans.py."""
    tbls = build_bucketed_tables(spark, sf_dir)
    orders = spark.table(tbls["orders"])
    li = spark.table(tbls["lineitem"])
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .hint("merge")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
