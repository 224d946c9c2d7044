"""Parquet table sources for the driver-provided TPC-H-ish testdata.

The reference engine persists tables as LSM SSTables + columnar files and a
text-sidecar schema registry (reference: StorageEngine/include/schema_registry.hpp:248-344);
here tables are plain Parquet directories/files read through the DataFrame
API so Catalyst gets pushdown, pruning and data skipping for free
(SURVEY.md §4 — the reference's pushdown is advisory-only).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast when joined against
# the fact tables (orders/lineitem/events): at 100 TB the facts scale, the
# dims stay broadcastable.
DIM_TABLES = {"region", "nation", "supplier", "part", "customer"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects unless read as a raw long. Set the conf defensively
        # (the driver's harness may build its own session without it), read
        # nanos, and surface both the raw value and a microsecond timestamp.
        # Only touch session state when it's actually missing.
        if (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            != "true"
        ):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts_nanos", F.col("ts")).withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_all(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every testdata table as a temp view (for spark.sql access)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
