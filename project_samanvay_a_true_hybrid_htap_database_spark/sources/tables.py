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

# Analyzed-DataFrame memo (r15, guide §1/§6): every `spark.read.parquet`
# call re-lists the path and re-reads the footer schema — measured 80-110 ms
# per call warm, and the headline queries call load_table 1-7 times each, so
# a 53-query bench pass re-paid several seconds of pure METADATA reads.
# A long-running engine resolves a table once and plans many queries against
# the same relation (exactly what SamanvayEngine.register_base does); this
# memo gives the operator surface the same property. It caches the
# DataFrame DEFINITION only — no rows, no results; every query still scans
# the parquet — and the key carries the file's (size, mtime_ns) so a
# regenerated or rewritten testdata path misses the cache instead of
# serving a stale file listing. The memoized value holds the session
# reference, so a stopped/replaced session cannot alias an old id().
_DF_MEMO: dict[tuple, tuple] = {}
_DF_MEMO_MAX = 64


def _path_stat(path: str) -> tuple | None:
    try:
        st = os.stat(path)
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (id(spark), os.path.abspath(path), _path_stat(path))
    hit = _DF_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = _load_table_uncached(spark, sf_dir, name)
    if len(_DF_MEMO) >= _DF_MEMO_MAX:
        _DF_MEMO.clear()
    _DF_MEMO[key] = (spark, df)
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (read as a
        # raw long under spark.sql.legacy.parquet.nanosAsLong) and plain
        # TIMESTAMP(MICROS) (read as timestamp/timestamp_ntz) across testdata
        # generations, so adapt to whatever the file actually contains and
        # always surface the same two columns: `ts` (timestamp) and
        # `ts_nanos` (epoch nanos, bigint). Only touch session state when
        # it's actually missing.
        if (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            != "true"
        ):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type in ("long", "integer"):
            # raw nanos → NTZ via pure arithmetic against the naive epoch
            # (timestamp_micros() would yield session-tz-dependent LTZ);
            # keep the exact nano value before truncating to micros.
            return df.withColumn("ts_nanos", F.col("ts")).withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        if ts_type == "timestamp":
            # LTZ read (not seen in any generation so far): pin the naive
            # reading to UTC regardless of session timezone — unix_micros
            # extracts UTC epoch micros from LTZ, then pure NTZ arithmetic
            # rebuilds the wall clock (a bare cast('timestamp_ntz') would
            # take the SESSION-tz wall clock instead, ADVICE r5).
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts),"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        # ts is now TIMESTAMP_NTZ in every path; derive epoch nanos with
        # tz-free NTZ arithmetic (see functions/timefns.py).
        return df.withColumn(
            "ts_nanos",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"
            ),
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_all(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every testdata table as a temp view (for spark.sql access)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
