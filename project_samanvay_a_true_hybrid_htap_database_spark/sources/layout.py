"""Sorted (zone-map-friendly) parquet layouts + scan-bytes measurement.

The reference's columnar files carry per-block zone maps (min/max) that its
scans consult to skip blocks (reference: StorageEngine/include/columnar_file.hpp:346-362).
Parquet has the same machinery natively — per-row-group column statistics —
but they only pay off when (a) the data is range-partitioned/sorted on the
probe column so row groups have tight, disjoint min/max, and (b) the column
is written with a stats-bearing physical type.

Two deployment facts this module encodes (both measured in
tests/test_data_skipping.py, not assumed):

1. **Spark's default parquet timestamp type is INT96**, a deprecated type
   for which readers do not use min/max stats — a time-sorted layout
   written with defaults gets ZERO row-group skipping on its time column.
   ``write_range_sorted`` forces ``TIMESTAMP_MICROS`` (stats-bearing) for
   the write. At 100 TB this single conf is the difference between a
   narrow time-window query reading ~1/N of the table and reading all of
   it.

2. **TIMESTAMP_NTZ columns get ZERO row-group pruning** (measured on
   Spark 4.1.2: a window predicate fully outside the data's range still
   read every byte of an NTZ-sorted layout, while the identical layout
   with the column cast to DATE read footers only). Sort/range-layout
   columns must be DATE or TIMESTAMP (LTZ) — if the source column is NTZ
   (e.g. lineitem's l_shipdate, parquet TIMESTAMP(isAdjustedToUTC=0)),
   cast it before calling ``write_range_sorted``.

3. **parquet-mr's Hadoop vectored IO bypasses the FileSystem statistics**
   that feed Spark's task inputMetrics, so bytes-read instrumentation
   silently reads ~0. The measurement helper documents that the calling
   test must disable ``parquet.hadoop.vectored.io.enabled`` while
   measuring (the production read path keeps it on — it is only the
   *metering* that goes blind, not the skipping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TS_TYPE_CONF = "spark.sql.parquet.outputTimestampType"


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_ranges: int
) -> None:
    """Write ``df`` range-partitioned + sorted on ``col`` so every output
    file covers a tight, disjoint ``col`` interval — the layout that turns
    parquet row-group min/max into the reference's zone maps. One shuffle,
    paid once at load time; every later window query on ``col`` prunes.

    ``n_ranges`` sizes the pruning granularity: a query touching a
    1/n_ranges-wide window reads ~1 file + footers. At 100 TB pick
    n_ranges so each range is a few GB (row groups within a file are
    additionally sorted, so intra-file skipping still applies).
    """
    spark = df.sparkSession
    prev = spark.conf.get(_TS_TYPE_CONF, None)
    spark.conf.set(_TS_TYPE_CONF, "TIMESTAMP_MICROS")
    try:
        (
            df.repartitionByRange(n_ranges, col)
            .sortWithinPartitions(col)
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(_TS_TYPE_CONF)
        else:
            spark.conf.set(_TS_TYPE_CONF, prev)


def stage_input_bytes(spark: SparkSession) -> int:
    """Total input bytes across all completed stages (AppStatusStore — the
    same numbers the Spark UI shows). Take a delta around a query to get
    its actual scan volume. local-mode only needs the one JVM; on a
    cluster the status store aggregates executor task metrics the same
    way.

    Caveat (measured): with parquet vectored IO enabled the underlying
    FileSystem statistics miss the column-chunk reads; tests set
    ``parquet.hadoop.vectored.io.enabled=false`` on the Hadoop conf while
    measuring.
    """
    jvm = spark._jvm  # noqa: SLF001
    gw = spark.sparkContext._gateway  # noqa: SLF001
    store = spark.sparkContext._jsc.sc().statusStore()  # noqa: SLF001
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    return sum(stages.apply(i).inputBytes() for i in range(stages.size()))
