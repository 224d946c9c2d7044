"""Streaming twin of training_export_plan (VERDICT r12 #8) — incremental
bin assignment for the ARRIVING frontier only, same bucket/order/bin math.

The batch plan (operators/sampling.training_export_plan) lays the whole
cleaned corpus out at once: per-bucket cumulative token window over the
(o, doc_id) shuffle order, bin = cumulative DIV budget. A stream cannot
re-order bins it already shipped, so the incremental contract is:

  - each micro-batch's docs are keyed with the SAME expressions
    (operators/sampling.export_keyed — one definition, no drift),
  - within the batch they pack in (o, doc_id) order per bucket,
  - the bucket's cumulative token offset CARRIES ACROSS batches, so a
    bin that was left part-full keeps filling in the next batch.

When arrivals come in global (o, doc_id) order the result is
ROW-IDENTICAL to the batch plan (pinned in tests/test_streaming_e2e.py);
under any other arrival order the bins pack arrival-ordered — the honest
streaming semantics, stated here the way the near-dup pipeline states
its admit-set delta.

State & exactly-once: there is NO driver-held state. Each batch writes
its (bucket, bin, n_docs, n_tokens, batch_id) rows to an overwrite-mode
directory keyed by the batch id, and the next batch derives each
bucket's token offset by aggregating the rows of COMMITTED batches with
a smaller id — so a replayed batch (foreachBatch redelivery after a
crash) recomputes the identical prior, overwrites its own directory,
and the sink never double-counts. At scale the offset aggregate reads
only (bucket, bin) manifest rows — O(buckets x bins emitted), never the
corpus — and the per-batch window shuffles only the batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .neardup import _local_path

from ..operators.sampling import (
    SHUFFLE_BUCKETS,
    export_bin_expr,
    export_keyed,
)

_MANIFEST_SCHEMA = (
    "bucket int, bin int, n_docs bigint, n_tokens bigint, batch_id bigint"
)


def _committed(spark: SparkSession, out_dir: str) -> DataFrame:
    """All manifest rows committed so far (empty frame before batch 0).

    Only a MISSING sink dir maps to the empty frame — any other read
    failure (permissions, corrupt footers) must propagate: silently
    resetting per-bucket offsets to zero would mis-bin every later batch.
    """
    if not os.path.isdir(_local_path(out_dir)):
        return spark.createDataFrame([], _MANIFEST_SCHEMA)
    return (
        spark.read.option("recursiveFileLookup", "true")
        .schema(_MANIFEST_SCHEMA)
        .parquet(out_dir)
    )


def export_bins_foreach_batch(
    out_dir: str,
    budget: int = 512,
    buckets: int = SHUFFLE_BUCKETS,
):
    """foreachBatch callable: incremental export-bin assignment.

    ``batch_df`` must carry (doc_id, clean_text) — the cleaned-carrier
    frontier (the composed ingest stream's output shape)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        keyed = export_keyed(
            batch_df.select("doc_id", "clean_text"), buckets
        )
        # Per-bucket token offset from batches committed BEFORE this one —
        # replay-safe: a redelivered batch filters itself (and anything
        # after, which cannot exist) out and recomputes the same offsets.
        prior = (
            _committed(spark, out_dir)
            .filter(F.col("batch_id") < batch_id)
            .groupBy("bucket")
            .agg(F.sum("n_tokens").alias("_off"))
        )
        w = (
            Window.partitionBy("bucket")
            .orderBy(F.col("o").asc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        binned = (
            keyed.join(F.broadcast(prior), "bucket", "left")
            .withColumn(
                "_cum0",
                F.coalesce(F.col("_off"), F.lit(0).cast("bigint"))
                + F.sum("n_tokens").over(w)
                - F.col("n_tokens"),
            )
            .withColumn("bin", export_bin_expr("_cum0", budget))
        )
        (
            binned.groupBy("bucket", "bin")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/b{batch_id:08d}")
        )

    return fn


def incremental_export_report(spark: SparkSession, out_dir: str) -> DataFrame:
    """The loader-facing snapshot: (bucket, bin, n_docs, n_tokens) summed
    across batches — a bin split across micro-batches folds back to one
    row, making this schema- and value-comparable with
    training_export_plan when arrivals followed the shuffle order."""
    return (
        _committed(spark, out_dir)
        .groupBy("bucket", "bin")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
