"""Streaming embeddings ingest (r11): vector shards landing in a directory
→ schema'd stream → nearest-learned-centroid assignment ON ARRIVAL →
cluster-partitioned parquet sink.

This closes the loop between the streaming ingest path and the ANN serving
path: the sink directory IS the learned-IVF layout (`cluster=<id>/...`)
that the partition-pruned serving scans read, so the index grows
incrementally as vectors arrive — no rebuild pass, no batch re-shuffle.
The assignment is entirely STATELESS: the learned centroids fold into the
stream's projection exactly as in the batch path (_dist_structs_col's
per-k strategy — plan literals at k <= IVF_LITERAL_K_MAX, a broadcast data
array above), so the state store holds nothing and throughput is the scan
rate. Exactly-once comes from the file-sink manifest + checkpoint — the
same mechanism the documents/events ingests pin in their kill/restart
suites.

Contract boundary (documented, same as every IVF op): arriving vectors are
assigned under the CURRENT learned centroids; re-learning the quantizer is
a periodic batch job (learned_centroids is memoized per table identity),
after which new arrivals follow the new centroids while old files keep
their layout until the next compaction — standard IVF index maintenance
(FAISS-style add-with-ids onto a trained coarse quantizer; public method).

Batch parity is pinned in tests/test_streaming.py: the streamed layout's
(vec_id -> cluster) must equal kmeans_iterate's batch assignment row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMB_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def stream_embeddings_jsonl(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of JSONL embedding shards (an upstream encoder
    drops `part-*.json` continuously). Explicit schema + DROPMALFORMED:
    a corrupt encoder line must never kill a continuous ingest (same
    posture as the documents stream; the paired corrupt-count audit runs
    on the landed shards in batch)."""
    return (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("mode", "DROPMALFORMED")
        .json(src_dir)
    )


def assign_on_ingest_stream(emb: DataFrame, cents: list) -> DataFrame:
    """Nearest-learned-centroid assignment on arrival — the identical
    argmin expression the batch path uses (literal centroids, struct
    array_min, ties to the lower cluster id), applied to a streaming
    DataFrame. Stateless: no watermark, no state store rows."""
    from ..operators.similarity import _with_nearest_centroid

    assigned = _with_nearest_centroid(
        emb.withColumn("_emb_d", F.col("embedding").cast("array<double>")),
        cents,
        "_emb_d",
        "_b",
    )
    return assigned.select(
        "vec_id",
        "embedding",
        "label",
        F.col("_b")["l"].cast("int").alias("cluster"),
    )


def ingest_embeddings_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    cents: list,
):
    """The wired pipeline: JSONL vector shards → stateless centroid
    assignment → parquet sink PARTITIONED BY cluster (the learned-IVF
    layout the pruned serving scans read). Exactly-once via the file-sink
    manifest + checkpoint. Returns the started StreamingQuery; callers
    own its lifecycle."""
    assigned = assign_on_ingest_stream(
        stream_embeddings_jsonl(spark, src_dir), cents
    )
    return (
        assigned.writeStream.format("parquet")
        .partitionBy("cluster")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .start()
    )
