"""Streaming documents ingest (r10): JSONL shards landing in a directory
→ schema'd stream → content-hash dedup ON ARRIVAL → parquet corpus sink.

This is the incremental form of the batch cleaning pipeline: a crawler
drops `part-*.json` shards continuously, and the corpus grows
exactly-once (file-sink manifest + checkpoint) with re-crawled duplicate
content dropped in flight instead of by a later batch dedup pass. At
100 TB/day the state that matters is bounded by the DEDUP HORIZON:
`dropDuplicatesWithinWatermark` keys state on the content fingerprint and
expires it with the watermark, so the state store holds one fingerprint
per distinct document seen within the horizon — never the corpus. A
duplicate recurring BEYOND the horizon is admitted (documented contract);
the periodic batch pass (`staged_dedup_report`'s composition) catches
those — streaming dedup narrows the window, batch dedup closes it.

Schema posture matches sources/textio.py: explicit schema, DROPMALFORMED
(a corrupt crawler line must never kill a continuous ingest; the paired
batch audit `jsonl_corrupt_count` runs on the landed shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

DEDUP_HORIZON = "1 hour"


def content_fp(col):
    """Normalized content fingerprint — the same canonical form
    exact_dedup keys on (dedup.py's md5(trim(lower(text)))). One shared
    expression so the ingest stream and any text-rewriting gate that must
    RECOMPUTE it (boilerplate scrub) cannot drift."""
    return F.md5(F.trim(F.lower(col)))


def stream_documents_jsonl(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of JSONL document shards. One file per
    micro-batch keeps tests deterministic; `ingest_ts` is the arrival
    event time the dedup watermark advances on (crawl dumps carry no
    usable event time of their own); `fp` is the same normalized content
    hash exact_dedup canonicalizes by, computed scan-side."""
    raw = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("mode", "DROPMALFORMED")
        .json(src_dir)
    )
    return raw.withColumn("ingest_ts", F.current_timestamp()).withColumn(
        "fp", content_fp(F.col("text"))
    )


def dedup_on_ingest_stream(docs: DataFrame) -> DataFrame:
    """Content-level dedup on arrival: the first document carrying a
    fingerprint within the horizon ships, later carriers are dropped
    in-flight. State = one row per distinct fingerprint inside the
    watermark, expired automatically — bounded by horizon throughput,
    not corpus size."""
    return docs.withWatermark("ingest_ts", DEDUP_HORIZON).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def ingest_documents_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint: str
):
    """The wired pipeline: JSONL shards → dedup-on-arrival → parquet
    corpus, exactly-once via the file-sink manifest + checkpoint (a
    killed-and-restarted query neither loses nor double-lands a shard —
    the events E2E suite pins the identical mechanism). Returns the
    started StreamingQuery; callers own its lifecycle."""
    clean = dedup_on_ingest_stream(stream_documents_jsonl(spark, src_dir))
    return (
        clean.drop("ingest_ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def decontaminate_on_ingest_stream(
    docs: DataFrame, bitmap: list, n: int | None = None
) -> DataFrame:
    """Benchmark decontamination ON ARRIVAL: drop any incoming document
    sharing a shingle with the eval-set Bloom bitmap (built once by
    dedup.eval_bloom_bitmap, auto-sized to 12-24 bits per distinct eval
    shingle — see bloom_m_bits' FPR contract). Entirely
    STATELESS — the bitmap folds into the filter expression and the probe
    is an exists() over the doc's shingle array — so it composes freely
    with the watermarked dedup stage and costs the state store nothing.
    This is the in-flight twin of dedup.decontaminate_bloom's flag: the
    same bits, pinned equal in tests/test_streaming.py. ``n`` is the
    shingle width the bitmap was BUILT at (default: the repo-wide
    3-shingle; the composed pipeline passes its longer contamination
    unit — the two must match or every probe misses)."""
    from ..functions.textfns import tokens, word_shingles
    from ..operators.dedup import SHINGLE_N, bloom_hit_expr

    if n is None:
        n = SHINGLE_N
    shingled = docs.withColumn("_t", tokens("text")).withColumn(
        "_sh", word_shingles(F.col("_t"), n)
    )
    return (
        shingled.withColumn("contaminated", bloom_hit_expr(F.col("_sh"), bitmap))
        .filter(~F.col("contaminated"))
        .drop("_t", "_sh", "contaminated")
    )


def quality_gate_on_ingest_stream(docs: DataFrame) -> DataFrame:
    """Learned quality filtering ON ARRIVAL: score each incoming document
    with the SAME logistic-regression logit expression the batch scorer
    uses (text.quality_logit_expr — one shared expression, so the
    streaming gate and the batch scorer cannot drift) and drop rejects
    in-flight. Entirely STATELESS — the 6-dp weight literals fold into
    the stream's filter, costing the state store nothing — so it composes
    freely before the watermarked dedup stage (cheap gate first: a
    rejected doc never pays for dedup state). Accept = logit >= 0, the
    polynomial-boundary contract; batch/stream parity is pinned in
    tests/test_streaming.py."""
    from ..operators.text import quality_logit_expr

    return docs.filter(quality_logit_expr("text") >= 0)


def boilerplate_scrub_on_ingest_stream(
    docs: DataFrame, flagged_sets: DataFrame
) -> DataFrame:
    """Boilerplate removal ON ARRIVAL — the periodic-model/streaming-apply
    pattern: the flagged-segment sets come from a BATCH pass
    (text.boilerplate_segments_report's aggregate, refreshed on whatever
    cadence the corpus owner runs it), grouped to one array per source
    and broadcast-joined onto the stream; the scrub itself is the same
    higher-order filter the batch scrub runs inside the scan — entirely
    STATELESS, nothing in the state store, composable before the dedup
    stage. A segment that becomes boilerplate only after the batch set
    was built is admitted until the next refresh (documented contract —
    the same narrowing-vs-closing split as dedup-on-arrival vs the
    periodic batch dedup).

    ``flagged_sets``: (source, bset array<string>) — a STATIC DataFrame
    (stream-static broadcast joins are supported; the set is boilerplate-
    sized, bounded by construction). Output: ALL input columns preserved,
    with ``text`` replaced by the scrubbed text, plus n_dropped_segments;
    content-derived columns are RECOMPUTED from the scrubbed text when
    present (``fp`` via the shared content_fp expression, ``n_chars`` as
    length) — a pre-scrub fp would stop scrubbed duplicates from
    dedup'ing, so this gate composes correctly BEFORE
    dedup_on_ingest_stream. Batch/stream row parity and the
    scrub-then-dedup composition are pinned in tests/test_streaming.py."""
    from ..functions.textfns import token_segments, tokens
    from ..operators.text import BOILERPLATE_SEG_TOKENS

    segs = token_segments(tokens("text"), BOILERPLATE_SEG_TOKENS)
    joined = docs.withColumn("_segs", segs).join(
        F.broadcast(flagged_sets), "source", "left"
    )
    kept = F.when(F.col("bset").isNull(), F.col("_segs")).otherwise(
        F.filter(
            F.col("_segs"), lambda s: ~F.array_contains(F.col("bset"), s)
        )
    )
    scrubbed = (
        joined.withColumn(
            "n_dropped_segments",
            (F.size("_segs") - F.size(kept)).cast("int"),
        )
        .withColumn("text", F.array_join(kept, " "))
        .drop("_segs", "bset")
    )
    if "n_chars" in docs.columns:
        scrubbed = scrubbed.withColumn(
            "n_chars", F.length("text").cast("long")
        )
    if "fp" in docs.columns:
        scrubbed = scrubbed.withColumn("fp", content_fp(F.col("text")))
    return scrubbed


def cleaned_ingest_stream(
    docs: DataFrame,
    flagged_sets: DataFrame,
    bitmap: list,
    decon_n: int = 8,
) -> DataFrame:
    """The COMPOSED production ingest pipeline — the four gates wired into
    one stream, in the order a production ingest runs them:

        quality gate → boilerplate scrub → Bloom decontaminate
                     → dedup-on-arrival

    Ordering rationale: the quality gate is the cheapest (a folded-weight
    filter inside the scan) and runs first so rejected docs pay for
    nothing downstream; the scrub runs BEFORE decontamination and dedup so
    both operate on the text that will actually land (the scrub recomputes
    ``fp`` from the scrubbed text — see boilerplate_scrub_on_ingest_stream
    — so re-crawled duplicates whose only difference was boilerplate
    chrome still collapse); dedup runs LAST because it is the only
    STATEFUL stage — every upstream gate is stateless, so the state store
    holds one fingerprint per distinct ADMITTED document within the
    horizon, never per raw arrival. The contamination unit is the exact
    ``decon_n``-gram (default 8, matching pipeline_clean_corpus — the
    bitmap must be BUILT at the same width). Admit-set parity against
    the staged batch pipeline and kill/restart exactly-once on this
    composed form are pinned in tests/test_streaming.py."""
    gated = quality_gate_on_ingest_stream(docs)
    scrubbed = boilerplate_scrub_on_ingest_stream(gated, flagged_sets)
    decontaminated = decontaminate_on_ingest_stream(scrubbed, bitmap, n=decon_n)
    return dedup_on_ingest_stream(decontaminated)


def ingest_cleaned_documents_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    flagged_sets: DataFrame,
    bitmap: list,
    decon_n: int = 8,
):
    """cleaned_ingest_stream wired end-to-end: JSONL shards → the four
    composed gates → parquet corpus, exactly-once via the file-sink
    manifest + checkpoint (same mechanism as ingest_documents_stream).
    Returns the started StreamingQuery; callers own its lifecycle."""
    clean = cleaned_ingest_stream(
        stream_documents_jsonl(spark, src_dir), flagged_sets, bitmap, decon_n
    )
    return (
        clean.drop("ingest_ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def boilerplate_flagged_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch half of the pattern — re-exported from
    text.boilerplate_flagged_sets (ONE shared builder, so the streaming
    gate and the batch scrub cannot apply different sets)."""
    from ..operators.text import boilerplate_flagged_sets as _bfs

    return _bfs(spark, sf_dir)
