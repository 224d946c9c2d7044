"""End-to-end Structured Streaming on a REAL file source with
checkpointing and a mid-stream kill/restart (VERDICT r5 #4).

The memory-sink tests in test_streaming.py prove operator semantics; these
prove the deployment contract: a file-stream source + checkpointed file
sink recovers from a stop at an arbitrary batch boundary and an outright
kill mid-stream, and the final sink contents equal the batch twin exactly
once — no drops, no duplicates. This is the property that makes the
streaming layer usable for 100 TB/day ingestion, where restarts are
routine, not exceptional.

Mechanics worth reading once:
- Source files are written time-ordered and disjoint (contiguous ts
  ranges) so the event-time watermark never legitimately drops records —
  any missing row in the sink would be a recovery bug, not late data.
- A far-future sentinel event closes every real window (append-mode
  watermarked aggregation only emits finalized windows); the sentinel's
  own window never closes, so it never appears in the sink.
- The sink is read back via spark.read.parquet on the sink dir, which
  honors the _spark_metadata manifest — only files committed by the
  streaming query count, which is exactly the exactly-once mechanism
  under test.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from project_samanvay_a_true_hybrid_htap_database_spark.functions.timefns import (
    hour_epoch_seconds,
)
from project_samanvay_a_true_hybrid_htap_database_spark.sources import load_table
from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
    dedup_stream,
    hourly_rollup_stream,
    stream_events,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS_DDL = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
N_CHUNKS = 6


def _write_chunk(spark, rows, dest: str, scratch: str, mtime: float) -> None:
    """One single-file parquet chunk with a controlled mtime (the file
    source processes files in mtime order)."""
    _write_chunk_typed(spark, rows, EVENTS_DDL, dest, scratch, mtime)


def _write_chunk_typed(
    spark, rows, ddl: str, dest: str, scratch: str, mtime: float
) -> None:
    """_write_chunk for an arbitrary schema (the export twin streams
    (doc_id, clean_text) chunks, not events)."""
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
        "overwrite"
    ).parquet(scratch)
    part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    shutil.move(part, dest)
    os.utime(dest, (mtime, mtime))
    shutil.rmtree(scratch, ignore_errors=True)


@pytest.fixture(scope="module")
def chunked_events(spark, tmp_path_factory):
    """sf0.001 events split into N_CHUNKS time-ordered single-file chunks
    plus a sentinel chunk 1 year past the data (closes all real windows)."""
    root = tmp_path_factory.mktemp("stream_e2e")
    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id", F.col("ts_nanos").alias("ts"), "user_id",
            "event_type", "value", "props",
        )
        .orderBy("ts")
    )
    rows = [tuple(r) for r in ev.collect()]
    n = len(rows)
    chunks = []
    base_mtime = time.time() - 3600
    for i in range(N_CHUNKS):
        part = rows[i * n // N_CHUNKS : (i + 1) * n // N_CHUNKS]
        dest = str(root / f"chunk_{i:02d}.parquet")
        _write_chunk(spark, part, dest, str(root / "scratch"), base_mtime + i)
        chunks.append(dest)
    year_ns = 365 * 24 * 3600 * 1_000_000_000
    sentinel = [(10**9, rows[-1][1] + year_ns, 0, "sentinel", 0.0, "{}")]
    sent_dest = str(root / "chunk_sentinel.parquet")
    _write_chunk(
        spark, sentinel, sent_dest, str(root / "scratch"), base_mtime + N_CHUNKS
    )
    return {"chunks": chunks, "sentinel": sent_dest, "root": root}


def _interrupted(exc: BaseException) -> bool:
    """True for the one tolerated flake shape (VERDICT r10 #4): a bare
    java.lang.InterruptedException surfacing as STREAM_FAILED when a
    stop() races an in-flight micro-batch under full-suite load. The
    exactly-once logic is not implicated — the checkpoint holds — so the
    harness may re-invoke the plan factory from the checkpoint ONCE
    instead of failing on harness timing.

    The interruption often lives only in the JAVA cause chain — the
    captured StreamingQueryException's own message is just
    '[STREAM_FAILED] ... terminated with exception:  SQLSTATE: XXKST'
    (r14 full-suite flake) — so walk the captured stack trace and the
    Python/Java cause chains, not just str(exc)."""
    seen = 0
    e: BaseException | None = exc
    while e is not None and seen < 8:
        if "InterruptedException" in str(e):
            return True
        if "InterruptedException" in (getattr(e, "_stackTrace", "") or ""):
            return True
        origin = getattr(e, "_origin", None)
        try:
            if origin is not None and "InterruptedException" in (
                origin.toString() or ""
            ):
                return True
        except Exception:
            pass
        e = getattr(e, "_cause", None) or e.__cause__
        seen += 1
    return False


def _stop_tolerating_interrupt(q) -> None:
    """Stop a query, tolerating only the interrupted-termination flake —
    used where the surrounding phase re-drains from the checkpoint (or
    has already processAllAvailable'd), so data assertions never rest on
    this stop's cleanliness."""
    try:
        q.stop()
        q.awaitTermination(60)
    except Exception as e:
        if not _interrupted(e):
            raise


def _drain(df_or_factory, sink: str, ckpt: str, retries: int = 1) -> None:
    """Run the stream over everything currently in the source, then stop.

    processAllAvailable + stop instead of awaitTermination: a stateful
    query with processing-time timeouts (sessionize) never self-terminates
    under availableNow — it keeps firing empty micro-batches to evaluate
    timeouts — so waiting for termination hangs forever. processAllAvailable
    returns once every posted input is committed, which is the property the
    tests need; for self-terminating queries the two are equivalent.

    Accepts either a DataFrame or a zero-arg factory; given a factory, an
    InterruptedException-terminated query is retried exactly once by
    rebuilding the plan from the SAME checkpoint (exactly-once sinks make
    the re-drain idempotent), so the final sink assertion still runs —
    any other failure, or a second interruption, propagates."""
    df = df_or_factory() if callable(df_or_factory) else df_or_factory
    q = (
        df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    except Exception as e:
        try:
            q.stop()
        except Exception:
            pass
        if retries > 0 and callable(df_or_factory) and _interrupted(e):
            _drain(df_or_factory, sink, ckpt, retries=retries - 1)
        else:
            raise


def test_rollup_checkpoint_kill_restart_exactly_once(spark, chunked_events, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # Phase A: first half of the data; run to completion and stop (a clean
    # shutdown at a batch boundary).
    for c in chunked_events["chunks"][: N_CHUNKS // 2]:
        shutil.copy2(c, src)
    _drain(hourly_rollup_stream(stream_events(spark, src)), sink, ckpt)

    # Phase B: rest of the data + sentinel arrive; restart from the SAME
    # checkpoint in continuous micro-batch mode and KILL the query after
    # the first progress report — wherever that lands.
    for c in chunked_events["chunks"][N_CHUNKS // 2 :]:
        shutil.copy2(c, src)
    shutil.copy2(chunked_events["sentinel"], src)
    q = (
        hourly_rollup_stream(stream_events(spark, src))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.5)
    # kill mid-stream: committed batches are nondeterministic
    _stop_tolerating_interrupt(q)

    # Phase C: restart once more from the checkpoint and drain to the end.
    _drain(lambda: hourly_rollup_stream(stream_events(spark, src)), sink, ckpt)

    got = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(sink).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
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
    assert len(got) > 0
    assert got == want, (
        f"exactly-once violated across kill/restart: "
        f"{len(got)} sink keys vs {len(want)} batch keys"
    )


def test_dedup_stream_checkpoint_restart_exactly_once(spark, chunked_events, tmp_path):
    """dropDuplicatesWithinWatermark across a restart: state (seen content
    fingerprints) must survive the checkpoint — a re-delivered payload in a
    post-restart batch would otherwise re-emit."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    out_cols = ["event_id", "user_id", "event_type", "value", "props"]

    def run(df):
        _drain(df.select(*out_cols), sink, ckpt)

    for c in chunked_events["chunks"][: N_CHUNKS // 2]:
        shutil.copy2(c, src)
    run(dedup_stream(stream_events(spark, src)))
    n_phase_a = spark.read.parquet(sink).count()

    for c in chunked_events["chunks"][N_CHUNKS // 2 :]:
        shutil.copy2(c, src)
    run(dedup_stream(stream_events(spark, src)))

    got = spark.read.parquet(sink)
    # exactly-once per payload: every content fingerprint appears once
    fp = F.md5(
        F.concat_ws("|", "event_type", F.col("value").cast("string"), "props")
    )
    dup = got.groupBy(fp.alias("fp")).count().filter(F.col("count") > 1).count()
    assert dup == 0, "restart re-emitted an already-seen payload"
    # equality with the batch twin: same distinct payload set
    ev = load_table(spark, SF_DIR, "events")
    want_fps = {r["fp"] for r in ev.select(fp.alias("fp")).distinct().collect()}
    got_fps = {r["fp"] for r in got.select(fp.alias("fp")).collect()}
    assert got_fps == want_fps
    # and the restart actually added rows (phase A was a strict prefix)
    assert n_phase_a < len(got_fps)


def _few_state_partitions(spark, n: int = 8):
    """Scope: fewer shuffle (= state store) partitions for a stateful
    stream. The FIRST run against a checkpoint pins the state partition
    count, so the whole kill/restart cycle inherits it; 32 partitions ×
    per-batch Python workers on kilobyte batches is pure overhead."""
    import contextlib

    @contextlib.contextmanager
    def scope():
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    return scope()


def _kill_restart_cycle(spark, df_factory, src, sink, ckpt, chunked, extra=None):
    """Shared 3-phase harness: clean stop at a batch boundary → restart +
    mid-stream kill → final drain. df_factory rebuilds the streaming plan
    from a fresh source reader each phase (exactly how a restarted job
    re-creates its plan from code + checkpoint)."""
    # Phase A: first half, clean drain
    for c in chunked["chunks"][: N_CHUNKS // 2]:
        shutil.copy2(c, src)
    _drain(df_factory, sink, ckpt)
    # Phase B: rest (+ any extra sentinel files), kill after first progress
    for c in chunked["chunks"][N_CHUNKS // 2 :]:
        shutil.copy2(c, src)
    for e in extra or []:
        shutil.copy2(e, src)
    q = (
        df_factory()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.5)
    # kill mid-stream: committed batches are nondeterministic, and the
    # stop may race an in-flight micro-batch (the tolerated flake shape —
    # Phase C's checkpoint re-drain is what asserts the data)
    try:
        q.stop()
        q.awaitTermination(60)
    except Exception as e:
        if not _interrupted(e):
            raise
    # Phase C: restart once more and drain to the end
    _drain(df_factory, sink, ckpt)


def test_sessionize_checkpoint_kill_restart_exactly_once(
    spark, chunked_events, tmp_path
):
    """applyInPandasWithState across a kill/restart (VERDICT r6 #4): the
    per-user session accumulators live in the state store, so an open
    session split across the kill must come back as ONE session, and
    already-emitted sessions must not re-emit. A per-user far-future
    sentinel closes every real session via an observed gap (the processing
    -time timeout never fires inside the test), so the sink must equal the
    batch twin exactly."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.analytics import (
        sessionize,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        sessionize_stream,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # per-user sentinel chunk: one event per user, 1 year past the data —
    # closes every user's final session through the normal gap path
    ev = load_table(spark, SF_DIR, "events")
    last_ts = ev.agg(F.max("ts_nanos")).collect()[0][0]
    year_ns = 365 * 24 * 3600 * 1_000_000_000
    users = [r[0] for r in ev.select("user_id").distinct().collect()]
    sentinel_rows = [
        (2_000_000_000 + i, last_ts + year_ns, u, "sentinel", 0.0, "{}")
        for i, u in enumerate(users)
    ]
    sent = str(chunked_events["root"] / "chunk_user_sentinels.parquet")
    _write_chunk(
        spark, sentinel_rows, sent,
        str(chunked_events["root"] / "scratch2"), time.time(),
    )

    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        stream_events,
    )

    with _few_state_partitions(spark):
        _kill_restart_cycle(
            spark,
            lambda: sessionize_stream(stream_events(spark, src)),
            src, sink, ckpt, chunked_events, extra=[sent],
        )

    got = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], round(r["total_value"], 2))
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], round(r["total_value"], 2))
        for r in sessionize(spark, SF_DIR).collect()
    }
    assert len(want) > 0
    assert got == want, (
        f"sessionize kill/restart diverged from batch twin: "
        f"{len(got)} stream vs {len(want)} batch sessions "
        f"(missing {len(want - got)}, extra {len(got - want)})"
    )


def test_trending_topk_checkpoint_kill_restart_exactly_once(
    spark, chunked_events, tmp_path
):
    """The stream-aggregate + snapshot-rank split across a kill/restart
    (VERDICT r7 #8): trending_topk_stream's heavy half is a watermarked
    windowed count whose per-window state must survive the kill (a window
    half-counted before the kill must finish with the exact total, and a
    window emitted pre-kill must not re-emit); the rank then runs over the
    committed sink snapshot via the returned finalize callable — the
    production topology (foreachBatch / snapshot table). Final ranked
    output must equal the batch twin exactly."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.analytics import (
        events_trending_topk,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        stream_events,
        trending_topk_stream,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def factory():
        agg, _finalize = trending_topk_stream(stream_events(spark, src))
        return agg

    with _few_state_partitions(spark):
        _kill_restart_cycle(
            spark, factory, src, sink, ckpt, chunked_events,
            extra=[chunked_events["sentinel"]],
        )

    snapshot = spark.read.parquet(sink)
    # exactly-once on the aggregate itself: a re-emitted window would
    # surface as a duplicate (hour, type) row before ranking ever runs
    n_rows = snapshot.count()
    n_keys = snapshot.select("hour_epoch", "event_type").distinct().count()
    assert n_rows == n_keys, "kill/restart re-emitted a window aggregate"

    _agg, finalize = trending_topk_stream(stream_events(spark, src))
    got = {
        (r["hour_epoch"], r["event_type"], r["n_events"], r["rk"])
        for r in finalize(snapshot).collect()
    }
    want = {
        (r["hour_epoch"], r["event_type"], r["n_events"], r["rk"])
        for r in events_trending_topk(spark, SF_DIR).collect()
    }
    assert len(want) > 0
    assert got == want, (
        f"trending top-k kill/restart diverged from batch twin: "
        f"{len(got)} stream vs {len(want)} batch rows "
        f"(missing {len(want - got)}, extra {len(got - want)})"
    )


def test_stream_stream_join_checkpoint_kill_restart_exactly_once(
    spark, chunked_events, tmp_path
):
    """Watermarked stream-stream join across a kill/restart (VERDICT r6
    #4): both sides buffer rows in the state store awaiting matches — a
    view committed before the kill must still join a purchase arriving
    after the restart, and pairs emitted pre-kill must not re-emit. Sink
    pair set must equal the batch join exactly."""
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        stream_events,
        view_purchase_join_stream,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def factory():
        s = stream_events(spark, src)
        return view_purchase_join_stream(s, s)

    with _few_state_partitions(spark):
        _kill_restart_cycle(
            spark, factory, src, sink, ckpt, chunked_events,
            extra=[chunked_events["sentinel"]],
        )

    got_rows = spark.read.parquet(sink).collect()
    got = {(r["view_id"], r["purchase_id"]) for r in got_rows}
    assert len(got_rows) == len(got), "kill/restart re-emitted a join pair"

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
    assert got == want, (
        f"join kill/restart diverged: {len(got)} stream pairs vs "
        f"{len(want)} batch pairs"
    )


def test_foreachbatch_engine_ingest_kill_restart_exactly_once(
    spark, chunked_events, tmp_path
):
    """The last recovery-sensitive streaming variant without a crash test
    (VERDICT r8 #7): foreachBatch → SamanvayEngine.append_batch across a
    clean stop, a mid-stream kill, AND a compaction boundary while the
    query is down. The engine object survives query restarts (the
    deployment shape: the serving process outlives stream restarts), but
    each restart builds a FRESH foreachBatch closure — the in-memory
    batch_id dedup set is gone, so an applied-but-uncommitted batch
    re-delivers and the pk-keyed delta fold must absorb it: exactly-once
    CONTENTS (count + per-pk payload set) vs the batch twin, with zero
    duplicate pks, even though delivery is at-least-once."""
    from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.events import (
        stream_into_engine,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    engine = SamanvayEngine(spark)
    table = "events_live"

    def start():
        return stream_into_engine(
            stream_events(spark, src), engine, table=table, checkpoint=ckpt
        )

    # Phase A: first half, clean drain at a batch boundary
    for c in chunked_events["chunks"][: N_CHUNKS // 2]:
        shutil.copy2(c, src)
    q = start()
    q.processAllAvailable()
    _stop_tolerating_interrupt(q)
    n_phase_a = engine.table_df(table).count()
    assert n_phase_a > 0

    # Phase B: rest of the chunks; kill after the first micro-batch
    # commits (maxFilesPerTrigger=1 → one file per batch, so the kill
    # lands with batches still unprocessed)
    for c in chunked_events["chunks"][N_CHUNKS // 2 :]:
        shutil.copy2(c, src)
    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.5)
    _stop_tolerating_interrupt(q)

    # Compaction boundary while the stream is down: folds the streamed
    # delta into the base (the LSM flush analog), so phase C's replayed
    # batch dedups against a COMPACTED table, not the delta it landed in
    engine.compact(table)

    # Phase C: restart once more and drain to the end
    q = start()
    q.processAllAvailable()
    _stop_tolerating_interrupt(q)

    got = engine.table_df(table).select(
        "event_id", "user_id", "event_type", "value"
    )
    want = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # exactly-once contents: same count, zero duplicate pks
    assert got.count() == want.count()
    dups = (
        got.groupBy("event_id").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0, "a replayed batch double-applied a pk"
    # and the same per-row payloads (order-insensitive content hash)
    fp = F.md5(
        F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            "event_type",
            F.col("value").cast("string"),
        )
    )
    got_fps = {r["fp"] for r in got.select(fp.alias("fp")).collect()}
    want_fps = {r["fp"] for r in want.select(fp.alias("fp")).collect()}
    assert got_fps == want_fps
    # the kill was real: phase A was a strict prefix of the final state
    assert n_phase_a < want.count()


def test_incremental_export_kill_restart_matches_batch_plan(spark, tmp_path):
    """r13 (VERDICT r12 #8): the OUTPUT side's streaming twin. The cleaned
    carriers arrive as a file stream in the global (o, doc_id) shuffle
    order, one chunk per micro-batch; the foreachBatch incremental export
    assigns bins with the batch plan's exact keying, carrying each
    bucket's token offset across batches with NO driver state (offsets
    derive from the committed manifest rows — streaming/export.py). With
    arrivals in shuffle order the final (bucket, bin, n_docs, n_tokens)
    snapshot must be ROW-IDENTICAL to training_export_plan, across a
    clean stop AND a replayed batch (overwrite-by-batch-id absorbs
    redelivery)."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators.sampling import (
        export_keyed,
        pipeline_clean_corpus,
        training_export_plan,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.export import (
        export_bins_foreach_batch,
        incremental_export_report,
    )

    carriers = pipeline_clean_corpus(spark, SF_DIR).select(
        "doc_id", "clean_text"
    )
    ordered = [
        (r["doc_id"], r["clean_text"])
        for r in carriers.join(
            export_keyed(carriers).select("doc_id", "o"), "doc_id"
        )
        .orderBy("o", "doc_id")
        .select("doc_id", "clean_text")
        .collect()
    ]
    assert len(ordered) > 50

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ddl = "doc_id long, clean_text string"
    n_chunks = 4
    per = (len(ordered) + n_chunks - 1) // n_chunks
    base_mtime = time.time() - 3600
    for i in range(n_chunks):
        rows = ordered[i * per : (i + 1) * per]
        _write_chunk_typed(
            spark,
            rows,
            ddl,
            os.path.join(src, f"chunk_{i}.parquet"),
            str(tmp_path / "scratch"),
            base_mtime + i,
        )

    def start():
        return (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(export_bins_foreach_batch(out))
            .option("checkpointLocation", ckpt)
            .start()
        )

    # Phase A: drain everything once, clean stop at a batch boundary
    q = start()
    q.processAllAvailable()
    _stop_tolerating_interrupt(q)
    n_batch_dirs = len(
        [d for d in os.listdir(out) if d.startswith("b")]
    )
    assert n_batch_dirs == n_chunks  # one micro-batch per chunk

    # Redelivery: re-running the last batch's foreachBatch by hand (the
    # at-least-once case a crash between sink write and checkpoint commit
    # produces) must overwrite, not double-count.
    last_rows = ordered[(n_chunks - 1) * per :]
    replay_df = spark.createDataFrame(last_rows, ddl)
    export_bins_foreach_batch(out)(replay_df, n_chunks - 1)

    # Restart on the same checkpoint: nothing new to process, report stable
    q = start()
    q.processAllAvailable()
    _stop_tolerating_interrupt(q)

    got = {
        (r["bucket"], r["bin"]): (r["n_docs"], r["n_tokens"])
        for r in incremental_export_report(spark, out).collect()
    }
    want = {
        (r["bucket"], r["bin"]): (r["n_docs"], r["n_tokens"])
        for r in training_export_plan(spark, SF_DIR).collect()
    }
    assert got == want
    # the offset-carry genuinely fired: some bucket's bin spans batches
    # (otherwise the parity would hold vacuously per-batch)
    manifest = spark.read.option("recursiveFileLookup", "true").parquet(out)
    spans = (
        manifest.groupBy("bucket", "bin")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert spans > 0, "no bin spanned a batch boundary — test corpus too small"


def test_online_neardup_gate_matches_sequential_replay(spark, tmp_path):
    """r13: the online NEAR-DUP admission gate (streaming/neardup.py) —
    LSH candidates + exact-Jaccard verify against all previously SEEN
    arrivals, state derived from committed batch manifests. Differential:
    the admitted set must equal an independent pure-Python sequential
    replay (hashlib md5 + the shared affine permutation params — no Spark
    expressions in the oracle), across a clean drain, a hand-replayed
    redelivery of the last batch, and a checkpoint restart."""
    import hashlib

    from project_samanvay_a_true_hybrid_htap_database_spark.functions.hashing import (
        MERSENNE31,
        permutation_params,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.neardup import (
        neardup_admit_foreach_batch,
        neardup_admitted,
    )

    docs = sorted(
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    n_chunks = 3
    per = (len(docs) + n_chunks - 1) // n_chunks
    batches = [docs[i * per : (i + 1) * per] for i in range(n_chunks)]

    # --- independent sequential replay (the oracle) ---
    params = permutation_params(16)
    buckets: dict = {}
    want: set = set()
    n_dropped = 0
    for batch in batches:
        for doc_id, text in sorted(batch):
            toks = str(text).lower().strip(" ").split(" ")
            hs = (
                {
                    int(
                        hashlib.md5(
                            " ".join(toks[i : i + 3]).encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    for i in range(len(toks) - 2)
                }
                if len(toks) >= 3
                else set()
            )
            if not hs:
                want.add(doc_id)
                continue
            sig = [min((h * a + b) % MERSENNE31 for h in hs) for a, b in params]
            keys = [
                (
                    band,
                    hashlib.md5(
                        ",".join(str(sig[band * 4 + r]) for r in range(4)).encode()
                    ).hexdigest(),
                )
                for band in range(4)
            ]
            cands = [c for bk in keys for c in buckets.get(bk, [])]
            dup = any(
                len(hs & h2) / len(hs | h2) >= 0.5 for _, h2 in cands
            )
            if dup:
                n_dropped += 1
            else:
                want.add(doc_id)
            for bk in keys:
                buckets.setdefault(bk, []).append((doc_id, hs))
    assert n_dropped > 0, "gate vacuous on this corpus"

    # --- the real gate over a chunked file stream ---
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ddl = "doc_id long, clean_text string"
    base_mtime = time.time() - 3600
    for i, batch in enumerate(batches):
        _write_chunk_typed(
            spark,
            batch,
            ddl,
            os.path.join(src, f"chunk_{i}.parquet"),
            str(tmp_path / "scratch"),
            base_mtime + i,
        )

    def start():
        return (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(neardup_admit_foreach_batch(out))
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    _stop_tolerating_interrupt(q)

    # redelivery of the final batch (at-least-once): must overwrite
    replay_df = spark.createDataFrame(batches[-1], ddl)
    neardup_admit_foreach_batch(out)(replay_df, n_chunks - 1)
    # restart on the same checkpoint: nothing new, manifest stable
    q = start()
    q.processAllAvailable()
    _stop_tolerating_interrupt(q)

    got = {
        r["doc_id"] for r in neardup_admitted(spark, out).collect()
    }
    assert got == want
    assert len(got) < len(docs)  # drops actually landed


def test_neardup_admission_audit_matches_live_gate(spark, tmp_path):
    """r14: the oracle-checkable batch replay (neardup_admission_audit)
    must equal the LIVE gate's admit set over the same doc_id-ordered
    arrival sequence, for an arbitrary chunking — the closed-form
    seen-semantics argument in its docstring, pinned."""
    from project_samanvay_a_true_hybrid_htap_database_spark.sources import (
        load_table,
    )
    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.neardup import (
        neardup_admission_audit,
        neardup_admit_foreach_batch,
        neardup_admitted,
    )

    docs = sorted(
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    # deliberately uneven chunking: the closed form must hold for any
    sizes = [len(docs) // 2, len(docs) // 3]
    sizes.append(len(docs) - sum(sizes))
    batches, at = [], 0
    for s in sizes:
        batches.append(docs[at : at + s])
        at += s
    out = str(tmp_path / "gate_out")
    ddl = "doc_id long, clean_text string"
    fn = neardup_admit_foreach_batch(out)
    for i, b in enumerate(batches):
        fn(spark.createDataFrame(b, ddl), i)
    live = {r["doc_id"] for r in neardup_admitted(spark, out).collect()}
    batch = {
        r["doc_id"]
        for r in neardup_admission_audit(spark, SF_DIR).collect()
        if r["admitted"] == 1
    }
    assert live == batch
    assert len(live) < len(docs)  # gate non-vacuous on this corpus


def test_neardup_gate_refuses_legacy_state_layout(spark, tmp_path):
    """r15 ADVICE: resuming the gate over a pre-r14 sink (state/b<band>
    dirs instead of state/buckets + state/docs) must fail loudly — the
    new reader would otherwise see empty seen-state and re-admit
    near-duplicates of everything already admitted."""
    import os

    import pytest

    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.neardup import (
        neardup_admit_foreach_batch,
    )

    out = str(tmp_path / "legacy_out")
    os.makedirs(os.path.join(out, "state", "b0"))
    fn = neardup_admit_foreach_batch(out)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, clean_text string",
    )
    with pytest.raises(RuntimeError, match="legacy pre-r14"):
        fn(df, 0)
    # a fresh sink (no state dir at all) still works
    fresh = str(tmp_path / "fresh_out")
    neardup_admit_foreach_batch(fresh)(df, 0)
