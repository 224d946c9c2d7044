"""Structured Streaming over the events table (driver-mandated extension —
the reference has no stream abstraction, SURVEY.md §1.1/§2.4).

Two layers:

- ``stream_events(spark, src_dir)``: file-source stream of events parquet
  (same schema as sources.load_table('events'), nanos already long via the
  session conf) — the streaming twin of the batch table.
- ``hourly_rollup_stream``: tumbling 1-hour window + 2-hour watermark
  grouped rollup, the streaming twin of
  operators.analytics.events_hourly_rollup. At scale this runs per
  micro-batch with partial aggregation and state-store-backed windows; the
  watermark bounds state for late data.
- ``sessionize_stream``: stateful sessionization via
  applyInPandasWithState — groups per-user event streams into sessions
  closed by a 30-minute inactivity gap (the canonical custom stateful
  operator the built-in windows can't express).

The batch twin ``operators.analytics.sessionize`` is oracle-checked; the
streaming variants are covered by tests/test_streaming.py through the
memory sink (non-SQL-expressible → rows-only check per the contract).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.timefns import epoch_seconds_ltz

SESSION_GAP_MIN = 30

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of events parquet files dropped into ``src_dir``.
    One file per micro-batch keeps tests deterministic.

    ts is TIMESTAMP (LTZ) by necessity: Structured Streaming refuses
    watermarks on TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    timestamp_micros() interprets the raw nanos as UTC epoch micros, which
    matches the batch loader's naive-as-UTC reading exactly; every epoch
    extraction downstream uses epoch_seconds_ltz (unix_micros-based,
    session-tz-independent for LTZ), never the NTZ epoch_seconds, whose
    NTZ-coercion would shift under non-UTC sessions (ADVICE r5)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Tumbling-hour rollup with a 2-hour watermark: counts and value sums
    per (hour window, event_type). Late events beyond the watermark are
    dropped; everything else updates its window's state."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            epoch_seconds_ltz(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch seconds
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_s", T.LongType()),
        T.StructField("last_s", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _sessionize_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
):
    """Per-user session accumulator. Emits a session row whenever a gap
    > SESSION_GAP_MIN separates consecutive events (or on state timeout)."""
    gap = SESSION_GAP_MIN * 60
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_s, last_s, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, start_s, last_s, n, float(total)]],
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )
        return

    times: list[int] = []
    values: list[float] = []
    for pdf in pdfs:
        times.extend(int(t) for t in pdf["epoch_s"])
        values.extend(float(v) for v in pdf["value"])
    order = sorted(range(len(times)), key=lambda i: times[i])

    sessions = []
    if state.exists:
        start_s, last_s, n, total = state.get
    else:
        start_s = last_s = None
        n, total = 0, 0.0
    for i in order:
        t, v = times[i], values[i]
        if start_s is None:
            start_s, last_s, n, total = t, t, 1, v
        elif t - last_s > gap:
            sessions.append([user_id, start_s, last_s, n, float(total)])
            start_s, last_s, n, total = t, t, 1, v
        else:
            last_s, n, total = t, n + 1, total + v
    state.update((start_s, last_s, n, total))
    # EVENT-time timeout (watermark-driven), not processing-time: a
    # wall-clock timeout fires spuriously after any downtime — restart a
    # job an hour late and every open session closes at once — and keeps
    # an availableNow drain alive forever firing empty wake-up batches
    # (measured: 769 empty micro-batches before the test harness gave
    # up). Keyed to the watermark, the session closes exactly when event
    # time has provably moved past the gap, identically across restarts.
    state.setTimeoutTimestamp((last_s + gap) * 1000)
    if sessions:
        yield pd.DataFrame(
            sessions,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user sessionization with a 30-minute
    inactivity gap via applyInPandasWithState (Arrow-batched, state-store
    backed — the Spark-native replacement for a hand-rolled stateful
    stream processor)."""
    prepared = events.select(
        "user_id",
        "ts",
        epoch_seconds_ltz("ts").alias("epoch_s"),
        "value",
    ).withWatermark("ts", "2 hours")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming exact-dedup: drop events whose (event_type, value, props)
    payload was already seen within the watermark horizon — the streaming
    twin of operators.dedup.exact_dedup. State is keyed by a content md5
    (one small state row per distinct payload, GC'd past the watermark)
    instead of the payload itself, so state size is bounded and independent
    of payload width."""
    keyed = events.withColumn(
        "content_fp",
        F.md5(F.concat_ws("|", "event_type", F.col("value").cast("string"), "props")),
    )
    return keyed.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["content_fp"]
    )


def enrich_stream(events: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer
    dimension (user_id -> market segment). The static side is re-planned
    per micro-batch; it carries NO broadcast hint (customer grows with the
    data — SCALE.md dim policy), so the planner broadcasts it from stats
    while it fits and degrades to a shuffled join instead of a driver OOM
    at web scale. No stream-side state either way."""
    from ..sources import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    return (
        events.join(cust, events.user_id == cust.c_custkey, "left")
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        )
    )


def view_purchase_join_stream(
    views: DataFrame, purchases: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase matched to the
    same user's view events in the preceding ``within`` interval. Both
    sides carry watermarks and the join condition carries the time bound,
    so state for either side is evictable once the watermark passes — the
    only way a stream-stream join stays bounded-memory at 100 TB (an
    unbounded-condition join would buffer both streams forever)."""
    v = (
        views.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "purchase_id",
        epoch_seconds_ltz("v_ts").alias("view_s"),
        epoch_seconds_ltz("p_ts").alias("purchase_s"),
        "value",
    )


def stream_into_engine(
    events: DataFrame,
    engine,
    table: str = "events_live",
    checkpoint: str | None = None,
) -> "object":
    """HTAP ingestion loop: each micro-batch lands in the engine's DELTA
    layer for `table` (newest-pk-wins over prior segments, O(batch+delta),
    durable delta_<n> dirs in durable mode, compaction past the
    threshold), so SQL through ``SamanvayEngine.execute`` sees streamed
    rows as they arrive — the Structured-Streaming replacement for the
    reference's WAL→memtable→flush write path (memtable.hpp:140-236).

    Delivery contract: **at-least-once delivery, exactly-once CONTENTS per
    pk**. foreachBatch may re-invoke a batch after a task retry, so the
    sink tracks the applied batch_ids and skips same-process re-deliveries;
    across a QUERY restart (new foreachBatch closure, same engine) a batch
    that was applied but whose checkpoint commit did not land is re-
    delivered with a fresh batch_id set — and append_batch absorbs it,
    because the delta fold is keyed by pk (anti-join old delta vs batch
    pks): re-applying a batch replaces its rows with identical content.
    tests/test_streaming_e2e.py's kill/restart cycle asserts this across a
    mid-stream kill AND a compaction boundary. For a restart that also
    loses the engine process, durable mode (data_dir) persists the delta
    generations the batches landed in; that is the 100 TB deployment
    shape.

    ``checkpoint`` enables recovery: without it a restarted query re-reads
    the whole source (idempotent but O(history)); with it only
    uncommitted batches replay.

    Returns the StreamingQuery (caller stops/awaits it)."""
    applied: set[int] = set()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in applied:
            return  # re-delivered batch (retry): already unioned in
        rows = batch_df.select(
            "event_id", "user_id", "event_type", "value"
        ).localCheckpoint(eager=True)
        # append_batch holds engine._lock: foreachBatch runs on the
        # streaming thread while SQL may be served concurrently by the
        # threaded REST server (ADVICE r3).
        engine.append_batch(table, rows, pk="event_id")
        applied.add(batch_id)

    writer = events.writeStream.foreachBatch(sink)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()


def trending_topk_stream(
    events: DataFrame, k: int = 3
) -> tuple[DataFrame, "callable"]:
    """Windowed trending top-k: tumbling-hour counts per event_type, ranked
    to the top ``k`` types per window. Structured Streaming cannot rank
    inside an append-mode aggregation, so this returns the streaming
    aggregate plus a ``finalize`` callable that applies the rank — the
    standard split: the heavy, stateful, watermark-bounded count runs
    incrementally in the stream; the tiny per-window rank runs over the
    aggregate snapshot (in foreachBatch, or over the memory-sink table).
    At 100 TB/day the aggregate state is (windows x event types), KBs —
    the rank never touches raw events."""
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            epoch_seconds_ltz(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
        )
    )

    def finalize(snapshot: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        rk = F.row_number().over(
            W.partitionBy("hour_epoch").orderBy(
                F.col("n_events").desc(), F.col("event_type").asc()
            )
        )
        return (
            snapshot.withColumn("rk", rk)
            .filter(F.col("rk") <= k)
            .orderBy("hour_epoch", "rk")
        )

    return agg, finalize
