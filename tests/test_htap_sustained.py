"""Sustained-ingest HTAP behavior (VERDICT r5 #7): with auto-flush active,
a sustained INSERT stream must keep the driver-side overlay bounded — the
memtable folds into the base every AUTOFLUSH_ROWS rows, so overlay size
(and therefore driver memory and per-query overlay-merge cost) stays O(1)
no matter how long the stream runs. This is the Spark analog of the
reference freezing its memtable at a size threshold and flushing
(memtable.hpp:140-161); without it the hot dict and the per-query
createDataFrame merge grow without bound.

bench.py::bench_htap_sustained records the throughput/degradation numbers
per round; this test pins the CORRECTNESS properties: the bound holds at
every single statement boundary, flushes actually happen, and reads stay
exact (read-your-writes across flush generations).
"""

from __future__ import annotations

import pytest

from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine
from project_samanvay_a_true_hybrid_htap_database_spark.bulk_loader import (
    load_transactions_distributed,
)

BASE_ROWS = 200_000
AUTOFLUSH = 2_000
N_INSERTS = 6_500  # crosses 3 full flush cycles with a partial tail


@pytest.fixture()
def loaded_engine(spark):
    engine = SamanvayEngine(spark)
    load_transactions_distributed(engine, n=BASE_ROWS)
    engine.autoflush_rows = AUTOFLUSH
    return engine


def test_sustained_ingest_keeps_overlay_bounded(loaded_engine):
    engine = loaded_engine
    mem = engine.tables["transactions"].memtable
    flushes0 = engine.stats["total_flushes"]
    max_overlay = 0
    for i in range(N_INSERTS):
        k = 5_000_000 + i
        rs = engine.execute(
            f"INSERT INTO transactions VALUES ({k}, 'East', 'Food', 42.5, 1, "
            f"'completed')"
        )
        assert rs.error_message is None, rs.error_message
        max_overlay = max(max_overlay, len(mem))
    # the bound: flush fires AT the threshold inside the insert call, so
    # no statement ever returns with the overlay at/above it
    assert max_overlay < AUTOFLUSH, (
        f"overlay reached {max_overlay}, threshold {AUTOFLUSH}"
    )
    assert engine.stats["total_flushes"] - flushes0 == N_INSERTS // AUTOFLUSH
    # exactness across flush generations: every row is readable, exactly once
    rs = engine.execute("SELECT COUNT(*) FROM transactions")
    assert rs.rows == [(BASE_ROWS + N_INSERTS,)]
    # read-your-writes for a row that crossed a flush boundary
    rs = engine.execute("SELECT amount FROM transactions WHERE id = 5000000")
    assert rs.rows == [(42.5,)]
    # and one still sitting in the post-flush overlay tail
    rs = engine.execute(
        f"SELECT amount FROM transactions WHERE id = {5_000_000 + N_INSERTS - 1}"
    )
    assert rs.rows == [(42.5,)]


def test_flush_does_not_block_readers(spark):
    """The reader-friendly flush contract: the expensive overlay fold runs
    OUTSIDE the engine lock, so reads complete — with consistent results —
    while a flush is in flight. Before the rework the statement lock was
    held across the whole multi-second fold and zero reads could finish
    mid-flush; a regression here re-serializes every reader behind every
    auto-flush. The plain delta flush is now a driver-side dict fold too
    fast to catch a read inside, so the test forces the COMPACTING flush
    (the O(base) fold — the slowest path the engine has) by dropping the
    compaction threshold under the overlay size."""
    import threading

    engine = SamanvayEngine(spark)
    load_transactions_distributed(engine, n=1_000_000)
    engine.autoflush_rows = None  # manual flush below
    engine.DELTA_COMPACT_ROWS = 1_000  # force the O(base) compacting fold
    n_new = 3_000
    for i in range(n_new):
        rs = engine.execute(
            f"INSERT INTO transactions VALUES ({7_000_000 + i}, 'North', "
            f"'Food', 1.5, 1, 'completed')"
        )
        assert rs.error_message is None, rs.error_message

    done = threading.Event()

    def flusher():
        try:
            engine.flush("transactions")
        finally:
            done.set()

    t = threading.Thread(target=flusher)
    t.start()
    completed_mid_flush = 0
    while not done.is_set():
        rs = engine.execute("SELECT COUNT(*) FROM transactions")
        assert rs.error_message is None, rs.error_message
        # snapshot consistency: the count is identical before, during and
        # after the fold — merge-on-read semantics are flush-invariant
        assert rs.rows == [(1_000_000 + n_new,)]
        if not done.is_set():
            completed_mid_flush += 1
    t.join()
    assert completed_mid_flush >= 1, (
        "no read completed while the flush was folding — readers are "
        "serialized behind the flush again"
    )
    assert len(engine.tables["transactions"].memtable) == 0


def test_sustained_ingest_under_concurrent_queries(loaded_engine):
    """The bench's mixed shape, asserted: a writer thread streams INSERTs
    through auto-flush cycles while this thread queries; results must stay
    internally consistent (monotonically growing COUNT, no torn reads)."""
    import threading

    engine = loaded_engine
    n_inserts = 4_500
    err: list[str] = []

    def writer():
        for i in range(n_inserts):
            rs = engine.execute(
                f"INSERT INTO transactions VALUES ({6_000_000 + i}, 'West', "
                f"'Services', 7.25, 2, 'pending')"
            )
            if rs.error_message:
                err.append(rs.error_message)
                return

    t = threading.Thread(target=writer)
    t.start()
    # Bounded query sampling: execute() serializes statements on the engine
    # lock (single-writer contract), so an unbounded tight query loop would
    # win most lock handoffs and starve the writer — sample a fixed number
    # of reads with breathing room instead.
    import time as _time

    counts = []
    for _ in range(8):
        rs = engine.execute("SELECT COUNT(*) FROM transactions")
        assert rs.error_message is None, rs.error_message
        counts.append(rs.rows[0][0])
        if not t.is_alive():
            break
        _time.sleep(0.3)
    t.join(timeout=120)
    assert not t.is_alive(), "writer did not finish"
    assert not err, err[0]
    assert counts == sorted(counts), "COUNT went backwards during ingest"
    assert all(BASE_ROWS <= c <= BASE_ROWS + n_inserts for c in counts)
    rs = engine.execute("SELECT COUNT(*) FROM transactions")
    assert rs.rows == [(BASE_ROWS + n_inserts,)]


def test_sustained_read_degradation_under_ceiling(loaded_engine):
    """The sustained-ingest read contract, re-stated on ABSOLUTE overhead
    (VERDICT r7 #3): the percentage form is denominator-dominated — the r7
    fast path cut the idle read to a ~15 ms cached-plan collect, so every
    residual millisecond of ingest overhead reads as several percent and
    the pct gate measures JVM warmth, not the engine. The honest contract:
    read latency under sustained single-row ingest (auto-flush active)
    exceeds idle by at most a small constant — the driver-side fold of
    ops-since-last-read (mem_log) plus one O(flush) mirror-partial upgrade
    per flush epoch, both independent of base size and of how long ingest
    has been running. r8 measured 5-17 ms overhead at 9-13k rows/s on a
    20M-row base (was 31 ms before the incremental partials; 225 ms before
    the fast path). The relative bound stays as a secondary accept for
    warm-JVM runs where idle is large enough to make percentages
    meaningful."""
    import statistics
    import threading
    import time as _time

    engine = loaded_engine
    q = "SELECT SUM(amount), AVG(amount) FROM transactions WHERE amount > 10"

    def query_once() -> float:
        t0 = _time.perf_counter()
        rs = engine.execute(q)
        assert rs.error_message is None, rs.error_message
        return (_time.perf_counter() - t0) * 1000

    query_once()  # warm-up (first build of the cached base plan)
    idle = statistics.median(query_once() for _ in range(9))

    n_inserts = 20_000
    state = {"n": 0, "err": None}

    def writer():
        for i in range(n_inserts):
            rs = engine.execute(
                f"INSERT INTO transactions VALUES ({7_500_000 + i}, 'North', "
                f"'Food', {20.0 + i % 50}, 1, 'completed')"
            )
            if rs.error_message:
                state["err"] = rs.error_message
                return
            state["n"] += 1

    t = threading.Thread(target=writer)
    t.start()
    sustained = []
    while t.is_alive() and len(sustained) < 12:
        sustained.append(query_once())
        _time.sleep(0.1)
    t.join(timeout=120)
    assert not t.is_alive() and state["err"] is None, state["err"]
    assert len(sustained) >= 3, "ingest window too short to sample"
    med = statistics.median(sustained)
    deg = 100 * (med / idle - 1)
    # Primary bound: absolute overhead < 25 ms (r8 measured 5-17 ms; the
    # old per-epoch full-mirror refold measured ~31 ms and grew with
    # accumulated deltas; the pre-fast-path per-query plan rebuild cost
    # 300-500 ms). Secondary accept: the 50% relative ceiling for runs
    # warm enough that idle is off the per-job scheduling floor.
    assert (med - idle) < 25 or deg < 50, (
        f"sustained-read degradation {deg:.0f}% and +{med - idle:.1f} ms "
        f"absolute (idle {idle:.1f} ms, sustained {med:.1f} ms)"
    )


def test_update_heavy_ingest_reads_fast_and_exact(spark, tmp_path):
    """UPDATE-heavy ingest (keys INSIDE the base pk range) rides the r8
    pyarrow shadow-fetch fast path — which requires a PARQUET-backed base
    (the fixture's distributed-generator base correctly falls back). Two
    contracts: (1) exactness — the fast answer equals the forced full
    merge-on-read plan on the same state; (2) cost — the fast path must
    beat the fallback it replaced (whose per-query cost is plan
    CONSTRUCTION: the memtable LocalRelation changes every insert, so
    nothing caches). Measured gap is ~3-10x, so the assertion is robust
    to scheduler noise."""
    import statistics
    import threading
    import time as _time

    from project_samanvay_a_true_hybrid_htap_database_spark.bulk_loader import (
        _CREATE_SQL,
        transactions_df,
    )

    engine = SamanvayEngine(spark)
    path = str(tmp_path / "txn_base")
    transactions_df(spark, BASE_ROWS, seed=42).write.parquet(path)
    rs = engine.execute(_CREATE_SQL)
    assert rs.error_message is None, rs.error_message
    engine.register_base("transactions", spark.read.parquet(path), pk="id")
    engine.tables["transactions"].not_null = {"id"}
    engine.autoflush_rows = AUTOFLUSH
    q = "SELECT SUM(amount), AVG(amount) FROM transactions WHERE amount > 10"

    def query_once() -> float:
        t0 = _time.perf_counter()
        rs = engine.execute(q)
        assert rs.error_message is None, rs.error_message
        return (_time.perf_counter() - t0) * 1000

    query_once()  # warm the cached base plan
    point_reads0 = engine.stats["base_point_reads"]

    n_upd = 8_000
    state = {"n": 0, "err": None}

    def writer():
        for i in range(n_upd):
            # keys 0..n_upd-1 collide with base ids: upsert-as-update
            rs = engine.execute(
                f"INSERT INTO transactions VALUES ({i}, 'South', 'Tools', "
                f"{30.0 + i % 40}, 1, 'completed')"
            )
            if rs.error_message:
                state["err"] = rs.error_message
                return
            state["n"] += 1

    t = threading.Thread(target=writer)
    t.start()
    upd = []
    while t.is_alive() and len(upd) < 8:
        upd.append(query_once())
        _time.sleep(0.1)
    t.join(timeout=120)
    assert not t.is_alive() and state["err"] is None, state["err"]
    assert len(upd) >= 3, "ingest window too short to sample"
    assert engine.stats["base_point_reads"] > point_reads0, (
        "in-range ingest reads never touched the pyarrow shadow fetch — "
        "they fell back to the full plan"
    )

    # (1) exactness: fast vs forced full plan on the identical final state
    fast = engine.execute(q)
    engine.read_fastpath_enabled = False
    try:
        slow = engine.execute(q)
        assert fast.error_message is None and slow.error_message is None
        import math

        for a, b in zip(fast.rows[0], slow.rows[0]):
            # relative tolerance: float SUM order differs between the
            # subtractive fast fold and the fallback plan (and between
            # fallback runs under different partitionings) — see the
            # base-shadow note in engine._fast_aggregates
            assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                fast.rows,
                slow.rows,
            )
        # (2) cost: the full plan STILL carries the overlay union —
        # measure it on the same state the fast reads served
        slow_med = statistics.median(query_once() for _ in range(3))
    finally:
        engine.read_fastpath_enabled = True
    med_upd = statistics.median(upd)
    assert med_upd < slow_med, (
        f"update-heavy fast read ({med_upd:.1f} ms) is slower than the "
        f"full-plan fallback it replaced ({slow_med:.1f} ms)"
    )
