"""Durability, restart recovery, and analytical-scale DML tests.

Ports the reference's schema-persistence-across-reload golden suite
(reference: StorageEngine/SQLLayer/tests/Unit_Test2.cpp:650-687 — create →
insert → flush → new engine on the same data dir → SELECT returns the data)
onto the Spark engine's parquet-base + JSON-sidecar + WAL durability path,
and exercises the set-based UPDATE/DELETE rewrite that kicks in above the
hot-overlay budget (VERDICT r2 "What's wrong" #1).
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from pathlib import Path

from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture()
def data_dir(tmp_path):
    return str(tmp_path / "samanvay_data")


def _seed(engine, n=3):
    engine.execute(
        "CREATE TABLE users (id BIGINT NOT NULL, name VARCHAR(255), age INT)"
    )
    for i in range(1, n + 1):
        engine.execute(f"INSERT INTO users VALUES ({i}, 'u{i}', {20 + i})")


# --- restart recovery (Unit_Test2.cpp:650-687) ---


def test_schema_and_data_survive_restart_after_flush(spark, data_dir):
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 3)
    assert e1.flush("users") == 3

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT * FROM users")
    assert rs.error_message is None
    assert len(rs.rows) == 3
    rs = e2.execute("SELECT name FROM users WHERE id = 2")
    assert rs.rows == [("u2",)]
    # Schema metadata recovered too
    rs = e2.execute("DESCRIBE users")
    assert rs.error_message is None


def test_unflushed_rows_recovered_via_wal_replay(spark, data_dir):
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 2)
    e1.flush("users")
    # Overlay-only writes after the flush: live only in the WAL
    e1.execute("INSERT INTO users VALUES (3, 'walrow', 33)")
    e1.execute("UPDATE users SET age = 99 WHERE id = 1")
    e1.execute("DELETE FROM users WHERE id = 2")

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT id, name, age FROM users")
    got = sorted(rs.rows)
    assert got == [(1, "u1", 99), (3, "walrow", 33)]


def test_drop_table_survives_restart(spark, data_dir):
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 2)
    e1.flush("users")
    e1.execute("DROP TABLE users")

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT * FROM users")
    assert rs.error_message is not None


def test_flush_is_idempotent_and_wal_truncates(spark, data_dir):
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 3)
    e1.flush("users")
    assert e1.flush("users") == 0  # nothing left in the overlay
    # WAL should hold no entries for already-flushed rows
    e2 = SamanvayEngine(spark, data_dir=data_dir)
    state = e2.tables["users"]
    assert len(state.memtable) == 0
    assert len(e2.execute("SELECT * FROM users").rows) == 3


def test_recovery_preserves_pk_and_not_null(spark, data_dir):
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 1)
    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("INSERT INTO users VALUES (NULL, 'x', 1)")
    assert rs.error_message is not None  # NOT NULL pk still enforced


# --- set-based UPDATE/DELETE above the overlay budget ---


def _seed_wide(engine, n):
    engine.execute("CREATE TABLE t (id BIGINT NOT NULL, grp INT, val INT)")
    # Register a base instead of row-at-a-time INSERT for speed
    df = engine.spark.range(1, n + 1).selectExpr(
        "id", "cast(id % 10 as int) as grp", "cast(0 as int) as val"
    )
    engine.register_base("t", df, "id")


def test_update_above_budget_is_set_based(engine, monkeypatch):
    monkeypatch.setattr(SamanvayEngine, "OVERLAY_BUDGET", 100)
    _seed_wide(engine, 5000)
    rs = engine.execute("UPDATE t SET val = 7 WHERE grp = 3")
    assert rs.rows_affected == 500
    # Set-based path folds into the base: overlay stays empty
    assert len(engine.tables["t"].memtable) == 0
    rs = engine.execute("SELECT COUNT(id) FROM t WHERE val = 7")
    assert rs.rows[0][0] == 500
    # Untouched rows keep their value
    rs = engine.execute("SELECT COUNT(id) FROM t WHERE val = 0")
    assert rs.rows[0][0] == 4500


def test_update_below_budget_stays_in_overlay(engine, monkeypatch):
    monkeypatch.setattr(SamanvayEngine, "OVERLAY_BUDGET", 100)
    _seed_wide(engine, 500)
    rs = engine.execute("UPDATE t SET val = 7 WHERE id <= 50")
    assert rs.rows_affected == 50
    assert len(engine.tables["t"].memtable) == 50  # row-at-a-time path


def test_delete_above_budget_is_set_based(engine, monkeypatch):
    monkeypatch.setattr(SamanvayEngine, "OVERLAY_BUDGET", 100)
    _seed_wide(engine, 5000)
    rs = engine.execute("DELETE FROM t WHERE grp != 3")
    assert rs.rows_affected == 4500
    assert len(engine.tables["t"].memtable) == 0
    rs = engine.execute("SELECT COUNT(id) FROM t")
    assert rs.rows[0][0] == 500


def test_set_based_update_persists_when_durable(spark, data_dir, monkeypatch):
    monkeypatch.setattr(SamanvayEngine, "OVERLAY_BUDGET", 10)
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    e1.execute("CREATE TABLE t (id BIGINT NOT NULL, val INT)")
    for i in range(1, 6):
        e1.execute(f"INSERT INTO t VALUES ({i}, 0)")
    e1.flush("t")
    # 5 matches > budget 10? No — use all rows with budget 3
    monkeypatch.setattr(SamanvayEngine, "OVERLAY_BUDGET", 3)
    e1.execute("UPDATE t SET val = 9 WHERE id >= 1")
    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT COUNT(id) FROM t WHERE val = 9")
    assert rs.rows[0][0] == 5


# --- PK reassignment tombstones the old key (ADVICE r2 #1) ---


def test_update_pk_tombstones_old_key(engine):
    engine.execute("CREATE TABLE u (id BIGINT NOT NULL, name VARCHAR(10))")
    engine.execute("INSERT INTO u VALUES (1, 'a')")
    rs = engine.execute("UPDATE u SET id = 2 WHERE id = 1")
    assert rs.rows_affected == 1
    rows = sorted(engine.execute("SELECT id, name FROM u").rows)
    assert rows == [(2, "a")]  # old key gone, no duplicate


def test_update_pk_collision_overwrites_target(engine):
    engine.execute("CREATE TABLE u (id BIGINT NOT NULL, name VARCHAR(10))")
    engine.execute("INSERT INTO u VALUES (1, 'a')")
    engine.execute("INSERT INTO u VALUES (2, 'b')")
    engine.execute("UPDATE u SET id = 2 WHERE id = 1")
    rows = sorted(engine.execute("SELECT id, name FROM u").rows)
    assert rows == [(2, "a")]  # blind-put upsert semantics on the new key


# --- S8 quirk-compat comparison semantics (query_executor.cpp:716-744) ---


def test_string_column_numeric_compare_quirk(spark):
    eng = SamanvayEngine(spark, quirk_compat=True)
    eng.execute("CREATE TABLE s (id BIGINT NOT NULL, v VARCHAR(10))")
    eng.execute("INSERT INTO s VALUES (1, '10')")
    eng.execute("INSERT INTO s VALUES (2, '9')")
    # Reference tries stod on both operands: '10' > '9' numerically
    rs = eng.execute("SELECT id FROM s WHERE v > '9'")
    assert [r[0] for r in rs.rows] == [1]


def test_string_column_lexicographic_fallback(spark):
    eng = SamanvayEngine(spark, quirk_compat=True)
    eng.execute("CREATE TABLE s (id BIGINT NOT NULL, v VARCHAR(10))")
    eng.execute("INSERT INTO s VALUES (1, 'apple')")
    eng.execute("INSERT INTO s VALUES (2, 'banana')")
    # Non-numeric operands fall back to lexicographic compare
    rs = eng.execute("SELECT id FROM s WHERE v > 'apple'")
    assert [r[0] for r in rs.rows] == [2]


def test_typed_compare_without_quirk(spark):
    eng = SamanvayEngine(spark, quirk_compat=False)
    eng.execute("CREATE TABLE s (id BIGINT NOT NULL, v VARCHAR(10))")
    eng.execute("INSERT INTO s VALUES (1, '10')")
    eng.execute("INSERT INTO s VALUES (2, '9')")
    rs = eng.execute("SELECT id FROM s WHERE v > '9'")
    assert rs.rows == []  # plain string compare: '10' < '9'


# --- value-position literals only (ADVICE r2 #5) ---


def test_insert_bare_identifier_value_rejected(engine):
    engine.execute("CREATE TABLE v (id BIGINT NOT NULL, name VARCHAR(10))")
    rs = engine.execute("INSERT INTO v VALUES (1, abc)")
    assert rs.error_message is not None


def test_update_bare_identifier_value_rejected(engine):
    engine.execute("CREATE TABLE v (id BIGINT NOT NULL, name VARCHAR(10))")
    engine.execute("INSERT INTO v VALUES (1, 'x')")
    rs = engine.execute("UPDATE v SET name = abc WHERE id = 1")
    assert rs.error_message is not None


# --- COUNT quirk gating (ADVICE r2 #3) ---


def test_count_col_without_quirk_skips_nulls(spark):
    eng = SamanvayEngine(spark, quirk_compat=False)
    eng.execute("CREATE TABLE c (id BIGINT NOT NULL, v INT)")
    eng.execute("INSERT INTO c VALUES (1, 5)")
    eng.execute("INSERT INTO c VALUES (2, NULL)")
    rs = eng.execute("SELECT COUNT(v) FROM c")
    assert rs.rows[0][0] == 1  # ANSI: NULLs excluded
    rs = eng.execute("SELECT COUNT(nope) FROM c")
    assert rs.error_message is not None


def test_count_col_with_quirk_counts_all(engine):
    engine.execute("CREATE TABLE c (id BIGINT NOT NULL, v INT)")
    engine.execute("INSERT INTO c VALUES (1, 5)")
    engine.execute("INSERT INTO c VALUES (2, NULL)")
    rs = engine.execute("SELECT COUNT(v) FROM c")
    assert rs.rows[0][0] == 2  # reference quirk: COUNT(col) == COUNT(*)


# --- engine-level locking under concurrent mutation (ADVICE r2 #2) ---


def test_concurrent_insert_and_scan_no_errors(engine):
    engine.execute("CREATE TABLE k (id BIGINT NOT NULL, v INT)")
    errors = []

    def writer(base):
        for i in range(40):
            rs = engine.execute(f"INSERT INTO k VALUES ({base + i}, {i})")
            if rs.error_message:
                errors.append(rs.error_message)

    def reader():
        for _ in range(40):
            rs = engine.execute("SELECT COUNT(id) FROM k")
            if rs.error_message:
                errors.append(rs.error_message)

    threads = [
        threading.Thread(target=writer, args=(1,)),
        threading.Thread(target=writer, args=(1000,)),
        threading.Thread(target=reader),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert engine.execute("SELECT COUNT(id) FROM k").rows[0][0] == 80


# --- round-4 durability hardening (ADVICE r3 + VERDICT r3 #2) ---


def test_drop_table_then_recreate_does_not_resurrect(spark, data_dir):
    """ADVICE r3: DROP must remove the on-disk base; a recreated same-named
    table must not adopt the dropped table's parquet on restart."""
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 3)
    e1.flush("users")
    e1.execute("DROP TABLE users")
    e1.execute("CREATE TABLE users (id BIGINT NOT NULL, name VARCHAR(255), age INT)")
    e1.execute("INSERT INTO users VALUES (42, 'fresh', 1)")

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT id, name FROM users")
    assert rs.error_message is None
    assert rs.rows == [(42, "fresh")]  # no resurrected u1/u2/u3


def test_flush_writes_versioned_generations_and_gcs(spark, data_dir):
    """ADVICE r3 + the r6 delta split: each flush lands in a fresh
    delta_<n> segment dir committed by the atomic sidecar swap (older
    segments GC'd); compaction folds delta+overlay into a fresh gen_<n>
    base dir and clears the delta. Either way, exactly one committed dir
    per layer survives."""
    import json as _json
    import os

    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 2)
    e1.flush("users")
    e1.execute("INSERT INTO users VALUES (3, 'u3', 23)")
    e1.flush("users")

    tdir = e1._table_data_path("users")
    # O(overlay) flushes: delta segments version forward, base untouched
    assert os.path.isdir(os.path.join(tdir, "delta_2"))
    assert not os.path.isdir(os.path.join(tdir, "delta_1"))  # GC'd
    with open(e1._schemas_path) as fh:
        meta = _json.load(fh)["users"]
    assert meta["delta_gen"] == 2
    assert meta["gen"] == 0  # no compaction yet

    # restart serves base(∅) + delta
    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert len(e2.execute("SELECT * FROM users").rows) == 3

    # compaction folds into a fresh base generation and clears the delta
    e2.execute("INSERT INTO users VALUES (4, 'u4', 24)")
    e2.compact("users")
    assert os.path.isdir(os.path.join(tdir, "gen_1"))
    assert not any(d.startswith("delta_") for d in os.listdir(tdir))
    with open(e2._schemas_path) as fh:
        meta = _json.load(fh)["users"]
    assert meta["gen"] == 1 and meta["delta_gen"] == 0

    e3 = SamanvayEngine(spark, data_dir=data_dir)
    assert len(e3.execute("SELECT * FROM users").rows) == 4


def test_stale_generation_leftover_is_ignored_on_recovery(spark, data_dir):
    """A crash mid-compaction leaves a half-written gen_<n> dir but the
    sidecar still points at the committed layers (here: the delta segment):
    recovery must serve them untouched. Same for a torn delta_<n+1>."""
    import os

    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 2)
    e1.flush("users")  # live = delta_1
    # simulate torn writes of a crashed compaction AND a crashed flush
    for torn_name in ("gen_2", "delta_2"):
        torn = os.path.join(e1._table_data_path("users"), torn_name)
        os.makedirs(torn)
        with open(os.path.join(torn, "part-00000.parquet"), "wb") as fh:
            fh.write(b"not parquet")

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert sorted(e2.execute("SELECT id FROM users").rows) == [(1,), (2,)]
    # and the next flush retires the torn dirs without tripping over them
    e2.execute("INSERT INTO users VALUES (3, 'u3', 23)")
    e2.flush("users")
    assert sorted(e2.execute("SELECT id FROM users").rows) == [(1,), (2,), (3,)]


def test_delta_tombstone_shadows_base_across_restart(spark, data_dir):
    """DELETE → flush moves the tombstone into the delta segment; it must
    keep shadowing the flushed row after restart (the L0 tombstone
    semantics of memtable.hpp:343-362 carried through the flush)."""
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 3)
    e1.compact("users")  # rows land in the parquet base
    e1.execute("DELETE FROM users WHERE id = 2")
    e1.flush("users")  # tombstone now lives in delta, not the memtable
    assert not e1.tables["users"].memtable
    assert sorted(e1.execute("SELECT id FROM users").rows) == [(1,), (3,)]

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert sorted(e2.execute("SELECT id FROM users").rows) == [(1,), (3,)]


def test_overlay_wins_over_delta_wins_over_base(spark, data_dir):
    """Precedence memtable > delta > base: the same pk updated at every
    layer serves the newest value."""
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 1)
    e1.compact("users")  # v1 in base
    e1.execute("UPDATE users SET name = 'v2' WHERE id = 1")
    e1.flush("users")  # v2 in delta
    e1.execute("UPDATE users SET name = 'v3' WHERE id = 1")  # v3 in overlay
    assert e1.execute("SELECT name FROM users WHERE id = 1").rows == [("v3",)]
    e1.flush("users")  # v3 replaces v2 within the delta (newest wins)
    assert e1.execute("SELECT name FROM users WHERE id = 1").rows == [("v3",)]
    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert e2.execute("SELECT name FROM users WHERE id = 1").rows == [("v3",)]


def test_register_base_with_path_survives_restart(spark, data_dir, tmp_path):
    """ADVICE r3: an externally-registered base re-reads from its recorded
    parquet path after restart."""
    ext = str(tmp_path / "ext_base")
    spark.range(1, 6).selectExpr("id", "cast(id * 10 as int) as v").write.parquet(ext)
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    e1.register_base("ext", spark.read.parquet(ext), pk="id", path=ext)
    e1.execute("INSERT INTO ext VALUES (99, 1)")

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT COUNT(id) FROM ext")
    assert rs.error_message is None
    assert rs.rows[0][0] == 6  # 5 base rows + 1 WAL-replayed overlay row


def test_register_base_without_path_refused_after_restart(spark, data_dir):
    """ADVICE r3: a volatile registered base cannot be rebuilt; recovery
    must refuse to serve overlay-only rows rather than silently lose data."""
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    df = spark.range(1, 4).selectExpr("id", "cast(id as int) as v")
    e1.register_base("vol", df, pk="id")

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT * FROM vol")
    assert rs.error_message is not None
    assert "not durably flushed" in rs.error_message


def test_registered_base_flush_converts_to_durable(spark, data_dir):
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    df = spark.range(1, 4).selectExpr("id", "cast(id as int) as v")
    e1.register_base("conv", df, pk="id")
    e1.execute("INSERT INTO conv VALUES (7, 70)")
    e1.flush("conv")  # folds external base + overlay into gen_1

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    rs = e2.execute("SELECT COUNT(id) FROM conv")
    assert rs.error_message is None
    assert rs.rows[0][0] == 4


# --- size-triggered auto-flush (VERDICT r3 #2; memtable.hpp:140-161) ---


def test_autoflush_bounds_overlay_under_sustained_inserts(engine):
    """Stream 100k INSERTs through the engine (the bulk_loader scenario
    VERDICT r3 flagged): the overlay must stay bounded by the threshold
    and every query result must be unchanged by the background folds."""
    engine.execute("CREATE TABLE s (id BIGINT NOT NULL, v INT)")
    engine.autoflush_rows = 25_000
    state = engine.tables["s"]
    max_seen = 0
    for i in range(100_000):
        engine.execute(f"INSERT INTO s VALUES ({i}, {i % 7})")
        if i % 250 == 249:
            max_seen = max(max_seen, len(state.memtable))
    assert max_seen <= 25_000  # overlay never grows past the threshold
    assert engine.stats["total_flushes"] >= 3
    rs = engine.execute("SELECT COUNT(id) FROM s")
    assert rs.rows[0][0] == 100_000
    rs = engine.execute("SELECT SUM(v) FROM s")
    assert rs.rows[0][0] == sum(i % 7 for i in range(100_000))


def test_autoflush_durable_truncates_wal(spark, data_dir):
    import os

    e1 = SamanvayEngine(spark, data_dir=data_dir)
    e1.execute("CREATE TABLE w (id BIGINT NOT NULL, v INT)")
    e1.autoflush_rows = 100
    for i in range(250):
        e1.execute(f"INSERT INTO w VALUES ({i}, {i})")
    # two auto-flushes happened; WAL holds only the residual 50 rows
    with open(e1._wal_path) as fh:
        residual = sum(1 for line in fh if line.strip())
    assert residual == 50
    assert len(e1.tables["w"].memtable) == 50

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert e2.execute("SELECT COUNT(id) FROM w").rows[0][0] == 250


def test_bigint_precision_preserved_with_nulls_in_overlay(spark):
    """Review r6: the Arrow overlay path must not route int64 through a
    pandas float64 upcast — a BIGINT >= 2^53 sharing a column batch with a
    NULL was silently rounded (9007199254740993 -> ...992)."""
    e = SamanvayEngine(spark)
    e.execute("CREATE TABLE bigp (id BIGINT PRIMARY KEY, v BIGINT)")
    e.execute("INSERT INTO bigp VALUES (1, 9007199254740993)")
    e.execute("INSERT INTO bigp VALUES (2, NULL)")
    rows = dict(e.execute("SELECT id, v FROM bigp").rows)
    assert rows[1] == 9007199254740993
    assert rows[2] is None
    # and the value survives the delta flush (the corruption would
    # otherwise become permanent in the segment parquet)
    e.flush("bigp")
    rows = dict(e.execute("SELECT id, v FROM bigp").rows)
    assert rows[1] == 9007199254740993


def test_append_batch_outranks_flushed_delta_and_tombstones(spark):
    """Review r6: a streaming micro-batch carries the NEWEST versions of
    its pks — a previously-flushed tombstone or stale delta version must
    not shadow it (append_batch now lands in the delta layer)."""
    e = SamanvayEngine(spark)
    e.execute("CREATE TABLE ab (id BIGINT PRIMARY KEY, v VARCHAR)")
    e.execute("INSERT INTO ab VALUES (5, 'v1')")
    e.execute("INSERT INTO ab VALUES (6, 'dead')")
    e.execute("DELETE FROM ab WHERE id = 6")
    e.flush("ab")  # v1 + tombstone(6) now live in the delta
    batch = spark.createDataFrame([(5, "v2"), (6, "w2")], "id bigint, v string")
    e.append_batch("ab", batch, pk="id")
    rows = dict(e.execute("SELECT id, v FROM ab").rows)
    assert rows == {5: "v2", 6: "w2"}


def test_flush_crash_between_segment_commit_and_wal_truncate_loses_nothing(
    spark, data_dir, monkeypatch
):
    """Review r6: the sidecar swap must commit the new delta segment
    BEFORE the WAL truncates — a crash between the two must leave every
    acknowledged row in at least one durable place (WAL replay over an
    already-flushed row is idempotent newest-wins)."""
    e1 = SamanvayEngine(spark, data_dir=data_dir)
    e1.execute("CREATE TABLE c (id BIGINT PRIMARY KEY, v VARCHAR)")
    e1.execute("INSERT INTO c VALUES (1, 'a')")

    real_persist = e1._persist_schemas
    calls = {"n": 0}

    def crash_after_persist():
        real_persist()
        calls["n"] += 1
        raise RuntimeError("simulated crash after sidecar commit")

    monkeypatch.setattr(e1, "_persist_schemas", crash_after_persist)
    try:
        e1.flush("c")
    except RuntimeError:
        pass
    assert calls["n"] == 1  # crashed exactly between commit and truncate

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert e2.execute("SELECT id, v FROM c").rows == [(1, "a")]


# --- per-table transaction log (the table-format seam, VERDICT r12 #6) ---


def test_txlog_versions_advance_with_each_layout_commit(spark, data_dir):
    """Every durable layout change (flush → delta segment, compact → base
    generation) appends ONE manifest to the table's transaction log; the
    newest manifest is a full snapshot matching the live dirs on disk —
    the O(1)-epoch-swap contract (txlog.py)."""
    import os

    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
    )

    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 2)
    e1.flush("users")  # v1: delta_1
    e1.execute("INSERT INTO users VALUES (3, 'u3', 23)")
    e1.flush("users")  # v2: delta_2
    e1.compact("users")  # v3: gen_1, delta cleared

    log = TableTxLog(e1._table_data_path("users"))
    assert log.versions() == [1, 2, 3]
    v, man = log.latest()
    assert v == 3
    assert man["base_gen"] == 1 and man["base_dir"] == "gen_1"
    assert man["delta_gen"] == 0 and man["delta_dir"] is None
    assert log.read(2)["delta_dir"] == "delta_2"
    assert log.read(1)["delta_dir"] == "delta_1"
    # manifest cost is O(1) in the base size — a few hundred bytes
    assert os.path.getsize(log._manifest_path(3)) < 4096
    # public history API: newest first
    hist = e1.table_history("users")
    assert [h["v"] for h in hist] == [3, 2, 1]


def test_txlog_preferred_over_stale_sidecar_in_crash_window(spark, data_dir):
    """Crash between the txlog commit and the sidecar swap: the sidecar
    still points at the PREVIOUS delta segment, but the log committed the
    new one (whose dir was fully written before the commit). Recovery
    must serve the log's layout — the newer truth (txlog.py crash
    matrix)."""
    import json as _json
    import os
    import shutil as _sh

    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 2)
    e1.flush("users")  # delta_1 live everywhere
    tdir = e1._table_data_path("users")
    saved = os.path.join(data_dir, "_saved_delta_1")
    _sh.copytree(os.path.join(tdir, "delta_1"), saved)

    e1.execute("INSERT INTO users VALUES (3, 'u3', 23)")
    e1.flush("users")  # delta_2 live, txlog v2, delta_1 GC'd

    # reconstruct the crash window: pre-crash delta_1 back on disk, the
    # sidecar rolled back to it (as if _persist_schemas never ran)
    _sh.copytree(saved, os.path.join(tdir, "delta_1"))
    with open(e1._schemas_path) as fh:
        doc = _json.load(fh)
    doc["users"]["delta_gen"] = 1
    doc["users"]["delta_rows"] = 2
    with open(e1._schemas_path, "w") as fh:
        _json.dump(doc, fh)

    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert sorted(e2.execute("SELECT id FROM users").rows) == [
        (1,),
        (2,),
        (3,),
    ]
    assert e2.tables["users"].delta_gen == 2


def test_txlog_torn_manifest_falls_back_one_version(spark, data_dir):
    """A torn (unreadable) newest manifest must be skipped — recovery
    serves the newest READABLE version, never fails on garbage."""
    import os

    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
    )

    e1 = SamanvayEngine(spark, data_dir=data_dir)
    _seed(e1, 3)
    e1.flush("users")  # v1: delta_1
    log = TableTxLog(e1._table_data_path("users"))
    torn = log._manifest_path(2)
    with open(torn, "w") as fh:
        fh.write("{not json")

    assert log.latest()[0] == 1  # torn v2 skipped
    e2 = SamanvayEngine(spark, data_dir=data_dir)
    assert len(e2.execute("SELECT * FROM users").rows) == 3
    assert [h["v"] for h in e2.table_history("users")] == [1]

    # and the NEXT commit reclaims the garbage-occupied slot instead of
    # wedging behind a permanent conflict (a link-committed manifest is
    # never torn, so unreadable == external garbage)
    e2.execute("INSERT INTO users VALUES (4, 'u4', 24)")
    e2.flush("users")
    v, man = log.latest()
    assert v == 2 and man["delta_dir"] == "delta_2"
    assert len(e2.execute("SELECT * FROM users").rows) == 4


def test_txlog_put_if_absent_rejects_conflicts(tmp_path):
    """The commit primitive is put-if-absent (os.link): a concurrently
    claimed version or a stale optimistic token must raise, never
    silently overwrite — the multi-writer contract a cluster deployment
    of the seam relies on (Delta-style log store semantics)."""
    import pytest as _pytest

    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
        TxConflictError,
    )

    log = TableTxLog(str(tmp_path / "t"))
    assert log.commit({"base_gen": 0}) == 1
    # stale optimistic token
    with _pytest.raises(TxConflictError):
        log.commit({"base_gen": 1}, expect=0)
    # racing writer claimed version 2 between read and link
    with open(log._manifest_path(2), "w") as fh:
        fh.write("{}")
    with _pytest.raises(TxConflictError):
        log.commit({"base_gen": 1}, expect=1)
    # after re-reading the log, the writer lands on version 3
    assert log.commit({"base_gen": 1}) == 3


def test_txlog_history_is_bounded(tmp_path):
    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
    )

    log = TableTxLog(str(tmp_path / "t"))
    for i in range(TableTxLog.HISTORY_KEEP + 10):
        log.commit({"base_gen": i})
    vs = log.versions()
    # live version plus HISTORY_KEEP retained behind it
    assert len(vs) == TableTxLog.HISTORY_KEEP + 1
    assert vs[-1] == TableTxLog.HISTORY_KEEP + 10
    assert vs[0] == 10


def test_txlog_two_writers_same_token_one_winner(tmp_path):
    """Two concurrent commits at the same expected version must yield
    exactly one winner and one TxConflictError — including when the slot
    they race for is occupied by external garbage (the reclaim path must
    not let both writers 'reclaim' their way to success)."""
    import threading

    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
        TxConflictError,
    )

    for garbage_slot in (False, True):
        log = TableTxLog(str(tmp_path / f"t_{garbage_slot}"))
        assert log.commit({"base_gen": 0}) == 1
        if garbage_slot:
            with open(log._manifest_path(2), "w") as fh:
                fh.write("{torn garbage")
        barrier = threading.Barrier(2)
        outcomes: list[tuple[str, object]] = []

        def writer(tag: str) -> None:
            barrier.wait()
            try:
                v = log.commit({"base_gen": 1, "writer": tag}, expect=1)
                outcomes.append(("ok", (tag, v)))
            except TxConflictError as e:
                outcomes.append(("conflict", (tag, str(e))))

        ts = [threading.Thread(target=writer, args=(f"w{i}",)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        kinds = sorted(k for k, _ in outcomes)
        assert kinds == ["conflict", "ok"], outcomes
        winner_tag = next(p[0] for k, p in outcomes if k == "ok")
        v, man = log.latest()
        assert v == 2 and man["writer"] == winner_tag
        # no scratch or quarantine litter left behind
        litter = [e for e in os.listdir(log.log_dir) if e.startswith(".tmp.")]
        assert litter == []


def test_txlog_reclaim_restores_displaced_genuine_commit(tmp_path):
    """The reclaim TOCTOU, deterministically: the slot looked like garbage
    at read time, but a genuine commit landed before the rename-aside.
    The displaced manifest must be restored intact and the reclaimer must
    conflict — never a silent overwrite."""
    import json as _json

    import pytest as _pytest

    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
        TxConflictError,
    )

    log = TableTxLog(str(tmp_path / "t"))
    assert log.commit({"base_gen": 0}) == 1
    # the genuine racing commit is already on disk at v2...
    genuine = {"base_gen": 1, "writer": "racer", "v": 2}
    with open(log._manifest_path(2), "w") as fh:
        _json.dump(genuine, fh)
    # ...but OUR read of the slot (simulating the race window) says garbage
    real_read = TableTxLog.read

    def stale_read(self, version):
        if version == 2:
            raise OSError("simulated: slot looked torn at check time")
        return real_read(self, version)

    log.read = stale_read.__get__(log)
    with _pytest.raises(TxConflictError):
        log.commit({"base_gen": 1, "writer": "reclaimer"}, expect=1)
    log.read = real_read.__get__(log)
    v, man = log.latest()
    assert v == 2 and man["writer"] == "racer"  # displaced commit restored


def test_txlog_sweeps_stale_tmp_litter(tmp_path):
    """Crash-orphaned .tmp.* scratch files are swept once stale; a fresh
    one (a live writer's in-flight scratch) is left alone."""
    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
    )

    log = TableTxLog(str(tmp_path / "t"))
    log.commit({"base_gen": 0})
    stale = os.path.join(log.log_dir, ".tmp.999.0.7")
    fresh = os.path.join(log.log_dir, ".tmp.999.1.8")
    for p in (stale, fresh):
        with open(p, "w") as fh:
            fh.write("{}")
    old = time.time() - TableTxLog.TMP_SWEEP_AGE_S - 60
    os.utime(stale, (old, old))
    log.commit({"base_gen": 1})
    names = set(os.listdir(log.log_dir))
    assert os.path.basename(stale) not in names
    assert os.path.basename(fresh) in names


def test_time_travel_reads_committed_versions(spark, data_dir):
    """r14: `SELECT ... FROM t VERSION AS OF n` serves the layout version
    n's committed manifest describes — across inserts, updates, and
    deletes — while the live read stays newest. retention_versions bounds
    readability; history survives restart."""
    e = SamanvayEngine(spark, data_dir=data_dir, retention_versions=4)
    e.execute("CREATE TABLE t (id BIGINT NOT NULL, v DOUBLE)")
    e.execute("INSERT INTO t VALUES (1, 1.0)")
    e.flush("t")  # v1
    e.execute("INSERT INTO t VALUES (2, 2.0)")
    e.flush("t")  # v2
    e.execute("UPDATE t SET v = 9.0 WHERE id = 1")
    e.flush("t")  # v3
    e.execute("DELETE FROM t WHERE id = 2")
    e.flush("t")  # v4

    def rows(sql):
        r = e.execute(sql)
        assert r.error_message is None, (sql, r.error_message)
        return r.rows

    assert rows("SELECT * FROM t VERSION AS OF 1") == [(1, 1.0)]
    assert rows("SELECT * FROM t VERSION AS OF 2") == [(1, 1.0), (2, 2.0)]
    assert rows("SELECT * FROM t VERSION AS OF 3") == [(1, 9.0), (2, 2.0)]
    assert rows("SELECT * FROM t VERSION AS OF 4") == [(1, 9.0)]
    assert rows("SELECT * FROM t") == [(1, 9.0)]
    # the full select machinery applies to historical reads
    assert rows("SELECT COUNT(*), SUM(v) FROM t VERSION AS OF 2") == [(2, 3.0)]
    assert rows("SELECT id FROM t VERSION AS OF 3 WHERE v > 5") == [(1,)]
    # unknown version is a loud error, not an empty result
    r = e.execute("SELECT * FROM t VERSION AS OF 99")
    assert "No committed version 99" in r.error_message
    # history survives restart at the same retention
    e2 = SamanvayEngine(spark, data_dir=data_dir, retention_versions=4)
    assert e2.execute("SELECT * FROM t VERSION AS OF 1").rows == [(1, 1.0)]


def test_time_travel_retention_zero_stays_vacuum_on_commit(spark, data_dir):
    """Default retention 0 keeps the reference's vacuum-on-commit GC:
    only the live version's dirs survive, and reading an older version
    fails loudly with a pointer at the retention knob."""
    e = SamanvayEngine(spark, data_dir=data_dir)
    e.execute("CREATE TABLE u (id BIGINT NOT NULL)")
    e.execute("INSERT INTO u VALUES (1)")
    e.flush("u")  # v1
    e.execute("INSERT INTO u VALUES (2)")
    e.flush("u")  # v2 — v1's delta dir is collected on this commit
    r = e.execute("SELECT * FROM u VERSION AS OF 1")
    assert "vacuumed" in r.error_message
    assert "retention_versions" in r.error_message
    assert e.execute("SELECT * FROM u VERSION AS OF 2").rows == [(1,), (2,)]


def test_time_travel_retention_bounds_gc(spark, data_dir):
    """retention_versions=N keeps exactly the dirs the newest N+1
    manifests reference — older ones are still collected (bounded
    storage, not keep-everything)."""
    import os

    e = SamanvayEngine(spark, data_dir=data_dir, retention_versions=1)
    e.execute("CREATE TABLE w (id BIGINT NOT NULL)")
    for i in range(1, 5):
        e.execute(f"INSERT INTO w VALUES ({i})")
        e.flush("w")  # v_i
    # v4 live, v3 retained, v1/v2 vacuumed
    assert e.execute("SELECT * FROM w VERSION AS OF 3").rows == [
        (1,), (2,), (3,)
    ]
    assert "vacuumed" in e.execute(
        "SELECT * FROM w VERSION AS OF 2"
    ).error_message
    tdir = e._table_data_path("w")
    deltas = sorted(
        d for d in os.listdir(tdir) if d.startswith("delta_")
    )
    assert deltas == ["delta_3", "delta_4"]  # bounded, not unbounded


def test_retention_disk_stays_bounded_across_many_cycles(spark, data_dir):
    """r15 (VERDICT r14 #8): under retention_versions=N, 10+ flush cycles
    must keep the on-disk layout bounded — at most the dirs the newest
    N+1 manifests reference survive each commit (≤ N+1 deltas plus the
    live generation), never an accumulating history. This is the sizing
    rule for the time-travel horizon: disk cost = (N+1) × layout size,
    checked at EVERY cycle, not just the end state."""
    import os

    n_ret = 2
    e = SamanvayEngine(spark, data_dir=data_dir, retention_versions=n_ret)
    e.execute("CREATE TABLE b (id BIGINT NOT NULL)")
    tdir = e._table_data_path("b")
    max_dirs = 0
    for i in range(1, 11):
        e.execute(f"INSERT INTO b VALUES ({i})")
        e.flush("b")  # v_i
        layout_dirs = [
            d
            for d in os.listdir(tdir)
            if d.startswith(("delta_", "gen_"))
        ]
        max_dirs = max(max_dirs, len(layout_dirs))
        assert len(layout_dirs) <= n_ret + 2, (i, sorted(layout_dirs))
    assert max_dirs >= n_ret + 1  # the horizon is actually retained
    # the retained window reads; anything older is vacuumed loudly
    assert e.execute("SELECT COUNT(*) FROM b VERSION AS OF 8").rows == [(8,)]
    assert "vacuumed" in e.execute(
        "SELECT * FROM b VERSION AS OF 7"
    ).error_message


def test_retention_above_manifest_horizon_refused(spark, data_dir):
    """r15 ADVICE: retention_versions > the txlog's manifest-pruning
    horizon (HISTORY_KEEP) would silently shrink back to it once _prune
    deletes the older manifests — construction refuses loudly instead;
    the horizon itself is accepted."""
    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
    )

    with pytest.raises(ValueError, match="HISTORY_KEEP"):
        SamanvayEngine(
            spark,
            data_dir=data_dir,
            retention_versions=TableTxLog.HISTORY_KEEP + 1,
        )
    e = SamanvayEngine(
        spark, data_dir=data_dir, retention_versions=TableTxLog.HISTORY_KEEP
    )
    assert e.retention_versions == TableTxLog.HISTORY_KEEP


def test_change_data_feed_between_versions(spark, data_dir):
    """r14: read_changes(t, v_from, v_to) — the Delta-CDF-shaped row diff
    between two retained layout versions: inserts/update-postimages carry
    the v_to row, deletes the v_from row; cross-span diffs compose."""
    e = SamanvayEngine(spark, data_dir=data_dir, retention_versions=8)
    e.execute("CREATE TABLE t (id BIGINT NOT NULL, v DOUBLE)")
    e.execute("INSERT INTO t VALUES (1, 1.0)")
    e.execute("INSERT INTO t VALUES (2, 2.0)")
    e.flush("t")  # v1
    e.execute("UPDATE t SET v = 9.0 WHERE id = 1")
    e.execute("INSERT INTO t VALUES (3, 3.0)")
    e.flush("t")  # v2
    e.execute("DELETE FROM t WHERE id = 2")
    e.flush("t")  # v3

    def diff(a, b):
        return sorted(tuple(r) for r in e.read_changes("t", a, b).collect())

    assert diff(1, 2) == [(1, 9.0, "update_postimage"), (3, 3.0, "insert")]
    assert diff(2, 3) == [(2, 2.0, "delete")]
    assert diff(1, 3) == [
        (1, 9.0, "update_postimage"),
        (2, 2.0, "delete"),
        (3, 3.0, "insert"),
    ]
    # an unchanged row (same pk, same values) never appears
    assert all(row[0] != 3 for row in diff(2, 3))
    with pytest.raises(Exception, match="v_from < v_to"):
        e.read_changes("t", 3, 1)


def test_txlog_two_processes_never_lose_a_commit(tmp_path):
    """Cross-PROCESS put-if-absent (r14, completing the two-writer story
    beyond threads): two OS processes race K commits each against one
    log, retrying on conflict. Invariants: every attempted commit lands
    (2K manifests), versions are contiguous, and each manifest names
    exactly one writer — os.link's EEXIST arbitration holds across
    processes, not just threads."""
    import subprocess
    import sys

    k = 15
    table_dir = str(tmp_path / "t")
    script = """
import json, sys, time
sys.path.insert(0, {repo!r})
from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
    TableTxLog, TxConflictError,
)
tag, table_dir, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
log = TableTxLog(table_dir)
done = 0
while done < k:
    try:
        v = log.commit({{"writer": tag, "i": done}})
        done += 1
    except TxConflictError:
        time.sleep(0)  # re-read and retry at the new head
print(json.dumps({{"tag": tag, "done": done}}))
""".format(repo=str(REPO_ROOT))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, tag, table_dir, str(k)],
            stdout=subprocess.PIPE,
        )
        for tag in ("p1", "p2")
    ]
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0, out

    from project_samanvay_a_true_hybrid_htap_database_spark.txlog import (
        TableTxLog,
    )

    log = TableTxLog(table_dir)
    versions = log.versions()
    # HISTORY_KEEP prunes old manifests; the SURVIVING window must be
    # contiguous up to exactly 2K (no version lost, none double-claimed)
    assert versions[-1] == 2 * k
    assert versions == list(range(versions[0], 2 * k + 1))
    # 2K = 30 <= HISTORY_KEEP + 1, so nothing was pruned: every commit
    # must be present exactly once per writer
    from collections import Counter

    writers = Counter(log.read(v)["writer"] for v in versions)
    assert writers == Counter({"p1": k, "p2": k})
