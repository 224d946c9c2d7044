"""Differential pinning of the driver-side read fast path (VERDICT r6 #3).

The fast path answers SELECTs from a CACHED cold plan plus a pure-Python
fold of the memtable tail (engine.py `_fast_aggregates` /
`_fast_select_rows`); the fallback is the full Spark merge-on-read plan.
Both must produce identical answers on identical state — these tests force
each path on the same engine state and compare, including the quirky
predicate semantics (_compile_pred must mirror _pred_to_column exactly),
tombstones, delta shadowing, and the base-shadow bailout.
"""

from __future__ import annotations

import pytest

from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine
from project_samanvay_a_true_hybrid_htap_database_spark.engine import (
    _FastPathUnsupported,
)


@pytest.fixture()
def engine(spark):
    e = SamanvayEngine(spark)
    e.execute(
        "CREATE TABLE t (id BIGINT NOT NULL, name VARCHAR(20), "
        "amount DOUBLE, qty INT)"
    )
    for i, (name, amount, qty) in enumerate(
        [
            ("alpha", 10.5, 1),
            ("beta", None, 2),
            ("10", 30.0, None),
            ("9", 5.25, 4),
            ("gamma", -2.0, 5),
        ]
    ):
        vals = ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in (i + 1, name, amount, qty)
        )
        e.execute(f"INSERT INTO t VALUES ({vals})")
    return e


QUERIES = [
    "SELECT COUNT(*) FROM t",
    "SELECT COUNT(qty) FROM t",
    "SELECT SUM(amount) FROM t",
    "SELECT AVG(amount) FROM t",
    "SELECT MIN(amount), MAX(amount) FROM t",
    "SELECT SUM(amount), COUNT(*), AVG(qty) FROM t WHERE amount > 4",
    "SELECT COUNT(*) FROM t WHERE name = 'alpha' OR qty >= 4",
    # quirk: string column, both sides numeric-parsable → numeric compare
    "SELECT COUNT(*) FROM t WHERE name > '9'",
    # quirk: literal-on-left binds the column as LHS without flipping
    "SELECT COUNT(*) FROM t WHERE 3 < id",
    # quirk: unknown operator evaluates TRUE
    "SELECT COUNT(*) FROM t WHERE name LIKE 'a%'",
    "SELECT * FROM t",
    "SELECT id, amount FROM t WHERE qty >= 2",
    "SELECT name FROM t WHERE id = 3",
]


def _both_paths(e, sql):
    """(fast_result, fallback_result) on identical state."""
    fast = e.execute(sql)
    orig_agg = SamanvayEngine._fast_aggregates
    orig_rows = SamanvayEngine._fast_select_rows

    def no_agg(self, *a, **k):
        raise _FastPathUnsupported("forced off")

    SamanvayEngine._fast_aggregates = no_agg
    SamanvayEngine._fast_select_rows = lambda self, *a, **k: None
    try:
        slow = e.execute(sql)
    finally:
        SamanvayEngine._fast_aggregates = orig_agg
        SamanvayEngine._fast_select_rows = orig_rows
    return fast, slow


@pytest.mark.parametrize("sql", QUERIES)
def test_fast_equals_fallback_memtable_only(engine, sql):
    fast, slow = _both_paths(engine, sql)
    assert fast.error_message is None and slow.error_message is None
    assert fast.headers == slow.headers
    assert _norm(fast.rows) == _norm(slow.rows), sql


@pytest.mark.parametrize("sql", QUERIES)
def test_fast_equals_fallback_with_delta_and_tombstones(engine, sql):
    # flush → delta layer; then overwrite one delta row, delete another,
    # and add fresh rows → memtable shadows the delta
    engine.flush("t")
    engine.execute("INSERT INTO t VALUES (3, '10', 99.0, 7)")   # shadows delta
    engine.execute("DELETE FROM t WHERE id = 4")                 # tombstone
    engine.execute("INSERT INTO t VALUES (6, 'zeta', 1.25, 6)")  # fresh
    fast, slow = _both_paths(engine, sql)
    assert fast.error_message is None and slow.error_message is None
    assert _norm(fast.rows) == _norm(slow.rows), sql


def test_base_shadow_forces_fallback(engine, spark):
    """A memtable key inside the base pk range may shadow a base row the
    driver cannot see — the fast path must refuse (and the fallback must
    stay correct)."""
    engine.flush("t")
    engine.compact("t")  # rows 1-5 become the BASE layer
    engine.execute("UPDATE t SET amount = 1000.0 WHERE id = 2")  # in-range key
    with pytest.raises(_FastPathUnsupported):
        engine._fast_aggregates(
            engine.tables["t"],
            None,
            engine._parse_agg_specs(engine.tables["t"], ["SUM(amount)"]),
        )
    rs = engine.execute("SELECT SUM(amount) FROM t")
    assert rs.error_message is None
    slow_sum = rs.rows[0][0]
    assert abs(slow_sum - (10.5 + 1000.0 + 30.0 + 5.25 - 2.0)) < 1e-9


def test_fresh_keys_after_compaction_use_fast_path(engine):
    """Keys beyond the base pk max are provably unshadowed — the fast fold
    applies and matches the fallback."""
    engine.flush("t")
    engine.compact("t")
    engine.execute("INSERT INTO t VALUES (100, 'new', 7.5, 1)")
    # proves the fast path is reachable (no exception) ...
    engine._fast_aggregates(
        engine.tables["t"],
        None,
        engine._parse_agg_specs(engine.tables["t"], ["SUM(amount)"]),
    )
    # ... and both paths agree
    fast, slow = _both_paths(engine, "SELECT SUM(amount), COUNT(*) FROM t")
    assert _norm(fast.rows) == _norm(slow.rows)


def test_parquet_base_shadow_served_on_fast_path(spark, tmp_path):
    """r8: in-range hot keys (UPDATE-heavy ingest) no longer force the
    merge-on-read fallback when the base is parquet-backed — the shadowed
    base rows are point-read with pyarrow and subtracted from the cached
    base aggregate. Durable mode gives a parquet base (gen dirs); every
    read is compared against the forced full Spark plan, including
    updates, deletes, repeated updates of the same key, and flush
    boundaries. MIN/MAX over a shadowed set must still fall back."""
    e = SamanvayEngine(spark, data_dir=str(tmp_path / "d"))
    e.execute(
        "CREATE TABLE p (id BIGINT NOT NULL, name VARCHAR(20), "
        "amount DOUBLE, qty INT)"
    )
    for i in range(1, 21):
        e.execute(
            f"INSERT INTO p VALUES ({i}, 'n{i}', {i * 1.5}, {i % 5})"
        )
    e.flush("p")
    e.compact("p")  # durable compaction -> parquet generation base
    assert e.tables["p"].base.inputFiles(), "expected a parquet-backed base"

    sqls = [
        "SELECT SUM(amount), COUNT(*) FROM p",
        "SELECT SUM(amount), AVG(amount) FROM p WHERE amount > 10",
        "SELECT COUNT(qty), SUM(qty) FROM p WHERE qty >= 2",
        "SELECT COUNT(*) FROM p WHERE name != 'n3'",
    ]

    def check_all(tag):
        for sql in sqls:
            fast, slow = _both_paths(e, sql)
            assert fast.error_message is None and slow.error_message is None
            assert _norm(fast.rows) == _norm(slow.rows), (tag, sql)

    e.execute("INSERT INTO p VALUES (3, 'upd3', 99.0, 4)")  # in-range update
    check_all("one shadowing update")
    # the fast path must actually SERVE this (not silently fall back)
    e._fast_aggregates(
        e.tables["p"], None, e._parse_agg_specs(e.tables["p"], ["SUM(amount)"])
    )
    e.execute("DELETE FROM p WHERE id = 7")  # in-range tombstone
    e.execute("INSERT INTO p VALUES (3, 'upd3b', 1.0, 0)")  # re-update same key
    e.execute("INSERT INTO p VALUES (100, 'fresh', 5.0, 1)")  # out-of-range
    check_all("update+delete+reupdate+append")
    e.flush("p")  # shadowing keys move memtable -> delta mirror
    check_all("after flush")
    e.execute("INSERT INTO p VALUES (12, 'upd12', -3.5, 2)")
    check_all("post-flush update")
    # MIN/MAX with shadowed base rows is not subtractable -> fallback
    with pytest.raises(_FastPathUnsupported):
        e._fast_aggregates(
            e.tables["p"],
            None,
            e._parse_agg_specs(e.tables["p"], ["MIN(amount)"]),
        )
    fast, slow = _both_paths(e, "SELECT MIN(amount), MAX(amount) FROM p")
    assert _norm(fast.rows) == _norm(slow.rows)
    # fully-shadowed matching set: SUM over it must be NULL-ish (quirk: 0)
    for i in range(1, 21):
        if i != 7:
            e.execute(f"DELETE FROM p WHERE id = {i}")
    e.execute("DELETE FROM p WHERE id = 100")
    fast, slow = _both_paths(e, "SELECT SUM(amount), COUNT(*) FROM p")
    assert _norm(fast.rows) == _norm(slow.rows)
    assert fast.rows[0][1] == 0


def test_point_lookup_driver_path(spark, tmp_path):
    """r8 pyarrow point lookups: pk-equality SELECTs are served entirely
    driver-side (memtable → mirror → one base parquet point-read) and
    must agree with the full plan across every layer a key can live in —
    including a cold base key that later becomes hot (the shadow_seen
    regression: a point-lookup-warmed cache entry must not keep the key
    out of the shadow set)."""
    e = SamanvayEngine(spark, data_dir=str(tmp_path / "d"))
    e.execute(
        "CREATE TABLE p (id BIGINT NOT NULL, name VARCHAR(20), amount DOUBLE)"
    )
    for i in range(1, 11):
        e.execute(f"INSERT INTO p VALUES ({i}, 'n{i}', {i * 10.0})")
    e.flush("p")
    e.compact("p")
    e.execute("INSERT INTO p VALUES (3, 'hot3', 99.0)")   # hot over base
    e.execute("DELETE FROM p WHERE id = 4")               # tombstone
    e.execute("INSERT INTO p VALUES (50, 'fresh', 1.0)")  # beyond base

    for sql, want in [
        ("SELECT name, amount FROM p WHERE id = 3", [("hot3", 99.0)]),
        ("SELECT name FROM p WHERE id = 4", []),            # deleted
        ("SELECT name FROM p WHERE id = 7", [("n7",)]),     # base via pyarrow
        ("SELECT name FROM p WHERE id = 50", [("fresh",)]),  # memtable
        ("SELECT name FROM p WHERE id = 999", []),          # absent
        ("SELECT id, amount FROM p WHERE 5 = id", [(5, 50.0)]),  # lit-on-left
        ("SELECT name FROM p WHERE id = '7'", [("n7",)]),   # string literal
        ("SELECT name FROM p WHERE id = 'x'", []),          # cast-null literal
    ]:
        fast, slow = _both_paths(e, sql)
        assert fast.error_message is None and slow.error_message is None
        assert _norm(fast.rows) == _norm(slow.rows) == _norm(want), sql

    # column-pruned fetch: a cached partial row (name only) must refetch
    # and merge when a wider projection needs more columns
    fast, slow = _both_paths(e, "SELECT amount, name FROM p WHERE id = 7")
    assert _norm(fast.rows) == _norm(slow.rows) == [(70.0, "n7")]
    # shadow_seen regression: warm the cache for a COLD key via point
    # lookup, then make it hot — the aggregate must still subtract its
    # base row
    assert e.execute("SELECT name FROM p WHERE id = 6").rows == [("n6",)]
    e.execute("INSERT INTO p VALUES (6, 'hot6', 1000.0)")
    fast, slow = _both_paths(e, "SELECT SUM(amount), COUNT(*) FROM p")
    assert _norm(fast.rows) == _norm(slow.rows)
    # base rows 1..10 sum=550; -30 (id3->99) +99; -40 (id4 tombstone);
    # +1 (id50); -60 (id6->1000) +1000
    assert abs(fast.rows[0][0] - (550 - 30 + 99 - 40 + 1 - 60 + 1000)) < 1e-9


def test_incremental_partials_interleaved_ops(engine):
    """The r8 incremental fold machinery (mem_log replay + mirror_log
    epoch upgrades + flush invalidation) pinned under the workload shape
    that exercises every transition: repeated reads of the SAME queries
    (so the caches are hot and replay paths actually run) interleaved
    with inserts, hot-row updates, deletes, and flushes. Every read is
    compared against the forced full Spark plan."""
    sqls = [
        "SELECT SUM(amount), COUNT(*) FROM t",
        "SELECT SUM(amount), AVG(amount) FROM t WHERE amount > 4",
        "SELECT COUNT(qty), SUM(qty) FROM t WHERE qty >= 2",
        "SELECT MIN(amount), MAX(amount) FROM t",
    ]

    def check_all(tag):
        for sql in sqls:
            fast, slow = _both_paths(engine, sql)
            assert fast.error_message is None and slow.error_message is None
            assert _norm(fast.rows) == _norm(slow.rows), (tag, sql)

    check_all("initial")  # anchor the fold caches
    engine.execute("INSERT INTO t VALUES (6, 'f1', 7.5, 3)")
    check_all("after append")  # replay: pure add
    engine.execute("INSERT INTO t VALUES (6, 'f1b', 8.5, 4)")
    check_all("after hot-row update")  # replay: add + float-sum sub → refold
    engine.execute("DELETE FROM t WHERE id = 1")
    check_all("after delete")  # replay: tombstone op
    engine.flush("t")
    check_all("after flush")  # mem positions invalidated, mirror_log epoch
    engine.execute("INSERT INTO t VALUES (7, 'g', 1.0, 1)")
    check_all("after post-flush append")
    engine.flush("t")
    check_all("after second flush")  # mirror upgrade across 2 epochs
    engine.execute("INSERT INTO t VALUES (7, 'g2', 2.0, 2)")  # shadows mirror
    check_all("after mirror shadow")
    engine.flush("t")  # flush replaces a mirror entry → replaced-row sub
    check_all("after replacing flush")
    # queries that were NOT re-run every round must still upgrade across
    # the multi-epoch gap
    fast, slow = _both_paths(
        engine, "SELECT SUM(amount), COUNT(*) FROM t WHERE qty >= 1"
    )
    assert _norm(fast.rows) == _norm(slow.rows)


def test_randomized_op_stream_differential(spark, tmp_path):
    """Randomized stress over the r8 incremental machinery: a seeded
    stream of INSERT/UPDATE/DELETE/flush/compact ops against a durable
    (parquet-base) table, with the SAME query set re-run every few ops so
    the caches are always hot and every replay/upgrade/shadow transition
    actually executes. Each read is compared against the forced full
    Spark plan. 200 ops cover: appends beyond the base range, in-range
    updates (pyarrow shadow fetch), repeated updates of one key, deletes
    of base/hot keys, flushes mid-stream, and a compaction (epoch reset)."""
    import random

    rng = random.Random(20260816)
    e = SamanvayEngine(spark, data_dir=str(tmp_path / "d"))
    e.autoflush_rows = None  # flushes are explicit ops in the stream
    e.execute(
        "CREATE TABLE r (id BIGINT NOT NULL, name VARCHAR(20), "
        "amount DOUBLE, qty INT)"
    )
    for i in range(1, 31):
        e.execute(f"INSERT INTO r VALUES ({i}, 'n{i}', {i * 1.25}, {i % 7})")
    e.flush("r")
    e.compact("r")  # rows 1-30 become the parquet base

    sqls = [
        "SELECT SUM(amount), COUNT(*) FROM r",
        "SELECT SUM(amount), AVG(qty) FROM r WHERE amount > 12",
        "SELECT COUNT(qty) FROM r WHERE qty >= 3",
        "SELECT MIN(amount), MAX(amount) FROM r WHERE qty != 2",
    ]

    def check(step):
        for sql in sqls:
            fast, slow = _both_paths(e, sql)
            assert fast.error_message is None and slow.error_message is None
            assert _norm(fast.rows) == _norm(slow.rows), (step, sql)

    next_id = 31
    check("baseline")
    for step in range(200):
        op = rng.random()
        if op < 0.45:  # append a fresh key
            rs = e.execute(
                f"INSERT INTO r VALUES ({next_id}, 'f{next_id}', "
                f"{round(rng.uniform(-5, 40), 2)}, {rng.randrange(7)})"
            )
            next_id += 1
        elif op < 0.75:  # update an existing key (often in base range)
            k = rng.randrange(1, next_id)
            rs = e.execute(
                f"INSERT INTO r VALUES ({k}, 'u{step}', "
                f"{round(rng.uniform(-5, 40), 2)}, {rng.randrange(7)})"
            )
        elif op < 0.9:  # delete a key (may be base, hot, or absent)
            k = rng.randrange(1, next_id + 5)
            rs = e.execute(f"DELETE FROM r WHERE id = {k}")
        elif op < 0.97:
            e.flush("r")
            rs = None
        else:
            e.compact("r")  # base epoch reset: every cache re-anchors
            rs = None
        assert rs is None or rs.error_message is None, (step, rs.error_message)
        if step % 10 == 9:
            check(step)
    check("final")


def _norm(rows):
    def canon(v):
        if isinstance(v, float):
            # RELATIVE precision (10 significant digits), not an absolute
            # decimal place: float SUM/AVG may differ between the paths in
            # low-order bits (the base-shadow subtraction reorders the
            # sum — and the fallback's own partial-agg order varies with
            # partitioning), and the drift scales with magnitude, so
            # round(x, 9) would flake on large aggregates while being
            # needlessly loose on tiny ones.
            return float(f"{v:.10g}")
        return v

    return [tuple(canon(v) for v in r) for r in rows]


class TestDifferentialFuzz:
    """Property-based differential check: random predicates over random row
    sets must produce identical answers on the fast and fallback paths.
    The compiled Python matcher (_compile_pred) re-implements every engine
    quirk; this is the harness that keeps the two predicate evaluators
    from drifting apart."""

    @staticmethod
    def _mk_engine(spark, rows):
        e = SamanvayEngine(spark)
        e.execute(
            "CREATE TABLE f (id BIGINT NOT NULL, name VARCHAR(20), "
            "amount DOUBLE, qty INT)"
        )
        for r in rows:
            vals = ", ".join(
                "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
                for v in r
            )
            e.execute(f"INSERT INTO f VALUES ({vals})")
        return e

    def test_random_predicates_agree(self, spark):
        import itertools
        import random

        rng = random.Random(20260814)
        rows = []
        for i in range(1, 31):
            rows.append(
                (
                    i,
                    rng.choice(["a", "b", "7", "42", "zz", None]),
                    rng.choice([None, -1.5, 0.0, 3.25, 99.9, 7.0]),
                    rng.choice([None, 0, 1, 5, 42]),
                )
            )
        e = self._mk_engine(spark, rows)
        # half the rows through a flush so the delta mirror participates,
        # then a few overwrites/deletes so shadowing participates too
        e.flush("f")
        e.execute("INSERT INTO f VALUES (3, '42', 1.0, 9)")
        e.execute("DELETE FROM f WHERE id = 5")
        e.execute("INSERT INTO f VALUES (31, 'tail', 2.5, 2)")

        cols = ["id", "name", "amount", "qty"]
        lits = ["3", "'42'", "'a'", "0.0", "'zz'", "5"]
        ops = ["=", "!=", "<", "<=", ">", ">="]
        preds = []
        for c, o, l in itertools.product(cols, ops, lits):
            preds.append(f"{c} {o} {l}")
            preds.append(f"{l} {o} {c}")  # literal-on-left quirk
        rng.shuffle(preds)
        preds = preds[:60] + [
            f"({preds[0]}) AND name != 'b'".replace("(", "").replace(")", ""),
            "name = '7' OR qty >= 5",
            "amount > 0.0 AND id < 20 OR name = 'a'",
        ]
        for p in preds:
            for sel in (
                "COUNT(*), SUM(amount), AVG(qty)",
                "MIN(amount), MAX(id)",
                "id, amount",
            ):
                sql = f"SELECT {sel} FROM f WHERE {p}"
                fast, slow = _both_paths(e, sql)
                assert (fast.error_message is None) == (
                    slow.error_message is None
                ), (sql, fast.error_message, slow.error_message)
                if fast.error_message is None:
                    assert _norm(fast.rows) == _norm(slow.rows), sql

    def test_random_predicates_agree_nonquirk(self, spark):
        """The same differential harness in STANDARD (non-quirk) mode
        (advisor r7): the fast path must never answer under different
        semantics than the Spark plan. The hazard case is a string-typed
        column vs a non-string literal — plain Python ==/!= silently
        no-matched where the ANSI plan errored; now the fast path falls
        back and the plan try_casts the column (numeric compare where
        parseable, NULL no-match otherwise)."""
        import itertools
        import random

        from project_samanvay_a_true_hybrid_htap_database_spark import (
            SamanvayEngine,
        )

        rng = random.Random(20260815)
        e = SamanvayEngine(spark, quirk_compat=False)
        e.execute(
            "CREATE TABLE f (id BIGINT NOT NULL, name VARCHAR(20), "
            "amount DOUBLE, qty INT)"
        )
        for i in range(1, 25):
            name = rng.choice(["a", "b", "7", "42", "zz", None])
            amount = rng.choice([None, -1.5, 0.0, 3.25, 99.9])
            qty = rng.choice([None, 0, 1, 5, 42])
            vals = ", ".join(
                "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
                for v in (i, name, amount, qty)
            )
            e.execute(f"INSERT INTO f VALUES ({vals})")
        e.flush("f")
        e.execute("INSERT INTO f VALUES (3, '42', 1.0, 9)")
        e.execute("DELETE FROM f WHERE id = 5")

        cols = ["id", "name", "amount", "qty"]
        # numeric literals against the string column are the point here
        lits = ["3", "'42'", "'a'", "0.0", "42", "5"]
        ops = ["=", "!=", "<", "<=", ">", ">="]
        preds = []
        for c, o, l in itertools.product(cols, ops, lits):
            preds.append(f"{c} {o} {l}")
        rng.shuffle(preds)
        for p in preds[:50] + ["name = 42", "name != 42", "name < 42"]:
            for sel in ("COUNT(*), SUM(amount)", "id, name"):
                sql = f"SELECT {sel} FROM f WHERE {p}"
                fast, slow = _both_paths(e, sql)
                assert (fast.error_message is None) == (
                    slow.error_message is None
                ), (sql, fast.error_message, slow.error_message)
                if fast.error_message is None:
                    assert _norm(fast.rows) == _norm(slow.rows), sql
