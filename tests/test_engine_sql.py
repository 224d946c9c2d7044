"""Golden conformance suite ported from the reference's SQL end-to-end tests
(reference: StorageEngine/SQLLayer/tests/Unit_Test2.cpp — 15 suites; the
exact row counts and aggregate values asserted here are its de-facto
conformance corpus, see SURVEY.md §5).
"""

from __future__ import annotations

import pytest


def _seed_users(engine):
    engine.execute(
        "CREATE TABLE users (id BIGINT NOT NULL, name VARCHAR(255), age INT, salary DOUBLE)"
    )
    rows = [
        (1, "Alice", 30, 95000.50),
        (2, "Bob", 25, 72000.00),
        (3, "Carol", 35, 110000.00),
        (4, "Dave", 28, 85000.00),
        (5, "Eve", 42, 120000.00),
    ]
    for r in rows:
        engine.execute(
            f"INSERT INTO users VALUES ({r[0]}, '{r[1]}', {r[2]}, {r[3]})"
        )


def _seed_orders(engine):
    engine.execute(
        "CREATE TABLE orders (id BIGINT NOT NULL, customer VARCHAR(255), "
        "amount DOUBLE, region VARCHAR(50), status VARCHAR(50))"
    )
    rows = [
        (1, "Alice", 99.99, "APAC", "completed"),
        (2, "Bob", 250.00, "EMEA", "pending"),
        (3, "Carol", 75.50, "APAC", "completed"),
        (4, "Dave", 500.00, "NA", "completed"),
        (5, "Eve", 125.00, "EMEA", "cancelled"),
    ]
    for r in rows:
        engine.execute(
            f"INSERT INTO orders VALUES ({r[0]}, '{r[1]}', {r[2]}, '{r[3]}', '{r[4]}')"
        )


# --- DDL (Unit_Test2.cpp:143-240) ---


def test_create_duplicate_rejected(engine):
    assert engine.execute("CREATE TABLE t1 (id INT NOT NULL, v DOUBLE)").ok
    res = engine.execute("CREATE TABLE t1 (id INT)")
    assert not res.ok and "exists" in res.error_message


def test_unsupported_type_rejected(engine):
    res = engine.execute("CREATE TABLE t2 (id INT, ts TIMESTAMP)")
    assert not res.ok and "Unsupported type" in res.error_message


def test_drop_and_recreate(engine):
    engine.execute("CREATE TABLE t3 (id INT NOT NULL, v DOUBLE)")
    assert engine.execute("DROP TABLE t3").ok
    assert not engine.execute("SELECT * FROM t3").ok
    assert engine.execute("CREATE TABLE t3 (id INT NOT NULL, w VARCHAR(10))").ok


def test_show_tables(engine):
    engine.execute("CREATE TABLE aaa (id INT NOT NULL)")
    engine.execute("CREATE TABLE bbb (id INT NOT NULL)")
    res = engine.execute("SHOW TABLES")
    assert res.headers == ["Tables"]
    assert ("aaa",) in res.rows and ("bbb",) in res.rows


def test_describe(engine):
    engine.execute("CREATE TABLE d1 (id BIGINT NOT NULL PRIMARY KEY, v DOUBLE)")
    res = engine.execute("DESCRIBE d1")
    assert res.rows[0] == ("id", "bigint", "NO", "PRI")
    assert res.rows[1] == ("v", "double", "YES", "")


# --- INSERT + point lookup (Unit_Test2.cpp:271-350) ---


def test_insert_and_point_lookup(engine):
    _seed_users(engine)
    res = engine.execute("SELECT * FROM users WHERE id = 1")
    assert len(res.rows) == 1 and res.rows[0][1] == "Alice"
    assert engine.execute("SELECT * FROM users WHERE id = 999").rows == []


def test_insert_upserts_on_existing_pk(engine):
    _seed_users(engine)
    assert engine.execute("INSERT INTO users VALUES (1, 'Alice2', 31, 1.0)").ok
    res = engine.execute("SELECT name FROM users WHERE id = 1")
    assert res.rows == [("Alice2",)]
    assert engine.execute("SELECT COUNT(*) FROM users").rows == [(5,)]


def test_insert_errors(engine):
    _seed_users(engine)
    assert not engine.execute("INSERT INTO users VALUES (9, 'X', 1)").ok  # count
    assert not engine.execute("INSERT INTO users VALUES (9, 'X', 'bad', 1.0)").ok  # type
    assert not engine.execute(
        "INSERT INTO users (name, age, salary) VALUES ('X', 1, 1.0)"
    ).ok  # missing NOT NULL pk


def test_full_scan_and_projection(engine):
    _seed_users(engine)
    assert len(engine.execute("SELECT * FROM users").rows) == 5
    res = engine.execute("SELECT name, age FROM users WHERE id = 2")
    assert res.headers == ["name", "age"] and res.rows == [("Bob", 25)]


# --- WHERE operators, exact row counts (Unit_Test2.cpp:390-449) ---


@pytest.mark.parametrize(
    "where,count",
    [
        ("region = 'APAC'", 2),
        ("amount > 100", 3),
        ("amount < 100", 2),
        ("amount >= 250", 2),
        ("region = 'APAC' AND status = 'completed'", 2),
        ("region = 'APAC' OR region = 'EMEA'", 4),
        ("status != 'cancelled'", 4),
    ],
)
def test_where_operators(engine, where, count):
    _seed_orders(engine)
    assert len(engine.execute(f"SELECT * FROM orders WHERE {where}").rows) == count


# --- S8 residual quirks (query_executor.cpp:691-711) ---


@pytest.mark.parametrize(
    "where",
    [
        "customer LIKE 'Al%'",
        "region IS NULL",
        "region IS NOT NULL",
        "amount BETWEEN 100 AND 300",
        "id IN (1, 2)",
        "NOT region = 'APAC'",
    ],
)
def test_unknown_operator_evaluates_true(engine, where):
    """evalWhere's default arm returns TRUE for any operator the reference
    executor doesn't handle (query_executor.cpp:691-693), so LIKE / IS NULL
    / IN / BETWEEN / NOT match every row."""
    _seed_orders(engine)
    assert len(engine.execute(f"SELECT * FROM orders WHERE {where}").rows) == 5


def test_unknown_operator_composes_with_and(engine):
    # the TRUE arm participates in AND/OR like any other predicate
    _seed_orders(engine)
    res = engine.execute(
        "SELECT * FROM orders WHERE customer LIKE 'x%' AND region = 'APAC'"
    )
    assert len(res.rows) == 2


def test_unknown_operator_rejected_without_quirk(spark):
    from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine

    eng = SamanvayEngine(spark, quirk_compat=False)
    _seed_orders(eng)
    res = eng.execute("SELECT * FROM orders WHERE customer LIKE 'Al%'")
    assert not res.ok and "Unsupported operator" in res.error_message
    eng.execute("DROP TABLE orders")


def test_literal_on_left_not_flipped(engine):
    """compareOp binds the column-ref side as the LEFT operand and keeps the
    operator (query_executor.cpp:701-706): `100 < amount` means
    `amount < 100` (matches 99.99 and 75.50), not the standard reading."""
    _seed_orders(engine)
    assert len(engine.execute("SELECT * FROM orders WHERE 100 < amount").rows) == 2
    assert len(engine.execute("SELECT * FROM orders WHERE 100 > amount").rows) == 3
    # '=' is direction-free, so point lookup via `lit = pk` still works
    assert len(engine.execute("SELECT * FROM orders WHERE 3 = id").rows) == 1


def test_literal_on_left_standard_without_quirk(spark):
    from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine

    eng = SamanvayEngine(spark, quirk_compat=False)
    _seed_orders(eng)
    # standard semantics: 100 < amount means amount > 100
    assert len(eng.execute("SELECT * FROM orders WHERE 100 < amount").rows) == 3
    eng.execute("DROP TABLE orders")


def test_col_col_and_lit_lit_compare_false(engine):
    """exprToString() returns nullopt for a column ref and row.find() misses
    for a literal, so compareOp returns FALSE both ways
    (query_executor.cpp:703-711): col-vs-col and lit-vs-lit match nothing."""
    _seed_orders(engine)
    assert engine.execute("SELECT * FROM orders WHERE customer = region").rows == []
    assert engine.execute("SELECT * FROM orders WHERE 1 = 1").rows == []


def test_col_col_and_lit_lit_standard_without_quirk(spark):
    from project_samanvay_a_true_hybrid_htap_database_spark import SamanvayEngine

    eng = SamanvayEngine(spark, quirk_compat=False)
    _seed_orders(eng)
    assert len(eng.execute("SELECT * FROM orders WHERE 1 = 1").rows) == 5
    assert eng.execute("SELECT * FROM orders WHERE customer = region").rows == []
    eng.execute("DROP TABLE orders")


# --- aggregation goldens (Unit_Test2.cpp:479-521) ---


def test_aggregation_goldens(engine):
    engine.execute("CREATE TABLE test_agg (id BIGINT NOT NULL, amount DOUBLE, qty INT)")
    for r in [(1, 100.50, 3), (2, 200.50, 1), (3, 300.25, 6)]:
        engine.execute(f"INSERT INTO test_agg VALUES ({r[0]}, {r[1]}, {r[2]})")
    assert engine.execute("SELECT SUM(amount) FROM test_agg").rows == [(601.25,)]
    assert engine.execute("SELECT MIN(amount) FROM test_agg").rows == [(100.5,)]
    assert engine.execute("SELECT MAX(amount) FROM test_agg").rows == [(300.25,)]
    assert engine.execute("SELECT SUM(qty) FROM test_agg").rows == [(10,)]
    avg = engine.execute("SELECT AVG(amount) FROM test_agg").rows[0][0]
    assert abs(avg - 200.41666666) < 1e-6
    res = engine.execute("SELECT COUNT(*), SUM(qty) FROM test_agg")
    assert res.rows == [(3, 10)]


def test_aggregation_with_where(engine):
    _seed_orders(engine)
    res = engine.execute("SELECT SUM(amount) FROM orders WHERE region = 'APAC'")
    assert res.rows == [(pytest.approx(175.49),)]


def test_min_max_empty_returns_zero(engine):
    """Reference quirk: MIN/MAX over empty selection → 0
    (query_executor.cpp:260-263)."""
    engine.execute("CREATE TABLE e1 (id INT NOT NULL, v DOUBLE)")
    assert engine.execute("SELECT MIN(v) FROM e1").rows == [(0,)]
    assert engine.execute("SELECT MAX(v) FROM e1").rows == [(0,)]


# --- UPDATE suite (Unit_Test2.cpp:526-586) ---


def test_update_point(engine):
    _seed_orders(engine)
    res = engine.execute("UPDATE orders SET status = 'shipped' WHERE id = 2")
    assert res.rows_affected == 1
    assert engine.execute("SELECT status FROM orders WHERE id = 2").rows == [("shipped",)]


def test_update_range(engine):
    _seed_orders(engine)
    res = engine.execute("UPDATE orders SET status = 'big' WHERE amount > 100")
    assert res.rows_affected == 3
    assert len(engine.execute("SELECT * FROM orders WHERE status = 'big'").rows) == 3


def test_update_requires_where(engine):
    _seed_orders(engine)
    res = engine.execute("UPDATE orders SET status = 'x'")
    assert not res.ok and "WHERE" in res.error_message


def test_update_unknown_column_rejected(engine):
    _seed_orders(engine)
    assert not engine.execute("UPDATE orders SET nope = 1 WHERE id = 1").ok


def test_update_type_error_rejected(engine):
    _seed_orders(engine)
    res = engine.execute("UPDATE orders SET amount = 'notanumber' WHERE id = 1")
    assert not res.ok and "Type mismatch" in res.error_message


# --- DELETE suite (Unit_Test2.cpp:591-645, 774-781) ---


def test_delete_point_and_reinsert(engine):
    _seed_users(engine)
    assert engine.execute("DELETE FROM users WHERE id = 2").rows_affected == 1
    assert engine.execute("SELECT * FROM users WHERE id = 2").rows == []
    assert engine.execute("SELECT COUNT(*) FROM users").rows == [(4,)]
    assert engine.execute("INSERT INTO users VALUES (2, 'Bob2', 26, 1.0)").ok
    assert engine.execute("SELECT name FROM users WHERE id = 2").rows == [("Bob2",)]


def test_delete_non_pk_predicate(engine):
    _seed_orders(engine)
    assert engine.execute("DELETE FROM orders WHERE region = 'APAC'").rows_affected == 2
    assert engine.execute("SELECT COUNT(*) FROM orders").rows == [(3,)]


def test_delete_or_predicate(engine):
    _seed_orders(engine)
    res = engine.execute("DELETE FROM orders WHERE region = 'NA' OR status = 'cancelled'")
    assert res.rows_affected == 2


def test_delete_requires_where(engine):
    _seed_orders(engine)
    assert not engine.execute("DELETE FROM orders").ok


# --- EXPLAIN (Unit_Test2.cpp:315-350, 454-477) ---


def test_explain_point_lookup(engine):
    _seed_users(engine)
    res = engine.execute("EXPLAIN SELECT * FROM users WHERE id = 1")
    text = "\n".join(r[0] for r in res.rows)
    assert "POINT_LOOKUP" in text


def test_explain_aggregation(engine):
    _seed_users(engine)
    res = engine.execute("EXPLAIN SELECT COUNT(*) FROM users")
    text = "\n".join(r[0] for r in res.rows)
    assert "AGGREGATION" in text


def test_explain_io_cost_line(engine, spark):
    """EXPLAIN carries an Estimated I/O Cost section in parquet-file units —
    the analog of the reference's SSTable-read cost line
    (hybrid_query_router.hpp:255,274-275,331-393)."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    engine.register_base("ord", df, "o_orderkey")
    res = engine.execute("EXPLAIN SELECT COUNT(o_orderkey) FROM ord")
    text = "\n".join(r[0] for r in res.rows)
    assert "Estimated I/O Cost: 1 file(s)," in text and "bytes" in text
    res = engine.execute("EXPLAIN SELECT * FROM ord WHERE o_orderkey = 1")
    text = "\n".join(r[0] for r in res.rows)
    assert "Estimated I/O Cost: 1 file probe(s)" in text


# --- HTAP mixed workload (Unit_Test2.cpp:799-854) ---


def test_htap_read_your_writes_and_flush(engine):
    engine.execute("CREATE TABLE h1 (id BIGINT NOT NULL, v DOUBLE)")
    for i in range(10):
        engine.execute(f"INSERT INTO h1 VALUES ({i}, {float(i)})")
    assert engine.execute("SELECT SUM(v) FROM h1").rows == [(45.0,)]
    assert engine.flush("h1") == 10
    assert engine.execute("SELECT COUNT(*) FROM h1").rows == [(10,)]
    # post-flush DML immediately visible (memtable overlay over flushed base)
    engine.execute("UPDATE h1 SET v = 100.0 WHERE id = 0")
    assert engine.execute("SELECT SUM(v) FROM h1").rows == [(145.0,)]
    engine.execute("DELETE FROM h1 WHERE id = 9")
    assert engine.execute("SELECT COUNT(*) FROM h1").rows == [(9,)]


def test_parquet_base_with_overlay(engine, spark):
    """A registered parquet-backed base table accepts DML through the
    memtable overlay (the HTAP split: cold base + hot writes)."""
    base = spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    engine.register_base("big", base, pk="id")
    assert engine.execute("SELECT COUNT(*) FROM big").rows == [(100,)]
    engine.execute("INSERT INTO big VALUES (100, 1.5)")
    engine.execute("DELETE FROM big WHERE id = 0")
    assert engine.execute("SELECT COUNT(*) FROM big").rows == [(100,)]
    res = engine.execute("SELECT v FROM big WHERE id = 100")
    assert res.rows == [(1.5,)]


def test_multi_statement_executes_first_only(engine):
    """S20 quirk parity: only statement 0 of a multi-statement input runs
    (reference: query_executor.cpp:29)."""
    engine.execute("CREATE TABLE ms (id INT PRIMARY KEY, v VARCHAR(20))")
    rs = engine.execute(
        "INSERT INTO ms VALUES (1, 'a; b'); INSERT INTO ms VALUES (2, 'x')"
    )
    assert rs.ok and rs.rows_affected == 1
    # only the first INSERT ran; the ';' inside the quoted string is data
    assert engine.execute("SELECT COUNT(*) FROM ms").rows == [(1,)]
    assert engine.execute("SELECT v FROM ms WHERE id = 1").rows == [("a; b",)]
    # SELECT followed by junk: the junk after ';' is ignored, not a parse error
    rs = engine.execute("SELECT id FROM ms; DROP TABLE ms")
    assert rs.ok and rs.rows == [(1,)]
    assert "ms" in engine.tables
