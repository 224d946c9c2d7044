"""Parser/executor robustness fuzz: arbitrary garbage through
``SamanvayEngine.execute`` must come back as a clean ``error_message``
ResultSet (SqlError path) or a well-formed result — never an unhandled
exception, a hang, or corrupted table state. The reference's parser layer
rejects malformed statements with error strings (query_executor.cpp's
validation paths); this pins the same contract under adversarial input."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_samanvay_a_true_hybrid_htap_database_spark.engine import ResultSet

SQL_WORDS = [
    "SELECT", "FROM", "WHERE", "INSERT", "INTO", "VALUES", "UPDATE",
    "SET", "DELETE", "CREATE", "TABLE", "DROP", "AND", "OR", "NOT",
    "COUNT", "SUM", "*", "(", ")", ",", ";", "'", "=", "<", ">",
    "1", "0.5", "NULL", "t", "orders", "x", "''", "--",
]


def _check(engine, sql: str) -> None:
    rs = engine.execute(sql)
    assert isinstance(rs, ResultSet)
    # either a clean error or a clean result — never both absent with rows
    if rs.error_message is not None:
        assert isinstance(rs.error_message, str) and rs.error_message


@settings(max_examples=80, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.text(max_size=120))
def test_random_text_never_crashes(engine, s):
    _check(engine, s)


@settings(max_examples=80, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.sampled_from(SQL_WORDS), min_size=1, max_size=12))
def test_sql_word_salad_never_crashes(engine, words):
    _check(engine, " ".join(words))


def test_state_survives_garbage(engine):
    """A valid table stays intact and queryable after a barrage of
    malformed statements against it."""
    engine.execute("CREATE TABLE fz (id BIGINT NOT NULL, v DOUBLE)")
    engine.execute("INSERT INTO fz VALUES (1, 2.5)")
    garbage = [
        "INSERT INTO fz VALUES (2)",          # arity mismatch
        "INSERT INTO fz VALUES (2, 'x')",     # type error
        "INSERT INTO fz VALUES (NULL, 1.0)",  # NOT NULL pk
        "UPDATE fz SET v = 9",                # mandatory WHERE
        "DELETE FROM fz",                      # mandatory WHERE
        "SELECT nope FROM fz",                 # unknown column
        "SELECT * FROM nope",                  # unknown table
        "CREATE TABLE fz (id BIGINT)",         # duplicate table
        "INSERT INTO fz VALUES (3, abc)",      # bare identifier value
        "UPDATE fz SET id = 1, id = 2 WHERE id = 1",
    ]
    for sql in garbage:
        rs = engine.execute(sql)
        assert rs.error_message, f"expected clean error for {sql!r}"
    rs = engine.execute("SELECT * FROM fz WHERE id = 1")
    assert rs.error_message is None
    assert rs.rows == [(1, 2.5)]
