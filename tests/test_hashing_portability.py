"""Cross-engine portability of the hashing foundation: every dedup /
sampling / LSH oracle assumes Spark's md5-derived integers equal DuckDB's
byte-for-byte. Verify directly on hostile inputs — quotes, unicode,
whitespace runs, long strings, empties — not just the tame testdata."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from project_samanvay_a_true_hybrid_htap_database_spark.functions.hashing import (
    MERSENNE31,
    md5_long32,
    md5_long60,
    permutation_params,
)

HOSTILE = [
    "",
    " ",
    "a",
    "it's",
    'she said "hi"',
    "tab\there",
    "newline\nhere",
    "ünïcødé 文字 🙂",
    "trailing space ",
    " leading",
    "a" * 10_000,
    "0",
    "-1",
    "NULL",
    "null",
    "'; DROP TABLE t; --",
    "back\\slash",
    "semi;colon",
    ",comma,",
    "mixed 日本語 and ascii",
]


def test_md5_longs_match_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in HOSTILE], ["s"]).select(
        "s",
        md5_long32(F.col("s")).alias("h32"),
        md5_long60(F.col("s")).alias("h60"),
    )
    got = {r["s"]: (r["h32"], r["h60"]) for r in df.collect()}

    con = duckdb.connect()
    for s in HOSTILE:
        h32, h60 = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT,"
            "       ('0x' || substr(md5(?), 1, 15))::BIGINT",
            [s, s],
        ).fetchone()
        assert got[s] == (h32, h60), f"hash mismatch for {s!r}"


def test_affine_permutations_match_duckdb(spark):
    """MinHash permutation arithmetic ((a*h + b) mod p) must agree on the
    exact integers both engines produce — including near-overflow h."""
    params = permutation_params(4)
    hs = [0, 1, MERSENNE31 - 1, MERSENNE31, 2**31 - 1, 123456789]
    df = spark.createDataFrame([(h,) for h in hs], ["h"])
    cols = [
        ((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    got = {r["h"]: tuple(r[f"m{i}"] for i in range(4)) for r in df.select("h", *cols).collect()}

    con = duckdb.connect()
    for h in hs:
        exprs = ", ".join(
            f"({h}::BIGINT * {a}::BIGINT + {b}::BIGINT) % {MERSENNE31}"
            for a, b in params
        )
        want = con.execute(f"SELECT {exprs}").fetchone()
        assert got[h] == want, f"permutation mismatch for h={h}"


def test_tokenizer_matches_duckdb_split(spark):
    """The shared tokenization contract: Spark's tokens() must equal
    DuckDB's string_split(trim(lower(s)), ' ') on hostile whitespace."""
    from project_samanvay_a_true_hybrid_htap_database_spark.functions.textfns import tokens

    cases = [
        "Simple Case",
        "  leading and trailing  ",
        "double  space",
        "UPPER lower MiXeD",
        "one",
        "tab\tis not split",
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["text"]).select(
        "text", tokens("text").alias("t")
    )
    got = {r["text"]: list(r["t"]) for r in df.collect()}
    con = duckdb.connect()
    for s in cases:
        (want,) = con.execute(
            "SELECT string_split(trim(lower(?)), ' ')", [s]
        ).fetchone()
        assert got[s] == want, f"tokenizer mismatch for {s!r}: {got[s]} vs {want}"
