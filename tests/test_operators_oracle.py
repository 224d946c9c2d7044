"""Every queries() entry cross-checked against its DuckDB oracle at sf0.001
(the driver does the same at sf0.01 — tools/check_oracle.py replicates that
exactly; this is the fast in-repo version of the same gate).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from project_samanvay_a_true_hybrid_htap_database_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int) and not isinstance(v, bool) and abs(v) < 2**53:
        return float(v)
    return v


def _sorted_rows(rows):
    return sorted(
        (tuple(_norm(c) for c in r) for r in rows),
        key=lambda t: tuple(("" if c is None else str(c)) for c in t),
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    sql = entrymod.oracle_sql()[name]
    res = duck.execute(sql)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    idx = [ocols.index(c) for c in scols]
    orows = [tuple(r[i] for i in idx) for r in orows]
    assert _sorted_rows(srows) == _sorted_rows(orows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
