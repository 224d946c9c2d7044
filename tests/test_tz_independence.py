"""Event-query results must not depend on the session timezone.

The driver harness calls queries() with ITS OWN SparkSession, whose
``spark.sql.session.timeZone`` is not guaranteed to be UTC. events.ts is
TIMESTAMP_NTZ, and ``unix_timestamp()`` on NTZ is interpreted in the
session timezone — the exact hazard functions/timefns.py exists to remove
(timestamp_diff against the NTZ epoch literal is pure calendar
arithmetic). These tests run the epoch-emitting event queries under a
deliberately hostile timezone and require the same rows the DuckDB oracle
(naive-as-UTC) computes.
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

# Queries whose output embeds epoch seconds / day offsets / hour buckets
# derived from events.ts — the ones a tz-dependent conversion would skew.
TZ_SENSITIVE = [
    "events_hourly_rollup",
    "sessionize",
    "window_lag_delta",
    "events_trending_topk",
    "attribution_window_join",
    "retention_cohorts",
    "interval_overlap_join",
]

HOSTILE_TZ = "America/New_York"  # UTC-5/-4, DST transitions


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
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
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture()
def hostile_tz(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_event_query_same_rows_under_hostile_tz(hostile_tz, duck, name):
    spark = hostile_tz
    got = _sorted_rows(
        [tuple(r) for r in entrymod.queries()[name](spark, SF_DIR).collect()]
    )
    want = _sorted_rows(duck.execute(entrymod.oracle_sql()[name]).fetchall())
    assert got == want, (
        f"{name} diverges from the naive-as-UTC oracle under "
        f"{HOSTILE_TZ} — a session-timezone-dependent conversion leaked in"
    )
