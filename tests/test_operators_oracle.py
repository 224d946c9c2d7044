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
    if name not in entrymod.oracle_sql():
        pytest.skip("no SQL oracle (sketch/approx op; bounded by twin test)")
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


def test_percentile_approx_bounded_by_exact(spark):
    """Production-twin recall bound: the GK sketch quantile must land within
    a small relative error of the exact interpolated quantile per group (the
    sketch returns an actual element, so exact equality is not expected)."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators import analytics

    exact = {
        r["l_returnflag"]: r
        for r in analytics.percentile_prices(spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in analytics.percentile_prices_approx(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for flag, er in exact.items():
        ar = approx[flag]
        assert ar["n"] == er["n"]
        # The tolerance-form output (VERDICT r6 #7) carries the exact
        # percentiles (hash-comparable with the oracle) ...
        for q in ("p50", "p90", "p99"):
            assert ar[q] == er[q], f"{flag}.{q}: {ar[q]} vs exact {er[q]}"
        # ... and the sketch-vs-exact bound as booleans the gate hashes.
        for q in ("p50", "p90", "p99"):
            assert ar[f"{q}_within_tol"] is True, f"{flag}.{q} out of tolerance"


def test_percentile_sketch_form_bounded_by_exact(spark):
    """The RAW GK-sketch serving form (audit=False — what bench.py times;
    since r13 the REGISTERED form is the rank-error audit with its own
    hash oracle, VERDICT r12 #2) emits raw sketch values, so bound it
    here the same way the tolerance gate does: every sketch quantile
    within 5% relative error of the exact interpolated quantile,
    identical groups and counts."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators import analytics

    exact = {
        r["l_returnflag"]: r
        for r in analytics.percentile_prices(spark, SF_DIR).collect()
    }
    sketch = {
        r["l_returnflag"]: r
        for r in analytics.percentile_prices_sketch(
            spark, SF_DIR, audit=False
        ).collect()
    }
    assert set(exact) == set(sketch)
    for flag, er in exact.items():
        sr = sketch[flag]
        assert sr["n"] == er["n"]
        for q in ("p50", "p90", "p99"):
            rel = abs(sr[q] - er[q]) / er[q]
            assert rel <= 0.05, f"{flag}.{q}: sketch {sr[q]} vs exact {er[q]}"


def test_simhash_scale_twin_subset_of_exact(spark):
    """The ham≤3 scale twin must equal the ham≤5 exact-recall set filtered
    to hamming ≤ 3 — the 15-bit-chunk pigeonhole loses no pairs."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators import dedup

    wide = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs(spark, SF_DIR).collect()
    }
    scale = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs_scale(spark, SF_DIR).collect()
    }
    expected = {k: h for k, h in wide.items() if h <= 3}
    assert scale == expected and len(scale) > 0


def test_distinct_count_approx_bounded_by_exact(spark):
    """HLL twin tracks the exact distinct counts within ~5x rsd and keeps
    the exact row count column untouched."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators import analytics

    exact = {r.l_returnflag: r for r in analytics.distinct_count_agg(spark, SF_DIR).collect()}
    approx = {r.l_returnflag: r for r in analytics.distinct_count_approx(spark, SF_DIR).collect()}
    assert set(exact) == set(approx)
    for flag, er in exact.items():
        ar = approx[flag]
        assert ar.n_rows == er.n_rows
        # Tolerance-form output (VERDICT r6 #7): exact counts must match the
        # exact twin bit-for-bit; the HLL bound is the hashed booleans.
        for col in ("n_parts", "n_supps"):
            assert ar[col] == er[col], f"{flag}.{col}: {ar[col]} vs {er[col]}"
        assert ar.parts_within_tol is True and ar.supps_within_tol is True


def test_percentile_sketch_audit_tolerates_tie_mass(spark, tmp_path):
    """r14 (ADVICE r13): a distribution with heavy probability mass TIED
    at a quantile element must not fail the rank-error audit — the audit
    measures distance from q*n to the element's [count(<), count(<=)]
    rank interval, so a contract-honoring sketch reports bucket 0 even
    when >1% of the group is the chosen value."""
    from pyspark.sql import functions as F

    from project_samanvay_a_true_hybrid_htap_database_spark.operators import analytics

    # 40% of the mass tied at 100.0 spanning the median; ties at the tail too
    vals = [50.0] * 300 + [100.0] * 400 + [200.0] * 290 + [300.0] * 10
    df = spark.createDataFrame(
        [("A", v) for v in vals], "l_returnflag string, l_extendedprice double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = analytics.percentile_prices_sketch(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 1000
    for q in (50, 90, 99):
        assert r[f"p{q}_rank_err_bucket"] == 0, r.asDict()
