"""Property-based differential for the n-gram Jaccard pair generator
(r10) — the primitive under minhash verify, containment, and the staged
dedup composition. The DuckDB oracle pins parity on the FIXED driver
corpus; this pins the contract on Hypothesis-generated word-soup corpora
that exercise what the fixtures cannot: empty docs, docs shorter than the
shingle width, heavy word repetition (distinct-shingle semantics), full
duplicates (jaccard exactly 1.0), and threshold boundaries.

Python oracle = a literal re-implementation of the documented contract:
tokens = trim(lower(text)).split(' '); shingles = DISTINCT 3-word
windows; jaccard = |A∩B| / |A∪B| over non-empty shingle sets; emit
(d1 < d2) pairs with jaccard >= 0.5, value rounded to 4.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_samanvay_a_true_hybrid_htap_database_spark.operators import dedup

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
DOC = st.lists(WORDS, min_size=0, max_size=10).map(" ".join)
CORPUS = st.lists(DOC, min_size=2, max_size=8)


def _shingles(text: str) -> set[str]:
    toks = text.strip().lower().split(" ")
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _brute_pairs(corpus: list[str]) -> set[tuple[int, int, float]]:
    sh = {i: _shingles(t) for i, t in enumerate(corpus)}
    out = set()
    for a in sh:
        for b in sh:
            if a >= b or not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            jac = inter / len(sh[a] | sh[b])
            if jac >= dedup.JACCARD_THRESHOLD:
                out.add((a, b, round(jac, 4)))
    return out


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_minhash_lsh_precision_is_exact(spark, corpus):
    """LSH banding is allowed to MISS a true pair (recall is the measured,
    CI-floored number), but every pair it emits is exact-verified — so on
    ANY corpus the emitted set must be a subset of the brute-force truth
    with identical jaccard values. A false positive here means the verify
    predicate itself broke."""
    d = tempfile.mkdtemp(prefix="lshprop_")
    try:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(corpus)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {
            (r["d1"], r["d2"], float(r["jaccard"]))
            for r in dedup.minhash_lsh_pairs(spark, d).collect()
        }
        assert got <= _brute_pairs(corpus), got - _brute_pairs(corpus)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_ngram_jaccard_matches_bruteforce(spark, corpus):
    d = tempfile.mkdtemp(prefix="jacprop_")
    try:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(corpus)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {
            (r["d1"], r["d2"], float(r["jaccard"]))
            for r in dedup.ngram_jaccard_pairs(spark, d).collect()
        }
        assert got == _brute_pairs(corpus)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


class TestBloomOneSided:
    """decontaminate_bloom (r10): Bloom membership can only OVERCOUNT —
    every doc the exact-join decontamination flags must be flagged by the
    Bloom form with n_hits >= n_shared, and no doc the exact form sees as
    sharing k shingles may report fewer than k Bloom hits."""

    def test_bloom_dominates_exact_join(self, spark):
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            dedup,
        )

        sf = "/root/testdata/sf0.001"
        exact = {
            r["doc_id"]: r["n_shared"]
            for r in dedup.decontaminate_ngram_overlap(spark, sf).collect()
        }
        bloom = {
            r["doc_id"]: (r["n_hits"], r["flagged"])
            for r in dedup.decontaminate_bloom(spark, sf).collect()
        }
        assert exact, "exact decontamination found nothing to compare"
        for doc_id, n_shared in exact.items():
            n_hits, flagged = bloom[doc_id]
            assert flagged and n_hits >= n_shared, (
                f"doc {doc_id}: bloom {n_hits} < exact {n_shared}"
            )


class TestBloomHonestSizing:
    """VERDICT r10 #3: the filter must size itself from the blocklist's
    cardinality (integer rule, oracle-reproducible), refuse to serve a
    saturated filter, and keep the bitmap off the driver above the
    broadcast threshold — with the distributed probe returning the
    identical answer."""

    def test_m_bits_rule_is_integer_next_pow2(self):
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            dedup,
        )

        assert dedup.bloom_m_bits(0) == dedup.BLOOM_M_MIN
        assert dedup.bloom_m_bits(1) == dedup.BLOOM_M_MIN
        # 4*3*100 = 1200 -> 2048; 4*3*10_000 = 120_000 -> 131072
        assert dedup.bloom_m_bits(100) == 2048
        assert dedup.bloom_m_bits(10_000) == 131072
        # monotone, always a power of two, always >= 4*h*n
        prev = 0
        for n in (1, 7, 50, 999, 12_345, 10**6, 10**9):
            m = dedup.bloom_m_bits(n)
            assert m >= max(dedup.BLOOM_M_MIN, 12 * n)
            assert m & (m - 1) == 0
            assert m >= prev
            prev = m

    def test_saturated_filter_raises_not_lies(self, spark):
        import pytest as _pytest

        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            dedup,
        )

        sf = "/root/testdata/sf0.001"
        with _pytest.raises(ValueError, match="saturated"):
            dedup.decontaminate_bloom(spark, sf, m_bits=dedup.BLOOM_M_MIN)

    def test_distributed_probe_matches_broadcast_probe(self, spark):
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            dedup,
        )

        sf = "/root/testdata/sf0.001"
        lit_rows = sorted(
            map(tuple, dedup.decontaminate_bloom(spark, sf).collect())
        )
        dist = dedup.decontaminate_bloom(spark, sf, broadcast_bytes_max=0)
        # the word table must not be a driver-side literal in this plan
        phys = dist._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            dist._jdf.queryExecution(), "formatted"
        )
        assert "LocalTableScan" not in phys.split("\n\n")[0], (
            "distributed path still materializes the bitmap on the driver"
        )
        assert sorted(map(tuple, dist.collect())) == lit_rows
