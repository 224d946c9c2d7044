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
