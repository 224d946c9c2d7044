"""Property-based verification of SimHash's EXACT-recall guarantee (r10).

simhash_neardup_pairs claims pigeonhole completeness: every pair within
hamming <= 5 of the 60-bit fingerprint is emitted (6 chunks, so <= 5
differing bits leave one chunk identical), and nothing outside the radius
survives the exact bit_count verify. The fixtures exercise one corpus;
this checks the claim — fingerprint values AND the emitted pair set —
against a driver-side reimplementation on Hypothesis corpora built from a
tiny vocabulary (few distinct token sets ⇒ many identical/near-identical
fingerprints ⇒ dense pair space, the regime where a bucketing bug would
drop pairs).

Python oracle replicates the documented contract literally: tokens =
trim(lower(text)).split(' '); per DISTINCT token h = first 15 md5 hex
digits as int; fingerprint bit j = 1 iff 2 x (count of h with bit j set)
> n_distinct_tokens; pairs = all (d1 < d2) with popcount(xor) <= 5.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_samanvay_a_true_hybrid_htap_database_spark.operators import dedup

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta"])
DOC = st.lists(WORDS, min_size=1, max_size=6).map(" ".join)
CORPUS = st.lists(DOC, min_size=2, max_size=8)

BITS = 60


def _fingerprint(text: str) -> int:
    toks = sorted(set(text.strip().lower().split(" ")))
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    n = len(hs)
    fp = 0
    for j in range(BITS):
        ones = sum((h >> j) & 1 for h in hs)
        if 2 * ones > n:
            fp |= 1 << j
    return fp


def _brute_pairs(corpus: list[str], max_hamming: int) -> set[tuple[int, int, int]]:
    fps = {i: _fingerprint(t) for i, t in enumerate(corpus)}
    return {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= max_hamming
    }


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_simhash_pairs_are_pigeonhole_complete_and_exact(spark, corpus):
    d = tempfile.mkdtemp(prefix="shprop_")
    try:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(corpus)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        # fingerprints themselves match the contract (both the SQL-vote
        # and vectorized forms feed the pair generators)
        got_fp = {
            r["doc_id"]: r["simhash"]
            for r in dedup.simhash_fingerprints(spark, d).collect()
        }
        assert got_fp == {i: _fingerprint(t) for i, t in enumerate(corpus)}

        # pair set: complete within the radius, empty outside it — for
        # BOTH chunkings (6x10-bit ham<=5 and the 4x15-bit ham<=3 twin)
        got5 = {
            (r["d1"], r["d2"], r["hamming"])
            for r in dedup.simhash_neardup_pairs(spark, d).collect()
        }
        assert got5 == _brute_pairs(corpus, 5)
        got3 = {
            (r["d1"], r["d2"], r["hamming"])
            for r in dedup.simhash_neardup_pairs_scale(spark, d).collect()
        }
        assert got3 == _brute_pairs(corpus, 3)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
