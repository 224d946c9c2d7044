"""Property test of the winnowing guarantee (r10): the MOSS selection
promises that ANY shared token run of length >= k + w - 1 leaves at least
one shared fingerprint between the two documents — the non-probabilistic
claim that separates winnowing from MinHash. Hypothesis plants a shared
run of exactly that length inside otherwise-distinct word soup and asserts
the fingerprint sets intersect; a Python re-implementation of the
documented contract double-checks the Spark fingerprints themselves."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_samanvay_a_true_hybrid_htap_database_spark.operators import text as T

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
PAD = st.lists(WORDS, min_size=0, max_size=6)
RUN = st.lists(WORDS, min_size=T.WINNOW_K + T.WINNOW_W - 1,
               max_size=T.WINNOW_K + T.WINNOW_W + 2)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _fps(text: str) -> set[int]:
    toks = text.strip().lower().split(" ")
    k, w = T.WINNOW_K, T.WINNOW_W
    hs = [
        _h("wfp|" + " ".join(toks[i : i + k]))
        for i in range(len(toks) - k + 1)
    ]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pad_a=PAD, pad_b=PAD, run=RUN)
def test_shared_run_always_leaves_shared_fingerprint(spark, pad_a, pad_b, run):
    doc_a = " ".join(pad_a + run)
    doc_b = " ".join(run + pad_b)
    d = tempfile.mkdtemp(prefix="winnowprop_")
    try:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate([doc_a, doc_b])],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got: dict[int, set[int]] = {0: set(), 1: set()}
        for r in T.winnowing_fingerprints(spark, d).collect():
            got[r["doc_id"]].add(r["fp"])
        # the Spark fingerprints ARE the documented contract
        assert got[0] == _fps(doc_a)
        assert got[1] == _fps(doc_b)
        # the winnowing guarantee: the planted k+w-1 run must be caught
        assert got[0] & got[1], (doc_a, doc_b)
    finally:
        shutil.rmtree(d, ignore_errors=True)
