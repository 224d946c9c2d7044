"""Property-based differential for sequence packing (r10).

pack_sequences feeds the training-step capacity math (its audit converts
directly into accelerator hours), so its binning must be exactly the
documented contract: per shard (doc_id mod shards), docs concatenated in
doc_id order, each doc binned by floor(start_offset / budget). Verified
against a literal Python replication on Hypothesis corpora with hostile
lengths — empty docs, docs longer than the whole budget, single-doc
shards.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_samanvay_a_true_hybrid_htap_database_spark.operators import sampling

# token counts spanning empty (split('') -> ['']) through over-budget
DOC = st.integers(min_value=0, max_value=40).map(lambda n: " ".join(["tok"] * n))
CORPUS = st.lists(DOC, min_size=1, max_size=16)

BUDGET = 16
SHARDS = 3


def _n_tokens(text: str) -> int:
    return len(text.strip().lower().split(" "))


def _brute_bins(corpus: list[str]) -> dict[tuple[int, int], tuple[int, int]]:
    out: dict[tuple[int, int], list[int]] = {}
    offsets = {s: 0 for s in range(SHARDS)}
    for i, t in enumerate(corpus):  # doc_id order within each shard
        s = i % SHARDS
        n = _n_tokens(t)
        b = offsets[s] // BUDGET
        offsets[s] += n
        out.setdefault((s, b), []).append(n)
    return {k: (len(v), sum(v)) for k, v in out.items()}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_pack_sequences_matches_offset_binning(spark, corpus):
    d = tempfile.mkdtemp(prefix="packprop_")
    try:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(corpus)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {
            (r["shard"], r["bin"]): (r["n_docs"], r["bin_tokens"])
            for r in sampling.pack_sequences(
                spark, d, budget=BUDGET, shards=SHARDS
            ).collect()
        }
        assert got == _brute_bins(corpus)
        # conservation: every token lands in exactly one bin
        assert sum(t for _, t in got.values()) == sum(
            _n_tokens(t) for t in corpus
        )
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
