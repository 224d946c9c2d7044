"""Pin the committed quantizer-recall artifact (VERDICT r8 ADVICE #2).

r8 cited recall figures (label 0.08, LSH 0.21/0.58, IVF 0.26/0.43) that
lived only in prose — the same 'unrecorded measurements as fact' pattern
the round's own verdict criticized. RECALL_r*.json (tools/recall_probe.py)
is the committed record; these tests keep it honest:

- schema + range checks on every committed figure;
- the quantizer ORDERING the docstrings cite (learned IVF beats the random
  label blocking; multiprobe beats single-probe) must hold in the artifact;
- the cheapest audit (label blocking) is RE-DERIVED live and compared to
  the committed row, so a code change that shifts the figures without
  re-running the probe fails here instead of silently unpinning the record.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"


def _latest_artifact() -> dict:
    files = sorted(glob.glob(str(REPO / "RECALL_r*.json")))
    assert files, "no RECALL_r*.json committed — run tools/recall_probe.py"
    with open(files[-1]) as fh:
        return json.load(fh)


class TestRecallArtifact:
    def test_schema_and_ranges(self):
        doc = _latest_artifact()
        for key, fields in [
            ("label_blocking", ["mean_recall", "min_recall"]),
            ("sign_lsh", ["recall_single_probe", "recall_multiprobe"]),
            ("learned_ivf", ["recall_nprobe1", "recall_nprobe2"]),
        ]:
            assert key in doc, f"artifact missing {key}"
            row = doc[key]
            assert row["k"] == 3 and row["n_queries"] == 50
            for f in fields:
                assert 0.0 <= row[f] <= 1.0, f"{key}.{f} out of range"

    def test_quantizer_ordering_claims(self):
        """The orderings the docstrings and SCALE.md cite must be true of
        the committed record: the learned-IVF probe beats the random label
        blocking (the whole point of the r9 rebase — VERDICT r8 #3/#4),
        and the second probe strictly helps."""
        doc = _latest_artifact()
        label = doc["label_blocking"]["mean_recall"]
        ivf1 = doc["learned_ivf"]["recall_nprobe1"]
        ivf2 = doc["learned_ivf"]["recall_nprobe2"]
        lsh1 = doc["sign_lsh"]["recall_single_probe"]
        lsh2 = doc["sign_lsh"]["recall_multiprobe"]
        assert ivf1 > label and ivf2 > label
        assert ivf2 > ivf1
        assert lsh2 > lsh1
        # the r9 Done criterion (VERDICT r8 #3): the learned quantizer's
        # nprobe=2 recall must be at least the old label-derived 0.43
        assert ivf2 >= 0.43
        # r10 curve (VERDICT r9 #8): the deeper probes must be monotone,
        # and the nprobe=3 point must justify the raised IVF_JOIN_NPROBE
        # default — it beats sign-LSH multiprobe at ~the same scanned
        # fraction (3/10 vs 5/16). Measured r10: 0.6733 / 0.74.
        if "learned_ivf_deep" in doc:
            ivf3 = doc["learned_ivf_deep"]["recall_nprobe3"]
            ivf4 = doc["learned_ivf_deep"]["recall_nprobe4"]
            assert ivf2 < ivf3 < ivf4
            assert ivf3 >= lsh2
            assert ivf3 >= 0.60
        # r13 (VERDICT r12 #5): the kNN-JOIN head-to-head at the same k —
        # the measured basis for the label-blocking retirement verdicts on
        # knn_join_blocked / embedding_neardup_pairs / semdedup_stats.
        # Measured r13: 0.6733 vs 0.08 (8.4x at nprobe=3).
        if "learned_ivf_join" in doc:
            join_row = doc["learned_ivf_join"]
            assert join_row["k"] == 3 and join_row["n_queries"] == 50
            assert join_row["mean_recall"] > 5 * label
            assert join_row["mean_recall"] >= 0.60

    @pytest.mark.skipif(
        not os.path.isdir(SF_DIR), reason="sf0.01 testdata not present"
    )
    def test_committed_matches_live(self, spark):
        """Re-derive the cheapest audit and compare to the committed row —
        the artifact must track the code, not a previous generation of it."""
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            similarity,
        )

        doc = _latest_artifact()
        live = similarity.ann_recall_audit(spark, SF_DIR).head().asDict()
        committed = doc["label_blocking"]
        assert live["mean_recall"] == pytest.approx(committed["mean_recall"])
        assert live["min_recall"] == pytest.approx(committed["min_recall"])


class TestLearnedQuantizer:
    def test_lloyd_rounds_decrease_wcss(self, spark):
        """The learning is real optimization, not churn: the k-means
        objective (mean squared distance to the nearest centroid) must be
        non-increasing across Lloyd rounds — the textbook monotonicity
        guarantee — and strictly better after 5 rounds than after the
        first (the random-partition init leaves plenty to optimize).
        Tolerance 1e-6 absorbs the per-round centroid rounding the
        cross-engine contract requires."""
        from pyspark.sql import functions as F

        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            similarity,
        )
        from project_samanvay_a_true_hybrid_htap_database_spark.sources import (
            load_table,
        )

        sf = "/root/testdata/sf0.001"
        emb = load_table(spark, sf, "embeddings").select("embedding")
        wcss = []
        for r in range(1, 6):
            cents = similarity.learned_centroids(spark, sf, rounds=r)
            d = similarity._nearest_centroid(F.col("embedding"), cents)["d"]
            wcss.append(emb.agg(F.avg(d)).head()[0])
        for a, b in zip(wcss, wcss[1:]):
            assert b <= a + 1e-6, wcss
        assert wcss[-1] < wcss[0] - 1e-6, wcss

    def test_pq_compression_curve(self):
        """r10: the committed PQ figures must show the m-vs-recall
        monotonicity the PQ_M=16 default and its docstring cite
        (RECALL_r10.json: 0.0733 / 0.1667 / 0.34 / 0.4667 at m=4/8/16/32),
        and the registered default must clear the floor that made 16 the
        pick over 8."""
        doc = _latest_artifact()
        if "pq_adc" not in doc:
            pytest.skip("artifact predates the PQ audits")
        m4 = doc["pq_adc_m4"]["mean_recall"]
        m8 = doc["pq_adc_m8"]["mean_recall"]
        m16 = doc["pq_adc"]["mean_recall"]
        m32 = doc["pq_adc_m32"]["mean_recall"]
        assert m4 < m8 < m16 < m32
        assert m16 >= 0.30
        for key in ("pq_adc", "pq_adc_m4", "pq_adc_m8", "pq_adc_m32"):
            row = doc[key]
            assert row["k"] == 3 and row["n_queries"] == 50
            assert 0.0 <= row["mean_recall"] <= 1.0

    def test_ivfpq_residual_decision_is_recorded(self):
        """r10: the serving default (plain PQ codes, not residual) must
        trace to the committed measurement: on this corpus residual
        encoding recalls LESS (0.2667 vs 0.3067 at nprobe=3) — the coarse
        centroids of near-uniform vectors sit close to the global mean,
        so the residual rotation buys nothing and its codebook spends
        budget re-learning noise. If a future corpus flips the ordering,
        this test flips the default conversation, not silently."""
        doc = _latest_artifact()
        if "ivfpq_plain_vs_residual" not in doc:
            pytest.skip("artifact predates the IVFPQ audit")
        row = doc["ivfpq_plain_vs_residual"]
        assert row["k"] == 3 and row["n_queries"] == 50
        assert 0.0 <= row["recall_residual"] <= 1.0
        assert 0.0 <= row["recall_plain"] <= 1.0
        # plain must also not exceed the flat-ADC ceiling (pruning only
        # removes candidates)
        assert row["recall_plain"] <= doc["pq_adc"]["mean_recall"] + 1e-9
