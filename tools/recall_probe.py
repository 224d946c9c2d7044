"""Run the quantizer recall audits and persist the figures (VERDICT r8
ADVICE: recall numbers cited in prose must trace to a committed artifact).

Writes RECALL_r{N}.json at the repo root: one entry per audit, each the
audit's single output row verbatim. Every number in SCALE.md / docstrings
about quantizer recall must cite this file; tests/test_recall_artifact.py
asserts the committed artifact matches a live re-derivation so it cannot
go stale silently.

Usage:
    python tools/recall_probe.py [sf_dir] [round_tag]
    # defaults: /root/testdata/sf0.01, r09
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDITS = [
    # (key, module attr, kwargs) — each returns a 1-row DataFrame of
    # recall figures
    ("label_blocking", "ann_recall_audit", {}),
    # r13 (VERDICT r12 #5): the learned-IVF kNN JOIN at the same k —
    # the head-to-head row that backs the "don't use label blocking"
    # docstring verdicts on knn_join_blocked / embedding_neardup_pairs
    ("learned_ivf_join", "knn_join_ivf_recall_audit", {}),
    ("sign_lsh", "ann_lsh_recall_audit", {}),
    ("learned_ivf", "ann_ivf_recall_audit", {}),
    # the nprobe curve beyond the registered default (VERDICT r9 #8):
    # the measured basis for whether knn_join_ivf_* should probe deeper
    ("learned_ivf_deep", "ann_ivf_recall_audit", {"nprobes": (3, 4)}),
    # r10: exhaustive-ADC recall of the product quantizer at the registered
    # m (16) plus the compression curve — the measured basis for the
    # PQ_M default and the docstring's m-vs-recall tradeoff figures
    ("pq_adc", "ann_pq_recall_audit", {}),
    ("pq_adc_m4", "ann_pq_recall_audit", {"m": 4}),
    ("pq_adc_m8", "ann_pq_recall_audit", {"m": 8}),
    ("pq_adc_m32", "ann_pq_recall_audit", {"m": 32}),
    # r10: the full IVF-PQ serving pipeline (pruning + quantization), plain
    # vs residual encoding at the same code budget — the measured basis for
    # keeping plain PQ as the serving default on this corpus
    ("ivfpq_plain_vs_residual", "ann_ivfpq_recall_audit", {}),
    # r12 (VERDICT r11 #7): the same plain-vs-residual comparison one
    # probe deeper — if residual still loses at nprobe=4, the "plain +
    # rerank is the serving default, residual is experimental" verdict
    # is backed at two operating points, not one
    ("ivfpq_plain_vs_residual_np4", "ann_ivfpq_recall_audit", {"nprobe": 4}),
    # r11 (VERDICT r10 #8): the rerank curve — ADC shortlist sizes 1x/5x/
    # 10x of k against the nprobe pruning ceiling; the measured basis for
    # adopting ann_ivfpq_rerank_topk (recall recovers to ~the ceiling)
    ("ivfpq_rerank", "ann_ivfpq_rerank_recall_audit", {}),
]


def run(sf_dir: str) -> dict:
    from project_samanvay_a_true_hybrid_htap_database_spark import get_spark
    from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
        similarity,
    )

    spark = get_spark(app_name="recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}
    for key, attr, kwargs in AUDITS:
        row = getattr(similarity, attr)(spark, sf_dir, **kwargs).head().asDict()
        out[key] = {k: (float(v) if isinstance(v, float) else v) for k, v in row.items()}
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r09"
    doc = run(sf_dir)
    path = os.path.join(REPO, f"RECALL_{tag}.json")
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(doc, sort_keys=True))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
