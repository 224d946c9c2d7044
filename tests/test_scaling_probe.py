"""Measured scaling proof for the corpus operators (round-6 follow-on to
the skew/data-skipping measurement pattern: green rows prove correctness,
these prove the SHAPE).

The question the 100 TB design hangs on is growth order: an operator whose
docstring says "bucketed, not all-pairs" should scale ~linearly in the
corpus, and one hiding an accidental all-pairs join would go quadratic.
This probe builds a 10× corpus (the sf0.1 documents table replicated with
deterministic perturbations so near-dup structure — NOT exact duplication —
is preserved) and measures warm wall-clock at 1× vs 10×. The assertion is
deliberately loose (10× data may cost up to 35×: constant factors,
scheduling, and the df-capped index shifting are all allowed) — a
quadratic operator costs ~100× and fails it with a wide margin, which is
exactly the regression this guards against (e.g. the LSH banding or the
df-cap silently dropping out of the pair generators).

Runtime: ~1 min total on local[8]; the 10× corpus is 50k docs.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
    dedup,
    sampling,
    text,
)

SCALE = 10
MAX_RATIO = 35.0  # linear ≈ 10, quadratic ≈ 100


@pytest.fixture(scope="module")
def scaled_dirs(spark, tmp_path_factory):
    """1× = sf0.1 re-written locally (identical parquet layout both
    sides); 10× = deterministic near-dup perturbations. Corpus
    construction lives in tools/scaling_probe.py (build_text_corpora /
    build_embedding_corpora) so this assertion and the documented
    reproduction tool can never measure different corpora."""
    from tools.scaling_probe import build_embedding_corpora, build_text_corpora

    root = tmp_path_factory.mktemp("scaling")
    one_dir = str(root / "sf1x")
    ten_dir = str(root / "sf10x")
    os.makedirs(one_dir, exist_ok=True)
    os.makedirs(ten_dir, exist_ok=True)
    build_text_corpora(spark, one_dir, ten_dir)
    build_embedding_corpora(spark, one_dir, ten_dir)
    return one_dir, ten_dir


def _warm_time(fn, spark, sf_dir):
    # noop-sink materialization, NOT count(): count() lets Catalyst prune
    # output-only columns, so projection-heavy operators measured a gutted
    # plan (see tools/scaling_probe.py warm_time — same fix).
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


@pytest.mark.parametrize(
    "name,fn",
    [
        ("exact_dedup", dedup.exact_dedup),
        ("minhash_lsh_pairs", dedup.minhash_lsh_pairs),
        # dup clusters collapse fingerprint chunks into shared buckets;
        # without the occupancy cap this OOM'd at 10x (315M candidates
        # from one 10,117-doc bucket)
        ("simhash_neardup_pairs_scale", dedup.simhash_neardup_pairs_scale),
        ("quality_filter_flags", text.quality_filter_flags),
        ("unigram_lm_score", text.unigram_lm_score),
        # the HOF pair generator measured 51x here; the BLAS twin that
        # semdedup now uses holds ~1.4x
        ("semdedup_stats", dedup.semdedup_stats),
        # r7 probe additions (VERDICT r6 #5): the distinct-(source,shingle)
        # inverted self-join held 1.7x at 10x; LSH-pairs -> CC held 3.2x.
        # (containment_pairs and exact-graph dedup_groups live in the tool
        # only: containment's OUTPUT is Θ(Σ cluster²) — 512 -> 501k pairs
        # at 10x — so its wall ratio measures result size, not plan shape.)
        ("cross_source_overlap", dedup.cross_source_overlap),
        ("dedup_groups_lsh", dedup.dedup_groups_lsh),
        # r10 (VERDICT r9 #5): the full cleaning funnel and its sibling
        # report — the most expensive bench query, composing four families;
        # stage 4's staged pair graph over survivors measured ~1.0x at 10x
        # min-of-3 (the steady-state repeated-invocation shape the bench
        # loop sees, keep-path persist reuse included)
        ("pipeline_funnel", sampling.pipeline_funnel),
        ("staged_dedup_report", dedup.staged_dedup_report),
        # r10: the NER model pass must stay linear in the corpus
        # (measured 5.0x at 10x — Python loop cost, Arrow-batched), and
        # the eval-broadcast decontamination linear-in-train (0.8x)
        ("pii_scrub_ner", text.pii_scrub_ner),
        # decontaminate_semantic is probed separately below: its id-split
        # eval stand-in grows WITH the corpus, so the raw ratio here is
        # train x eval growth (~40x at 10x post-harness-fix), not plan
        # shape — production eval sets are fixed-size benchmarks.
        # r10: the fixed-memory Bloom probe is bit arithmetic in the scan
        # (measured 1.0x at 10x) and DSIR is two token-stream scans against
        # fixed 1024-bucket histograms (measured 4.7x at 10x min-of-3 —
        # linear token volume; the PQ serving ops hold ~0.9x and live in
        # the tool's embeddings family, index-build amortized)
        ("decontaminate_bloom", dedup.decontaminate_bloom),
        ("dsir_importance_weights", sampling.dsir_importance_weights),
        # second r10 wave: bigram CE 6.9x (bigram volume), winnowing
        # overlap 4.7x (window-min form — the all-HOF form measured 110 s
        # at 1x from CollapseProject inlining, see the docstring),
        # curriculum 10.6x (CE underneath), budget select 0.7x (floor).
        # contrastive_pairs (23.6x) and leakage_safe_split (14.9x) live in
        # the tool only: both ride the exact pair graph, whose OUTPUT on
        # the 10-wide-clique corpus grows ~45x per cluster — their wall
        # ratios measure result size, not plan shape (the containment /
        # dedup_groups precedent).
        ("bigram_lm_score", text.bigram_lm_score),
        ("winnowing_overlap_report", text.winnowing_overlap_report),
        ("curriculum_stages", sampling.curriculum_stages),
        ("token_budget_select", sampling.token_budget_select),
        # r11 segment-cleaning wave: the two scrub ops are zero-shuffle
        # closed forms inside the scan (plan-asserted), boilerplate adds
        # one (source,segment) aggregate + broadcast; entropy/KL are
        # single-scan closed forms / bounded rollups. All corpus-linear
        # by construction — the probe pins it.
        ("boilerplate_scrub", text.boilerplate_scrub),
        ("dedup_segments_within_doc", text.dedup_segments_within_doc),
        ("char_entropy_score", text.char_entropy_score),
        ("source_token_kl", text.source_token_kl),
        ("global_shuffle_order", sampling.global_shuffle_order),
        ("quality_classifier_score", text.quality_classifier_score),
        # cross-doc keep-first segment dedup: two linear key-balanced
        # shuffles (segment min-reduce + doc reassembly), output corpus-
        # sized — CI-floorable unlike the pair-graph family
        ("dedup_segments_across_docs", text.dedup_segments_across_docs),
        # r12 composed batch cleaning pipeline: scan-stage gates + one
        # fp-keyed aggregate; every stage individually linear, the
        # composition must stay so
        ("pipeline_clean_corpus", sampling.pipeline_clean_corpus),
        # r12 output-side capstone: the cleaned manifest + one bucket-
        # keyed window + a (bucket, bin) partial agg — linear on top of
        # the pipeline
        ("training_export_plan", sampling.training_export_plan),
        # r13 near-dup variant: the LSH stage's banded self-join + SMJ
        # verify over SURVIVORS only, then diameter-bounded CC — each
        # piece individually probed; the composition must stay linear-ish
        (
            "pipeline_clean_corpus_neardup",
            sampling.pipeline_clean_corpus_neardup,
        ),
        # r14 BPE: learning is vocab-bound after the one histogram
        # shuffle (measured 1.0x at 10x), application is a zero-shuffle
        # corpus scan (2.7x at 10x) — both must stay corpus-linear-ish
        ("bpe_learn_merges", text.bpe_learn_merges),
        ("bpe_segment_stats", text.bpe_segment_stats),
    ],
)
def test_corpus_operator_scales_subquadratically(spark, scaled_dirs, name, fn):
    one_dir, ten_dir = scaled_dirs
    t1 = _warm_time(fn, spark, one_dir)
    t10 = _warm_time(fn, spark, ten_dir)
    # floor the denominator at 0.5 s: several 1x runs are fixed-overhead
    # dominated (~0.1-0.3 s from ONE sample), and a momentarily-quiet 1x
    # against a noisy 10x would otherwise fail the ratio bound with no
    # real regression (review r6). With the floor, failure requires the
    # 10x run to exceed 17.5 s — plan-shape territory, not jitter.
    ratio = t10 / max(t1, 0.5)
    if ratio >= MAX_RATIO:
        # retry the 10x side once before failing: late in the full suite
        # the session carries dozens of persisted tables and the single
        # 10x sample can double under that cache pressure (r13:
        # boilerplate_scrub read 36.4x in-suite vs 9.1x standalone, file
        # unchanged). A REAL growth-order regression reproduces on the
        # second sample; a pressure spike does not.
        t10 = min(t10, _warm_time(fn, spark, ten_dir))
        ratio = t10 / max(t1, 0.5)
    assert ratio < MAX_RATIO, (
        f"{name}: 10x corpus cost {ratio:.1f}x the 1x run "
        f"({t1:.2f}s -> {t10:.2f}s) — growth order regressed"
    )


@pytest.mark.parametrize(
    "name,fn",
    [
        ("contrastive_pairs", sampling.contrastive_pairs),
        # leakage_safe_split is NOT here: its output is doc-sized while
        # its cost driver is the pair graph, so per-OUTPUT-row is the
        # wrong anchor — it has its own per-EDGE test below (r11 #1).
        # contrastive_hard_negatives is NOT here: its per-anchor cost is
        # the probed-list width (grows with corpus at fixed n_lists), so
        # neither raw-ratio nor per-row-flat is its invariant — exactly
        # the kNN-join situation, and like the kNN joins it is probed in
        # the tool (embeddings family, vectorized form) with the
        # k-scaling discipline documented in its docstring.
    ],
)
def test_output_bound_operator_per_row_cost_stays_flat(
    spark, scaled_dirs, name, fn
):
    """VERDICT r10 #7: the operator consumes the exact pair graph, whose
    OUTPUT on the 10-wide-clique probe corpus grows ~45x per cluster, so
    its raw wall ratio (23.6x in the tool) measures result size, not
    plan shape — a raw MAX_RATIO bound would be either vacuous or flaky.
    The CI-floorable invariant is per-OUTPUT-row cost (valid here
    because the output IS pair-graph-sized): time per emitted row must
    stay ~flat from 1x to 10x (a plan that went quadratic BEYOND its
    output — e.g. the negative-draw bucket join degrading to
    anchor x corpus — blows this immediately)."""
    one_dir, ten_dir = scaled_dirs
    fn(spark, one_dir).count()  # warm: JIT, codegen, file listing
    t0 = time.perf_counter()
    rows1 = fn(spark, one_dir).count()
    t1 = time.perf_counter() - t0
    fn(spark, ten_dir).count()
    t0 = time.perf_counter()
    rows10 = fn(spark, ten_dir).count()
    t10 = time.perf_counter() - t0
    assert rows1 > 0 and rows10 > rows1, (name, rows1, rows10)
    # same 0.5 s denominator floor rationale as the raw-ratio test
    per_row = (t10 / max(t1, 0.5)) / max(rows10 / rows1, 1.0)
    assert per_row < 3.5, (
        f"{name}: per-output-row cost grew {per_row:.2f}x at 10x "
        f"({t1:.2f}s/{rows1} rows -> {t10:.2f}s/{rows10} rows)"
    )


def test_leakage_safe_split_per_edge_cost_stays_flat(spark, scaled_dirs):
    """VERDICT r11 #1 re-anchor: leakage_safe_split's OUTPUT is doc-sized
    (grows 10x) while its dominant cost is the exact pair graph + CC it
    consumes (dedup_groups over ngram_jaccard_pairs, sampling.py), which
    grows ~45x per cluster on the clique probe corpus — so the old
    per-OUTPUT-row floor encoded upstream-vs-output mismatch (~4.5x is
    the EXPECTED value for the correct plan) and only cleared when the
    warm-up's cached pair graph survived into the timed run; under a 13k-
    stage full-suite session eviction recomputed the graph and the gate
    failed while passing in isolation. The honest CI-floorable invariant
    is per-pair-graph-EDGE cost: time divided by the edge count of the
    graph it consumes stays ~flat at 10x whether or not the upstream is
    cached, because the recompute itself scales with the edges. A plan
    regression BEYOND the pair graph (e.g. the representative join
    degrading to doc x corpus, or the CC loop snowballing lineage) still
    blows the floor immediately."""
    one_dir, ten_dir = scaled_dirs
    edges1 = dedup.ngram_jaccard_pairs(spark, one_dir).count()
    edges10 = dedup.ngram_jaccard_pairs(spark, ten_dir).count()
    assert edges1 > 0 and edges10 > edges1, (edges1, edges10)

    fn = sampling.leakage_safe_split
    fn(spark, one_dir).count()  # warm: JIT, codegen, file listing
    t0 = time.perf_counter()
    fn(spark, one_dir).count()
    t1 = time.perf_counter() - t0
    fn(spark, ten_dir).count()
    t0 = time.perf_counter()
    fn(spark, ten_dir).count()
    t10 = time.perf_counter() - t0
    # same 0.5 s denominator floor rationale as the raw-ratio test
    per_edge = (t10 / max(t1, 0.5)) / max(edges10 / edges1, 1.0)
    assert per_edge < 3.5, (
        f"leakage_safe_split: per-pair-graph-edge cost grew "
        f"{per_edge:.2f}x at 10x ({t1:.2f}s/{edges1} edges -> "
        f"{t10:.2f}s/{edges10} edges)"
    )


def test_hard_negatives_per_row_cost_flat_at_scaled_n_lists(
    spark, scaled_dirs
):
    """VERDICT r11 #5: contrastive_hard_negatives_vectorized's fixed-k
    probe (14.3x at 10x, SCALE.md) compounds pair-graph output growth
    with probed-list width — at FIXED n_lists the lists themselves grow
    10x, which is NOT the production contract (n_lists scales with the
    corpus, k ~ sqrt(N); the knn_join_ivf_vectorized precedent). Probe
    the contract directly: 1x at the default 10 lists vs 10x at 100
    lists keeps list width ~constant, so cost ~ anchors ~ output rows
    and the CI-floorable invariant is per-OUTPUT-row cost ~flat. A
    regression that shuffles the candidate set or degrades the cogroup
    to anchors x corpus blows the floor regardless of n_lists."""
    one_dir, ten_dir = scaled_dirs
    fn1 = lambda s, d: sampling.contrastive_hard_negatives_vectorized(  # noqa: E731
        s, d
    )
    fn10 = lambda s, d: sampling.contrastive_hard_negatives_vectorized(  # noqa: E731
        s, d, n_clusters=100
    )
    fn1(spark, one_dir).count()  # warm: JIT, codegen, quantizer memo
    t0 = time.perf_counter()
    rows1 = fn1(spark, one_dir).count()
    t1 = time.perf_counter() - t0
    fn10(spark, ten_dir).count()
    t0 = time.perf_counter()
    rows10 = fn10(spark, ten_dir).count()
    t10 = time.perf_counter() - t0
    assert rows1 > 0 and rows10 > rows1, (rows1, rows10)
    # same 0.5 s denominator floor rationale as the raw-ratio test
    per_row = (t10 / max(t1, 0.5)) / max(rows10 / rows1, 1.0)
    assert per_row < 3.5, (
        f"contrastive_hard_negatives_vectorized: per-output-row cost at "
        f"scaled n_lists grew {per_row:.2f}x ({t1:.2f}s/{rows1} rows -> "
        f"{t10:.2f}s/{rows10} rows)"
    )


def test_semantic_decontamination_linear_in_train_at_fixed_eval(
    spark, scaled_dirs
):
    """The operator's documented contract is linear-in-train at a FIXED
    eval set (eval suites are MBs at 100 TB; cost = train x eval x dim).
    The id-split stand-in grows the eval side with the corpus, so the
    plain raw-ratio probe measures eval growth. Hold the eval COUNT
    fixed by scaling eval_mod with the corpus (100 -> 1000 at 10x): the
    run must then scale ~linearly in train."""
    one_dir, ten_dir = scaled_dirs
    t1 = _warm_time(
        lambda s, d: dedup.decontaminate_semantic(s, d, eval_mod=100),
        spark,
        one_dir,
    )
    t10 = _warm_time(
        lambda s, d: dedup.decontaminate_semantic(s, d, eval_mod=1000),
        spark,
        ten_dir,
    )
    ratio = t10 / max(t1, 0.5)
    assert ratio < MAX_RATIO, (
        f"decontaminate_semantic (fixed eval): {ratio:.1f}x "
        f"({t1:.2f}s -> {t10:.2f}s)"
    )


def test_lsh_recall_floor_at_10x(spark, scaled_dirs):
    """The r7 observability operator turned into a guarded number
    (VERDICT r7 #7): measured recall of the (4 bands × 4 rows) LSH config
    against exact n-gram-Jaccard ground truth on the 10× corpus. Measured
    r8: recall 0.9919 (248,571 of 250,600 true pairs), precision 1.0.
    The floor at 0.97 catches a banding/tuning regression (e.g. fewer
    effective bands, a band-key bug, or a cap silently dropping buckets)
    while leaving room for corpus-perturbation variance. Precision is an
    INVARIANT, not a measurement — every LSH candidate is verified with
    the same exact-Jaccard predicate, so any precision < 1.0 means the
    verify step itself broke."""
    _one_dir, ten_dir = scaled_dirs
    row = dedup.lsh_recall_audit(spark, ten_dir).collect()[0]
    assert row["n_exact_pairs"] > 100_000, row  # corpus sanity
    assert row["precision"] == 1.0, row.asDict()
    assert row["recall"] >= 0.97, row.asDict()


def test_cc_convergence_depth_stays_bounded(spark, scaled_dirs):
    """Connected-components rounds grow with component DIAMETER, not
    corpus size: the 10× corpus's near-dup clusters are 10-wide
    near-cliques, so min-label propagation must converge in a handful of
    rounds either way (measured 2 rounds at 1×, 4 at 10×). A regression
    to O(component size) rounds — e.g. chain-shaped propagation — would
    blow past this immediately at web scale, where max_iters truncation
    silently mislabels components."""
    one_dir, ten_dir = scaled_dirs
    for d, bound in ((one_dir, 6), (ten_dir, 8)):
        stats: dict = {}
        pairs = dedup.minhash_lsh_pairs(spark, d).select("d1", "d2")
        dedup.connected_components(pairs, stats=stats).count()
        assert 1 <= stats["iters"] <= bound, (
            f"CC took {stats['iters']} rounds on {d} (bound {bound})"
        )


def test_staged_containment_collapses_exact_cliques(spark, tmp_path):
    """The staged (exact-first) composition's central claim, measured on
    the clique shape it targets (VERDICT r8 #6): on a corpus of 10-wide
    EXACT-duplicate cliques, unstaged containment_pairs emits the
    quadratic directed-pair blowup (every clique member contains every
    other — ~90 pairs per clique), while the staged form — the default
    composition in pipeline_funnel / staged_dedup_report — collapses each
    clique to its winner BEFORE the pair self-join and must emit exactly
    the 1x corpus's pairs. Row counts, not wall-clock: the blowup IS the
    output, and counts cannot be jitter.

    Corpus: a 500-doc slice x 10 exact copies (build_exact_dup_corpora,
    the same builder tools/scaling_probe.py measures the full corpus
    with), small enough that the quadratic side stays CI-cheap."""
    from tools.scaling_probe import build_exact_dup_corpora, staged_containment

    one_dir = str(tmp_path / "exact1x")
    ten_dir = str(tmp_path / "exact10x")
    os.makedirs(one_dir, exist_ok=True)
    os.makedirs(ten_dir, exist_ok=True)
    build_exact_dup_corpora(spark, one_dir, ten_dir, limit=500)

    n1_staged = staged_containment(spark, one_dir).count()
    n10_unstaged = dedup.containment_pairs(spark, ten_dir).count()
    n10_staged = staged_containment(spark, ten_dir).count()

    # the staged default path sees the 10x exact corpus as 1x work: the
    # 10x winners are exactly the 1x winners (min doc_id per content hash
    # lands on the original slice), so the pair set is IDENTICAL.
    # (Compared staged-to-staged: the raw 1x corpus carries a few exact
    # dups of its own, which staging also collapses.)
    assert n10_staged == n1_staged, (n1_staged, n10_staged)
    # and the hazard it removes is real on this corpus: every 10-wide
    # clique contributes 10*9 directed pairs unstaged (500 cliques)
    assert n10_unstaged >= 500 * 90, n10_unstaged


def test_streamgate_per_batch_cost_flat_in_state(spark, scaled_dirs):
    """r14: the online near-dup gate's per-batch cost must not grow
    linearly with accumulated state (the regression would be re-verifying
    all seen pairs instead of LSH-bucketed candidates, or dragging the
    full shingle table through the bucket join). The shared probe feeds
    k state batches and times the SAME probe batch; at 5x state a
    state-linear gate costs ~5x, the floor allows 4x (constants +
    wall-clock noise; measured 0.9x at 9x state, SCALE.md)."""
    from tools.scaling_probe import streamgate_times

    _, ten_dir = scaled_dirs
    times = streamgate_times(spark, ten_dir, state_sizes=(1, 5))
    ratio = times[5] / max(times[1], 1e-3)
    assert ratio < 4.0, (
        f"gate probe batch went {ratio:.1f}x from 1-batch to 5-batch "
        f"state ({times[1]:.1f}s -> {times[5]:.1f}s) — per-batch cost "
        f"must stay ~flat in accumulated state"
    )
