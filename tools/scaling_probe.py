"""Build 10× corpora and print measured growth ratios per operator family.

The reproducible artifact behind SCALE.md's "measured growth order"
section (tests/test_scaling_probe.py asserts the documents/embeddings
families in CI; this tool also covers the TPC-H and event families, which
are too slow for the suite). 10× corpora are deterministic perturbations:

- documents: 10 copies, copy-token appended (near-dup, not exact-dup)
- embeddings: 10 copies, dim-0 jitter per copy (cosine ~0.9999 clusters)
- orders/lineitem: 10 copies with disjoint orderkey ranges
- events: 10 copies with disjoint event_id/user_id ranges (same ts span)

Usage: python tools/scaling_probe.py [family ...]
Families: text, embeddings, tpch, events (default: all).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/samanvay_scaling_probe"
SCALE = 10


def _copy_table(dst: str, name: str) -> None:
    p = os.path.join(dst, f"{name}.parquet")
    s = os.path.join(SRC, f"{name}.parquet")
    if os.path.exists(p):
        return
    (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, p)


def build_text_corpora(spark, one_dir: str, ten_dir: str, scale: int = SCALE) -> None:
    """1x/10x documents tables — the SINGLE definition of the perturbation
    (copy-token appended so copies are near-duplicates, not exact ones);
    the pytest probe imports this so CI and the reproduction tool can
    never measure different corpora (review r6)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    docs.write.mode("overwrite").parquet(f"{one_dir}/documents.parquet")
    copies = spark.range(scale).select(F.col("id").alias("c"))
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("c") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copytok"), F.col("c").cast("string")).alias(
            "text"
        ),
        "lang",
        "source",
        (F.col("n_chars") + 9).alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{ten_dir}/documents.parquet")


def build_embedding_corpora(spark, one_dir: str, ten_dir: str, scale: int = SCALE) -> None:
    """1x/10x embeddings tables — dim-0 jitter per copy (cosine ~0.9999
    clusters, the adversarial dup-cluster shape for pair generators)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb.write.mode("overwrite").parquet(f"{one_dir}/embeddings.parquet")
    copies = spark.range(scale).select(F.col("id").alias("c"))
    emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("c") * 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x + F.when(i == 0, F.col("c") * 0.01).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{ten_dir}/embeddings.parquet")


def build_exact_dup_corpora(
    spark, one_dir: str, ten_dir: str, scale: int = SCALE, limit: int | None = None
) -> None:
    """1x/10x documents tables where the copies are EXACT (ids differ,
    text identical) — the mirror/boilerplate clique shape exact-first
    staging exists to collapse. The near-dup 10x build (copy-token) probes
    pair-generator growth; THIS one probes the staged composition's claim:
    containment_pairs(keep=exact winners) must see the 10x exact corpus
    as 1x work, because every 10-wide clique collapses to its winner
    before the quadratic self-join (VERDICT r8 #6)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    if limit is not None:
        docs = docs.filter(F.col("doc_id") < limit)
    docs.write.mode("overwrite").parquet(f"{one_dir}/documents.parquet")
    copies = spark.range(scale).select(F.col("id").alias("c"))
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("c") * 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{ten_dir}/documents.parquet")


def streamgate_times(
    spark, ten_dir: str, state_sizes: tuple[int, ...] = (1, 9)
) -> dict[int, float]:
    """Per-batch wall clock of the online near-dup admission gate
    (streaming/neardup.py) as accumulated state grows — the r14 probe
    behind SCALE.md's horizon_batches sizing rule.

    The 10x corpus's copy structure is the adversarial stream: batch i =
    copy i of every base doc (one 5k-doc micro-batch per copy), so EVERY
    probe-batch doc is a near-dup of one doc in EACH state batch — LSH
    candidates grow linearly in state, the worst case the gate admits.
    For each requested state size k, batches 0..k-1 are fed to a fresh
    sink and the SAME probe batch (copy 9) is timed as batch k. Returns
    {k: seconds}. Single definition shared with the CI floor
    (tests/test_scaling_probe.py) so they can never measure different
    streams."""
    import tempfile

    from pyspark.sql import functions as F

    from project_samanvay_a_true_hybrid_htap_database_spark.streaming.neardup import (
        neardup_admit_foreach_batch,
    )

    docs = spark.read.parquet(f"{ten_dir}/documents.parquet").select(
        "doc_id",
        F.col("text").alias("clean_text"),
        (F.col("doc_id") / 1_000_000).cast("int").alias("c"),
    )
    out: dict[int, float] = {}
    for k in state_sizes:
        d = tempfile.mkdtemp(prefix=f"streamgate_{k}_")
        fn = neardup_admit_foreach_batch(d)
        for i in range(k):
            fn(docs.filter(F.col("c") == i).drop("c"), i)
        probe = docs.filter(F.col("c") == 9).drop("c")
        t0 = time.perf_counter()
        fn(probe, k)
        out[k] = time.perf_counter() - t0
        shutil.rmtree(d, ignore_errors=True)
    return out


def staged_containment(spark, sf_dir: str):
    """containment_pairs composed in the production STAGED order: the
    exact-dedup winner allowlist lands before the pair self-join (the
    default composition pipeline_funnel / staged_dedup_report use)."""
    from project_samanvay_a_true_hybrid_htap_database_spark.operators import dedup

    winners = dedup.exact_dedup(spark, sf_dir).select("doc_id")
    return dedup.containment_pairs(spark, sf_dir, keep=winners)


def _build(spark) -> tuple[str, str]:
    from pyspark.sql import functions as F

    one, ten = os.path.join(ROOT, "sf1x"), os.path.join(ROOT, "sf10x")
    if os.path.exists(os.path.join(ten, "_READY")):
        return one, ten
    os.makedirs(one, exist_ok=True)
    os.makedirs(ten, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part"):
        _copy_table(one, t)
        _copy_table(ten, t)
    copies = spark.range(SCALE).select(F.col("id").alias("c"))

    build_text_corpora(spark, one, ten)
    build_embedding_corpora(spark, one, ten)

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    orders.write.mode("overwrite").parquet(f"{one}/orders.parquet")
    orders.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("c") * 100_000_000).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    ).write.mode("overwrite").parquet(f"{ten}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    li.write.mode("overwrite").parquet(f"{one}/lineitem.parquet")
    li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("c") * 100_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    ).write.mode("overwrite").parquet(f"{ten}/lineitem.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    ev.write.mode("overwrite").parquet(f"{one}/events.parquet")
    ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("c") * 100_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("c") * 10_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(f"{ten}/events.parquet")
    open(os.path.join(ten, "_READY"), "w").close()
    return one, ten


def _build_hundred(spark, table: str = "documents") -> str:
    """100x corpus for one table — the second measured decade for the
    output-bounded operators (the pair generators' quadratic OUTPUT
    contract is probed at 10x; re-running them at 100x only re-measures
    the 100-wide dup-clique output size). Same perturbation as the 10x
    build, scale=100."""
    hundred = os.path.join(ROOT, "sf100x")
    ready = os.path.join(hundred, f"_READY_{table}")
    if os.path.exists(ready):
        return hundred
    os.makedirs(hundred, exist_ok=True)
    scratch = os.path.join(ROOT, "sf1x_scratch100")
    builder = {
        "documents": build_text_corpora,
        "embeddings": build_embedding_corpora,
    }[table]
    builder(spark, scratch, hundred, scale=100)
    open(ready, "w").close()
    return hundred


def _probe(spark, name, fn, one, ten, hundred=None) -> None:
    def warm_time(d):
        # noop-sink materialization, NOT count(): count() lets Catalyst
        # prune every output-only column, so projection-heavy operators
        # (entropy sums, scrub reassembly, window ranks) measured a
        # gutted plan — dedup_segments_across_docs "ran" 500k docs in
        # 0.25 s before this fix. The noop sink computes every column
        # (the bench.py convention).
        def run(d_):
            fn(spark, d_).write.format("noop").mode("overwrite").save()

        run(d)
        t0 = time.perf_counter()
        run(d)
        return time.perf_counter() - t0

    t1, t10 = warm_time(one), warm_time(ten)
    line = f"{name:32s} 1x={t1:6.2f}s  10x={t10:7.2f}s  ratio={t10 / max(t1, 1e-3):5.1f}"
    if hundred is not None:
        t100 = warm_time(hundred)
        # decade2: growth across 10x->100x — ~10 is linear, ~100 quadratic
        line += (
            f"  100x={t100:7.2f}s  ratio={t100 / max(t1, 1e-3):6.1f}"
            f"  decade2={t100 / max(t10, 1e-3):5.1f}"
        )
    print(line)


def main() -> None:
    from project_samanvay_a_true_hybrid_htap_database_spark import get_spark
    from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
        analytics,
        dedup,
        sampling,
        similarity,
        text,
    )

    valid = {
        "text",
        "embeddings",
        "tpch",
        "events",
        "graph",
        "staged",
        "streamgate",
        "text100",
        "embeddings100",
    }
    families = set(sys.argv[1:]) or valid
    unknown = families - valid
    if unknown:
        sys.exit(
            f"unknown families: {sorted(unknown)} — valid: {sorted(valid)}"
        )
    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    one, ten = _build(spark)
    probes = {
        "text": [
            ("exact_dedup", dedup.exact_dedup),
            ("minhash_lsh_pairs", dedup.minhash_lsh_pairs),
            ("simhash_neardup_pairs_scale", dedup.simhash_neardup_pairs_scale),
            ("ngram_jaccard_pairs", dedup.ngram_jaccard_pairs),
            ("quality_filter_flags", text.quality_filter_flags),
            ("unigram_lm_score", text.unigram_lm_score),
            ("duplicate_span_report", dedup.duplicate_span_report),
            ("vocab_coverage", text.vocab_coverage),
            ("source_length_quantiles", text.source_length_quantiles),
            # r10 (VERDICT r9 #5): the full funnel — the most expensive
            # bench query, composing lang/quality/exact/near-dedup; its
            # stage 4 runs the staged pair graph over survivors, so the
            # 10x near-dup corpus must grow ~linearly, never clique-quadratically
            ("pipeline_funnel", sampling.pipeline_funnel),
            ("staged_dedup_report", dedup.staged_dedup_report),
            # r10 text-family additions
            ("pii_scrub_ner", text.pii_scrub_ner),
            ("temperature_resample", sampling.temperature_resample),
            ("decontaminate_bloom", dedup.decontaminate_bloom),
            ("dsir_importance_weights", sampling.dsir_importance_weights),
            # second r10 text wave (contrastive/leakage are pair-graph-
            # output-bound on this corpus — tool-only, like containment)
            ("bigram_lm_score", text.bigram_lm_score),
            ("winnowing_overlap_report", text.winnowing_overlap_report),
            ("curriculum_stages", sampling.curriculum_stages),
            ("token_budget_select", sampling.token_budget_select),
            ("contrastive_pairs", sampling.contrastive_pairs),
            ("leakage_safe_split", sampling.leakage_safe_split),
            # r11 segment-cleaning wave
            ("boilerplate_scrub", text.boilerplate_scrub),
            ("dedup_segments_within_doc", text.dedup_segments_within_doc),
            ("char_entropy_score", text.char_entropy_score),
            ("source_token_kl", text.source_token_kl),
            ("global_shuffle_order", sampling.global_shuffle_order),
            ("quality_classifier_score", text.quality_classifier_score),
            ("dedup_segments_across_docs", text.dedup_segments_across_docs),
            # r12 composed batch cleaning pipeline (quality -> scrub ->
            # 8-gram Bloom decontaminate -> fp dedup)
            ("pipeline_clean_corpus", sampling.pipeline_clean_corpus),
            ("training_export_plan", sampling.training_export_plan),
            # r13: the near-dup variant — adds the LSH stage's known
            # shuffles over survivors only (banded self-join + SMJ verify)
            (
                "pipeline_clean_corpus_neardup",
                sampling.pipeline_clean_corpus_neardup,
            ),
            # r14 BPE: histogram shuffle once, then vocab-bound rounds /
            # zero-shuffle corpus application
            ("bpe_learn_merges", text.bpe_learn_merges),
            ("bpe_segment_stats", text.bpe_segment_stats),
        ],
        "embeddings": [
            ("embedding_neardup_pairs_vectorized", dedup.embedding_neardup_pairs_vectorized),
            ("semdedup_stats", dedup.semdedup_stats),
            # r13 production form: learned-cluster blocking — the argmin
            # assignment is an in-scan literal expression, so the probe
            # measures the same blocked-pairs/CC growth under the quantizer
            # that actually ships
            ("semdedup_stats_ivf", dedup.semdedup_stats_ivf),
            ("ann_lsh_recall_audit", similarity.ann_lsh_recall_audit),
            ("ann_ivf_recall_audit", similarity.ann_ivf_recall_audit),
            # r10 vector-family additions
            ("decontaminate_semantic", dedup.decontaminate_semantic),
            ("ann_ivf_multiprobe_topk", similarity.ann_ivf_multiprobe_topk),
            # r10 PQ family: codebook training is index-build cost (memoized
            # per table identity), so the probe measures train+encode at 1x
            # vs 10x and the ADC serving scan separately
            ("pq_encode", similarity.pq_encode),
            ("ann_pq_adc_topk", similarity.ann_pq_adc_topk),
            ("ann_ivfpq_topk", similarity.ann_ivfpq_topk),
            ("ann_ivfpq_res_topk", similarity.ann_ivfpq_res_topk),
            ("ann_ivfpq_recall_audit", similarity.ann_ivfpq_recall_audit),
            ("ann_ivfpq_rerank_topk", similarity.ann_ivfpq_rerank_topk),
            # hard-negative mining: the cogroup-BLAS production form (the
            # spec HOF-join form shuffles anchors x list-width candidates
            # into one window — measured minutes at 10x; tool-only note)
            (
                "contrastive_hard_negatives_vec",
                sampling.contrastive_hard_negatives_vectorized,
            ),
            # r12 (VERDICT r11 #5): the same miner under the PRODUCTION
            # n_lists contract — 1x at the default 10 lists, 10x at 100
            # (n_lists scales with the corpus, the knn_join_ivf k=100
            # precedent), so list width stays ~constant and the ratio
            # measures anchors/output growth, not list bloat
            (
                "contrastive_hard_negs_vec_scaled_nlists",
                lambda s, d: sampling.contrastive_hard_negatives_vectorized(
                    s,
                    d,
                    # sqrt-scaled contract: 10 lists at 1x, 100 at 10x; match
                    # the decade token exactly ("10x" is a substring of
                    # "100x", so a membership test would mis-size decade 2)
                    n_clusters=(
                        100 if os.path.basename(d) == "sf10x" else 10
                    ),
                ),
            ),
            ("diversity_sample", sampling.diversity_sample),
        ],
        "tpch": [
            ("tpch_q1", analytics.tpch_q1_pricing_summary),
            ("tpch_q3", analytics.tpch_q3_shipping_priority),
            ("tpch_q8", analytics.tpch_q8_market_share),
            ("tpch_q18", analytics.tpch_q18_large_volume_customer),
            ("tpch_q21", analytics.tpch_q21_suppliers_kept_waiting),
        ],
        "events": [
            ("events_hourly_rollup", analytics.events_hourly_rollup),
            ("sessionize", analytics.sessionize),
            ("funnel_conversion", analytics.funnel_conversion),
            ("retention_cohorts", analytics.retention_cohorts),
            ("attribution_window_join", analytics.attribution_window_join),
        ],
        # VERDICT r6 #5: the previously unprobed pair-graph family — the
        # CC fixpoint over a 10× DENSER near-dup graph (copy-token copies
        # of every doc form 10-wide clusters), the cross-source inverted-
        # index self-join, and the df-capped containment index.
        "graph": [
            ("cross_source_overlap", dedup.cross_source_overlap),
            ("containment_pairs", dedup.containment_pairs),
            ("dedup_groups_lsh", dedup.dedup_groups_lsh),
            ("dedup_groups", dedup.dedup_groups),
            ("split_leakage_audit", sampling.split_leakage_audit),
            ("dedup_keep_best", dedup.dedup_keep_best),
        ],
    }
    for fam in ("text", "embeddings", "tpch", "events", "graph"):
        if fam not in families:
            continue
        print(f"-- {fam} --")
        for name, fn in probes[fam]:
            _probe(spark, name, fn, one, ten)
    if "staged" in families:
        # Exact-dup clique corpus: unstaged containment goes quadratic in
        # clique width (its contract); the staged form must measure the
        # 10x exact corpus as ~1x work AND emit the same pairs as 1x.
        print("-- staged (exact-dup cliques) --")
        e1 = os.path.join(ROOT, "exact1x")
        e10 = os.path.join(ROOT, "exact10x")
        if not os.path.exists(os.path.join(e10, "_READY")):
            os.makedirs(e1, exist_ok=True)
            os.makedirs(e10, exist_ok=True)
            build_exact_dup_corpora(spark, e1, e10)
            open(os.path.join(e10, "_READY"), "w").close()
        for name, fn in [
            ("containment_unstaged", dedup.containment_pairs),
            ("containment_staged", staged_containment),
        ]:
            _probe(spark, name, fn, e1, e10)
        n1 = dedup.containment_pairs(spark, e1).count()
        n10u = dedup.containment_pairs(spark, e10).count()
        n10s = staged_containment(spark, e10).count()
        print(
            f"containment pair rows: 1x={n1}  10x_unstaged={n10u} "
            f"({n10u / max(n1, 1):.0f}x)  10x_staged={n10s}"
        )
    if "streamgate" in families:
        # r14: per-batch cost of the online near-dup gate as state grows —
        # the measurement behind horizon_batches sizing (SCALE.md).
        print("-- streamgate (online near-dup admission gate) --")
        times = streamgate_times(spark, ten, state_sizes=(1, 9))
        t1, t9 = times[1], times[9]
        print(
            f"{'neardup_gate_probe_batch':32s} state=1b {t1:6.2f}s  "
            f"state=9b {t9:7.2f}s  ratio={t9 / max(t1, 1e-3):5.1f}"
        )
    if "text100" in families:
        # Second measured decade (1x/10x/100x documents) for the
        # OUTPUT-BOUNDED text operators: decade2 ≈ 10 is linear-in-corpus,
        # ≈ 100 quadratic. Pair generators are excluded — their 100x cost
        # is the documented quadratic dup-clique OUTPUT, not plan growth.
        print("-- text100 --")
        hundred = _build_hundred(spark)
        for name, fn in [
            ("exact_dedup", dedup.exact_dedup),
            ("minhash_signatures", dedup.minhash_signatures),
            ("quality_filter_flags", text.quality_filter_flags),
            ("unigram_lm_score", text.unigram_lm_score),
            ("duplicate_span_report", dedup.duplicate_span_report),
            ("vocab_coverage", text.vocab_coverage),
            ("source_length_quantiles", text.source_length_quantiles),
            # r11 closed-form scans + the cross-doc keep-first dedup
            ("char_entropy_score", text.char_entropy_score),
            ("dedup_segments_within_doc", text.dedup_segments_within_doc),
            ("quality_classifier_score", text.quality_classifier_score),
            ("dedup_segments_across_docs", text.dedup_segments_across_docs),
            # r12 composed capstones (buckets fixed at 64 in the probe:
            # the export's decade2 includes per-shard window growth that
            # production removes by scaling buckets with the corpus)
            ("pipeline_clean_corpus", sampling.pipeline_clean_corpus),
            ("training_export_plan", sampling.training_export_plan),
        ]:
            _probe(spark, name, fn, one, ten, hundred)
    if "embeddings100" in families:
        # Second decade for the linear/bounded vector operators (pair
        # generators excluded for the same output-contract reason).
        print("-- embeddings100 --")
        hundred = _build_hundred(spark, "embeddings")
        for name, fn in [
            ("embedding_quantize", similarity.embedding_quantize),
            ("embedding_random_projection", similarity.embedding_random_projection),
            ("embedding_centroids", similarity.embedding_centroids),
            ("kmeans_assign", similarity.kmeans_assign),
            ("ann_bruteforce_topk", similarity.ann_bruteforce_topk),
            ("semantic_outliers", similarity.semantic_outliers),
        ]:
            _probe(spark, name, fn, one, ten, hundred)
    if "graph" in families:
        # CC convergence depth: rounds grow with component DIAMETER, not
        # corpus size — near-dup clusters are cliques-ish, so a 10× denser
        # graph should converge in the same few rounds.
        for d, label in ((one, "1x"), (ten, "10x")):
            stats: dict = {}
            pairs = dedup.minhash_lsh_pairs(spark, d).select("d1", "d2")
            dedup.connected_components(pairs, stats=stats).count()
            print(f"cc_iterations({label}) = {stats['iters']}")


if __name__ == "__main__":
    main()
