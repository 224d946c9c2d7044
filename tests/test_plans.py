"""Physical-plan audits: assert the Catalyst plan shapes the 100 TB design
depends on — parquet filter pushdown, column pruning, broadcast joins for
dims, TakeOrderedAndProject for top-k, whole-stage codegen, and no Python
eval in JVM-only operators. A regression here (a filter that stops pushing,
a broadcast that silently becomes a shuffle join) changes nothing at test SF
but is the difference between hours and minutes at scale.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
    analytics,
    dedup,
    relational,
    similarity,
    text,
)

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def plans(spark):
    """One plan string per audited query (compiled once, no execution)."""
    qs = entrymod.queries()
    names = [
        "tpch_q1",
        "tpch_q6",
        "revenue_by_nation",
        "top_orders",
        "point_lookup",
        "token_counts",
        "exact_dedup",
        "minhash_lsh_pairs",
        "simhash_neardup_pairs",
        "knn_join_blocked",
        "lang_id",
        "asof_join_events_orders",
        "tpch_q3",
        "interval_overlap_join",
        "semdedup_stats",
    ]
    return {n: plan(qs[n](spark, SF_DIR)) for n in names}


class TestFilterPushdown:
    def test_tpch_q1_date_filter_reaches_scan(self, plans):
        p = plans["tpch_q1"]
        assert "PushedFilters" in p
        assert "l_shipdate" in p.split("PushedFilters")[1][:200]

    def test_tpch_q6_all_predicates_push(self, plans):
        pushed = plans["tpch_q6"].split("PushedFilters")[1][:400]
        for col in ("l_shipdate", "l_discount", "l_quantity"):
            assert col in pushed, f"{col} not pushed to parquet scan"

    def test_point_lookup_pushes_equality(self, plans):
        pushed = plans["point_lookup"].split("PushedFilters")[1][:200]
        assert "IsNotNull" in pushed or "EqualTo" in pushed


class TestColumnPruning:
    def test_token_counts_reads_two_columns(self, plans):
        # ReadSchema on the documents scan must not include unused columns
        p = plans["token_counts"]
        read = p.split("ReadSchema")[1][:250]
        assert "doc_id" in read and "text" in read
        assert "source" not in read and "lang" not in read

    def test_tpch_q6_prunes_to_needed_columns(self, plans):
        read = plans["tpch_q6"].split("ReadSchema")[1][:400]
        assert "l_extendedprice" in read
        assert "l_returnflag" not in read and "l_orderkey" not in read


class TestJoinStrategy:
    def test_revenue_by_nation_broadcasts_all_dims(self, plans):
        # formatted mode lists each operator in tree + detail section; count
        # the detail entries "(N) BroadcastHashJoin"
        import re

        n = len(re.findall(r"\(\d+\) BroadcastHashJoin", plans["revenue_by_nation"]))
        assert n == 3
        assert "SortMergeJoin" not in plans["revenue_by_nation"]

    def test_tpch_q3_broadcasts_filtered_customer(self, plans):
        assert "BroadcastHashJoin" in plans["tpch_q3"]

    def test_asof_join_collapses_history_before_join(self, plans):
        # state-table shape: orders aggregate to one row per customer
        # (collect_list) BEFORE the join — no per-event fan-out, no window
        p = plans["asof_join_events_orders"]
        assert "collect_list" in p and "Join" in p
        assert "Window" not in p


class TestTopK:
    def test_top_orders_avoids_global_sort(self, plans):
        assert "TakeOrderedAndProject" in plans["top_orders"]

    def test_tpch_q3_topk(self, plans):
        assert "TakeOrderedAndProject" in plans["tpch_q3"]


class TestCodegenAndNoPython:
    @pytest.mark.parametrize(
        "name",
        [
            "tpch_q1",
            "revenue_by_nation",
            "exact_dedup",
            "minhash_lsh_pairs",
            "simhash_neardup_pairs",
            "knn_join_blocked",
            "lang_id",
            "token_counts",
        ],
    )
    def test_no_python_eval_in_jvm_operators(self, plans, name):
        p = plans[name]
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
            f"{name} fell back to Python row evaluation"
        )

    def test_whole_stage_codegen_spans_exist(self, spark):
        # AQE hides codegen markers until the final plan; plan once with AQE
        # off to assert the stages fuse (`*(N)` prefix in simple mode).
        qs = entrymod.queries()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            for name in ("tpch_q1", "tpch_q6", "revenue_by_nation"):
                df = qs[name](spark, SF_DIR)
                p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "simple"
                )
                assert "*(" in p, f"{name} has no whole-stage codegen span"
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")


class TestSpanReportSinglePass:
    def test_one_scan_no_join_back(self, spark):
        """duplicate_span_report must tokenize the corpus exactly once:
        the dup flag comes from a window over the reduced (hash, source)
        count table, NOT an equi-join of two corpus-sized span streams
        (the shape this replaced ran the explode+md5 twice)."""
        p = plan(
            entrymod.queries()["duplicate_span_report"](spark, SF_DIR)
        )
        tree = p.split("\n\n")[0]  # formatted explain repeats nodes below
        assert tree.count("Scan parquet") == 1, "corpus scanned more than once"
        assert tree.count("Generate") == 1, "span explode ran more than once"
        assert "Join" not in tree, "span stream joined back instead of windowed"


class TestMinhashVerifyFloor:
    def test_verify_joins_are_smj_and_no_corpus_broadcast(self, spark):
        """VERDICT r8 #5: pin the verify-join shape instead of chasing the
        sf0.1 wall-clock (the ~1 s floor is two exchange+sort stage
        round-trips that amortize at scale — SCALE.md's measured
        breakdown). BOTH verify joins must be SortMergeJoin: each side
        (candidates AND the hashed-shingle table) grows with the corpus,
        and a persisted in-memory shingle table under-reports its size to
        the auto-broadcast planner — the 10× probe reproduced the driver
        OOM when the merge hint was dropped. The only broadcast allowed
        is the band-bucket self-join's tiny signature side; the exchange
        count is pinned so a rewrite cannot silently add stage
        round-trips back."""
        # Compile against a COLD cache: a warm InMemoryRelation (left by
        # any earlier test that executed minhash) re-renders its own
        # definition — scans, exchanges and all — inline in the formatted
        # plan, inflating raw node counts (20-32 observed) with copies
        # that execute zero times. The pin is about the plan's real
        # stages, so measure the cold compile.
        spark.catalog.clearCache()
        tree = plan(entrymod.queries()["minhash_lsh_pairs"](spark, SF_DIR)).split(
            "\n\n"
        )[0]
        assert tree.count("SortMergeJoin") == 2, (
            "verify joins lost the SMJ shape (merge hint dropped?)"
        )
        assert tree.count("BroadcastExchange") <= 1, (
            "a corpus-sized side is being broadcast — the measured 10× "
            "OOM hazard"
        )
        assert tree.count("Exchange") <= 9, (
            f"exchange count grew to {tree.count('Exchange')} (was 12 "
            "pre-r15; the r15 pass dropped the signature groupBy — now a "
            "per-row fold — and merged the candidate distinct into the "
            "d1 verify partitioning) — a stage round-trip crept back "
            "into the verify path"
        )
        assert "InMemoryRelation" in tree, (
            "the shared shingle persist was dropped (second corpus scan)"
        )


class TestNoCartesian:
    @pytest.mark.parametrize(
        "name",
        [
            "minhash_lsh_pairs",
            "simhash_neardup_pairs",
            "knn_join_blocked",
            "semdedup_stats",
        ],
    )
    def test_pair_generators_never_cartesian(self, plans, name):
        assert "CartesianProduct" not in plans[name], (
            f"{name} degenerated into a cartesian product"
        )


class TestNoPresentationalSort:
    """VERDICT r3 #3: unbounded (corpus-sized) outputs must not end in a
    presentational global sort — at 100 TB that's a full range-shuffle of
    the entire result that no consumer needs (both correctness gates
    compare order-insensitively). A global Sort compiles to an Exchange
    rangepartitioning; the per-doc rank windows only need hash exchanges,
    so rangepartitioning in the plan is exactly the regression signature."""

    @pytest.mark.parametrize(
        "name",
        [
            "tfidf_keywords",
            "kmeans_assign",
            "embedding_quantize",
            "multimodal_resize",
            "chunk_documents",
            "quality_filter_flags",
            "unigram_lm_score",
            "dedup_groups",
            "attribution_window_join",
            "hash_sample",
            "decontaminate_ngram_overlap",
            "pack_sequences",
            # pair-sized output (quadratic in dup-cluster width — the 10×
            # probe measured ~100× pair growth); a trailing sort here is a
            # range-shuffle of the whole pair table
            "containment_pairs",
            # r9 corpus-sized outputs: assignment table, kNN pair tables,
            # CC label table, redacted corpus
            "kmeans_iterate",
            "knn_join_ivf_blocked",
            "knn_join_ivf_vectorized",
            "dedup_groups_twostar",
            "pii_scrub",
            # r10 corpus-sized outputs: NER-redacted corpus, resample
            # manifest, contamination report
            "pii_scrub_ner",
            "temperature_resample",
            "decontaminate_semantic",
            # second r10 wave of corpus-sized outputs
            "pq_encode",
            "winnowing_fingerprints",
            "dsir_importance_weights",
            "decontaminate_bloom",
            # r13 composed near-dup manifest: carrier-sized output, the
            # only acceptable exchanges are the LSH/CC hash shuffles
            "pipeline_clean_corpus_neardup",
            "bigram_lm_score",
            "leakage_safe_split",
            "curriculum_stages",
            "contrastive_pairs",
        ],
    )
    def test_unbounded_output_has_no_global_sort(self, spark, name):
        qs = entrymod.queries()
        p = plan(qs[name](spark, SF_DIR))
        assert "rangepartitioning" not in p.lower(), (
            f"{name} ends in a global sort (range-partition exchange)"
        )


class TestMultimodalShuffleFree:
    """VERDICT r12 #3 adjudication: BENCHDIFF_r12 flagged multimodal_frames
    at 1.42x normalized with the file unchanged since r10. Re-measured
    min-of-3 calibrated (2026-08-16): 0.374 s at sf0.1 vs the r12 reading
    of 0.65 s and r11's 0.43 s, on a sandbox whose calibration probes ran
    ~1.3x SLOWER than the r12 run — the flag was load noise, not plan
    drift. This pin makes any REAL regression structural: the mapInPandas
    multimodal rows are scan → project → Arrow-batched Python with output
    partitioning following input, so no shuffle may appear at or above the
    blob encoder. r15 amendment (guide §2.5): the document scan now rides
    _docs_parallel, whose guard round-robin-repartitions the narrow TEXT
    scan when the file's split estimate is below core count (at test SF
    the table is ONE single-row-group file, so the whole encode → decode
    chain ran on one task); that guard is a no-op at scale and shuffles
    only (doc_id, text) — so the pin now allows RoundRobinPartitioning
    exchanges and still forbids any HASH/RANGE exchange (a shuffle of
    blob payloads or of decoded rows remains the structural regression)."""

    @staticmethod
    def _non_roundrobin_exchanges(p: str) -> list:
        """Exchange nodes whose partitioning is NOT the guard's RoundRobin.
        The formatted tree prints bare ``Exchange (n)`` — the partitioning
        only appears in the details section (``(n) Exchange`` followed by
        an ``Arguments:`` line) — so each tree node id is resolved to its
        Arguments before classifying."""
        import re

        bad = []
        for node_id in re.findall(r"Exchange \((\d+)\)", p):
            m = re.search(
                rf"^\({node_id}\) Exchange\n(?:[^\n]+\n)*?"
                rf"Arguments: ([^\n]+)",
                p,
                re.M,
            )
            args = m.group(1) if m else "<no Arguments found>"
            if "RoundRobinPartitioning" not in args:
                bad.append(f"Exchange ({node_id}): {args}")
        return bad

    @pytest.mark.parametrize(
        "name",
        [
            "multimodal_frames",
            "multimodal_summary",
            "multimodal_audio_chunks",
            "multimodal_bmp_resize",
            "video_motion_stats",
            # learned merges applied inside array HOFs: the returned plan
            # is scan -> project (the learning's own bounded jobs run at
            # build time, not in this plan)
            "bpe_segment_stats",
        ],
    )
    def test_mapinpandas_rows_have_no_exchange(self, spark, name):
        qs = entrymod.queries()
        p = plan(qs[name](spark, SF_DIR))
        bad = self._non_roundrobin_exchanges(p)
        assert not bad, (
            f"{name} acquired a non-guard shuffle — scan→mapInPandas must "
            f"stay exchange-free above the encoder: {bad}"
        )

    def test_vad_segments_single_exchange(self, spark):
        """audio_vad_segments: ONE hash shuffle on doc_id feeds both the
        island window and the segment rollup — a second hash Exchange means
        the window and the groupBy stopped sharing their partitioning.
        (The _docs_parallel guard's RoundRobin exchange below the encoder
        is allowed, as in the mapInPandas pin above.)"""
        p = plan(qs_vad := entrymod.queries()["audio_vad_segments"](spark, SF_DIR))
        bad = self._non_roundrobin_exchanges(p)
        assert len(bad) == 1, (
            f"audio_vad_segments has {len(bad)} non-guard exchanges, "
            f"expected 1: {bad}"
        )


class TestNoUnboundedGlobalWindow:
    """VERDICT r9 #1: a partitionless rank window (`row_number() OVER
    (ORDER BY ...)` with no PARTITION BY) serializes its whole input
    through ONE task — over a corpus-keyed table that's a single-partition
    sort of the vocabulary/corpus. Corpus-keyed top-k must compile to
    TakeOrderedAndProject (per-partition heaps, k rows to the driver); a
    partitionless window is only legal over an input that is already
    bounded (under a GlobalLimit / TakeOrderedAndProject)."""

    # first windowspecdefinition argument carries a sort direction ⇒ the
    # partition-column list is empty ⇒ single-partition window
    import re as _re

    PARTITIONLESS = _re.compile(r"windowspecdefinition\([^,()]*\b(?:ASC|DESC)\b")

    def _tree(self, spark, name):
        return plan(entrymod.queries()[name](spark, SF_DIR)).split("\n\n")[0]

    @pytest.mark.parametrize(
        "name",
        [
            # corpus-keyed top-k family: heap-based, never a global window
            "token_count_min",
            "ngram_freq_topk",
            "token_pmi_topk",
            "top_orders",
            # r11: both stages (ADC shortlist AND exact re-rank) must be
            # heap-based — a global sort of either would defeat the design
            "ann_ivfpq_rerank_topk",
        ],
    )
    def test_topk_is_take_ordered(self, spark, name):
        tree = self._tree(spark, name)
        assert "TakeOrderedAndProject" in tree, (
            f"{name} lost the TakeOrderedAndProject top-k shape"
        )

    def test_token_count_min_rank_window_input_is_bounded(self, spark):
        tree = self._tree(spark, "token_count_min")
        if "Window" in tree:
            # formatted tree prints children below their parent: the rank
            # window's TakeOrderedAndProject child (the k-row limit) must
            # sit UNDER the Window, i.e. the window ranks k rows, not the
            # vocabulary
            assert tree.index("TakeOrderedAndProject") > tree.index("Window"), (
                "rank window consumes the corpus-sized count table"
            )

    @pytest.mark.parametrize(
        "name",
        [
            # corpus/pair-keyed plans whose windows must all be partitioned
            "kmeans_iterate",
            "knn_join_ivf_blocked",
            "knn_join_ivf_vectorized",
            "dedup_groups_twostar",
            "pii_scrub",
            "sessionize",
            "duplicate_span_report",
            "unigram_lm_score",
            "tfidf_keywords",
        ],
    )
    def test_corpus_keyed_windows_are_partitioned(self, spark, name):
        # windowspecdefinition prints in the detail section, not the tree
        p = plan(entrymod.queries()[name](spark, SF_DIR))
        m = self.PARTITIONLESS.search(p)
        assert m is None, (
            f"{name} has a partitionless (single-task) window: {m.group(0)!r}"
        )


class TestTokenBudgetScaledPlan:
    """VERDICT r10 #1: the spec form's per-source window (partition
    `source`, order `quality DESC, doc_id ASC`) serializes a hot source
    through one task's sort. The scaled twin must carry NO such window:
    its only corpus-side window partitions by (source, quality) — the
    1e-4 tier key — and the source-alone window runs over the bounded
    tier table (ordered by quality only, never doc_id)."""

    import re as _re

    # a window partitioned by source ALONE whose ORDER BY reaches doc_id —
    # the exact skewed-sort shape being banned from the corpus path
    SOURCE_SORT = _re.compile(
        r"windowspecdefinition\(source#\d+, quality#\d+ DESC[^)]*doc_id#\d+"
    )

    def test_spec_has_the_hazard_and_scaled_does_not(self, spark):
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            sampling,
        )

        spec_plan = plan(sampling.token_budget_select(spark, SF_DIR))
        scaled_plan = plan(sampling.token_budget_select_scaled(spark, SF_DIR))
        # regex stays honest: it must FIND the hazard in the spec form
        assert self.SOURCE_SORT.search(spec_plan), (
            "hazard regex no longer matches the spec plan — rewrite it"
        )
        assert not self.SOURCE_SORT.search(scaled_plan), (
            "scaled form regressed to a per-source corpus sort"
        )


class TestIvfRecallAuditPlan:
    def test_candidate_join_is_broadcast_hash_equi(self, spark):
        """The probed-candidate join must be a broadcast hash EQUI-join on
        the assigned cluster (the tiny exploded probe list broadcast),
        never a cartesian. Since the r9 rebase the centroids are LEARNED
        (similarity.learned_centroids) and enter the plan as LITERALS —
        zero centroid scans, zero joins, no persist needed; the scan bound
        tightens accordingly (pre-r9 the per-label centroid build needed
        an InMemoryRelation pin to stay at 7 scans)."""
        import re

        df = similarity.ann_ivf_recall_audit(spark, SF_DIR)
        p = plan(df)
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p, "candidate join lost its equi-key"
        assert "EvalPython" not in p, "fell back to Python row evaluation"
        # The audit's real independent passes only: candidate ranks x2,
        # probe sample, exact verifier — the centroid argmin is literal
        # arithmetic inside each scan, never a scan of its own.
        scans = set(re.findall(r"Scan parquet\s+\((\d+)\)", p))
        assert len(scans) <= 7, (
            f"centroid build re-entered the plan as scans: {len(scans)} "
            "distinct parquet scans"
        )

    def test_vocab_coverage_persists_the_count_table(self, spark):
        """vocab_coverage's total and top-v branches must read the ONE
        persisted token-count table — unpinned, the compiled plan
        tokenizes and token-shuffles the corpus twice."""
        import re

        from project_samanvay_a_true_hybrid_htap_database_spark.operators import text as textops

        p = plan(textops.vocab_coverage(spark, SF_DIR))
        assert p.count("InMemoryTableScan") >= 2, (
            "token-count persist was dropped (branches recompute the "
            "tokenize+shuffle)"
        )
        scans = set(re.findall(r"Scan parquet\s+\((\d+)\)", p))
        assert len(scans) == 1, (
            f"corpus scanned {len(scans)} times (want the one cached scan)"
        )


class TestLshIndexPruning:
    def test_indexed_lsh_scan_is_partition_pruned(self, spark):
        """The materialized bucket layout must turn the bucket predicate
        into a PartitionFilter (file-level pruning), not a row filter over
        a full scan — the physical basis of the 1/2^planes scan claim."""
        import os

        df = similarity.ann_lsh_indexed_topk(spark, SF_DIR)
        p = plan(df)
        pf = p.split("PartitionFilters")[1][:200] if "PartitionFilters" in p else ""
        assert "bucket" in pf, f"bucket not in PartitionFilters: {pf!r}"
        # The layout itself: one directory per populated bucket, <= 2^planes
        index_dir = similarity.build_lsh_index(spark, SF_DIR)
        buckets = [d for d in os.listdir(index_dir) if d.startswith("bucket=")]
        assert 1 < len(buckets) <= 2**similarity.LSH_PLANES

    def test_indexed_matches_unindexed(self, spark):
        a = similarity.ann_lsh_topk(spark, SF_DIR).collect()
        b = similarity.ann_lsh_indexed_topk(spark, SF_DIR).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) > 0


class TestMipsIndexPruning:
    def test_mips_indexed_scan_is_partition_pruned(self, spark):
        """Norm-augmented MIPS over the materialized bucket layout: the
        bucket predicate must be a PartitionFilter (file-level pruning) —
        same physical contract as the cosine LSH index."""
        import os

        df = similarity.ann_mips_indexed_topk(spark, SF_DIR)
        p = plan(df)
        pf = p.split("PartitionFilters")[1][:200] if "PartitionFilters" in p else ""
        assert "bucket" in pf, f"bucket not in PartitionFilters: {pf!r}"
        index_dir = similarity.build_mips_index(spark, SF_DIR)
        buckets = [d for d in os.listdir(index_dir) if d.startswith("bucket=")]
        assert 1 < len(buckets) <= 2**similarity.LSH_PLANES

    def test_indexed_rows_are_bucket_filtered_bruteforce(self, spark):
        """The indexed result must equal brute-force MIPS restricted to the
        query's augmented-space bucket — i.e. the index changes WHAT IS
        SCANNED, never the scores of what it returns."""
        got = {
            (r["vec_id"], r["inner_product"])
            for r in similarity.ann_mips_indexed_topk(spark, SF_DIR).collect()
        }
        brute = {
            (r["vec_id"], r["inner_product"])
            for r in similarity.ann_mips_topk(spark, SF_DIR, k=10_000).collect()
        }
        assert len(got) > 0 and got <= brute


class TestIvfIndexPruning:
    def test_ivf_indexed_scan_is_partition_pruned(self, spark):
        # r9: the layout partitions by the LEARNED cluster id, and the
        # query's cluster must reach the scan as a partition filter.
        df = similarity.ann_ivf_indexed_topk(spark, SF_DIR)
        p = plan(df)
        pf = p.split("PartitionFilters")[1][:200] if "PartitionFilters" in p else ""
        assert "cluster" in pf, f"cluster not in PartitionFilters: {pf!r}"

    def test_indexed_matches_unindexed(self, spark):
        a = similarity.ann_ivf_topk(spark, SF_DIR).collect()
        b = similarity.ann_ivf_indexed_topk(spark, SF_DIR).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) > 0

    def test_multiprobe_scan_prunes_to_nprobe_partitions(self, spark):
        """r10: the nprobe-nearest-list IN filter must reach the scan as a
        partition filter (nprobe lists read, not the table), and widening
        the probe set must only ADD candidates — the single-list top-k's
        hits never disappear from a superset scan's candidate pool."""
        df = similarity.ann_ivf_multiprobe_topk(spark, SF_DIR)
        p = plan(df)
        pf = p.split("PartitionFilters")[1][:300] if "PartitionFilters" in p else ""
        assert "cluster" in pf and "IN" in pf.upper(), f"no IN prune: {pf!r}"
        # superset property vs the single-list form
        single = {r["vec_id"] for r in similarity.ann_ivf_indexed_topk(spark, SF_DIR).collect()}
        multi_pool = {
            r["vec_id"]
            for r in similarity.ann_ivf_multiprobe_topk(
                spark, SF_DIR, k=10_000
            ).collect()
        }
        assert single <= multi_pool


class TestTwoStageRetrieval:
    def test_stage1_reads_only_projected_column(self, spark):
        """The whole point of the materialized projection: stage 1's scan
        must never touch the 64-dim column — ReadSchema carries only
        (vec_id, proj), 4× fewer bytes at scale."""
        p = plan(similarity.projected_candidates(spark, SF_DIR))
        read = p.split("ReadSchema")[1][:300]
        assert "proj" in read and "embedding" not in read
        assert "TakeOrderedAndProject" in p
        assert "rangepartitioning" not in p.lower()

    def test_rerank_pushes_candidate_in_filter(self, spark):
        """Stage 2 must reach the scan as a pushed IN filter over the
        bounded candidate ids (row-group skipping), not probe every row's
        embedding through a join."""
        p = plan(similarity.ann_projected_rerank_topk(spark, SF_DIR))
        pushed = p.split("PushedFilters")[1][:400]
        assert "In(vec_id" in pushed, f"candidate IN not pushed: {pushed!r}"
        assert "TakeOrderedAndProject" in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_random_projection_is_scan_stage_only(self, spark):
        # pure projection: no shuffle, no Python — one codegen'd scan
        p = plan(similarity.embedding_random_projection(spark, SF_DIR))
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_cross_source_overlap_never_cartesian(self, spark):
        p = plan(dedup.cross_source_overlap(spark, SF_DIR))
        assert "CartesianProduct" not in p


class TestBucketedJoin:
    def test_bucketed_join_has_no_join_side_exchange(self, spark):
        """Both fact scans read bucket-aligned files, so the SortMergeJoin
        takes neither side through an Exchange; the only shuffle left is
        the tiny post-partial-agg re-key on o_orderpriority."""
        import re

        from project_samanvay_a_true_hybrid_htap_database_spark.sources.bucketing import (
            bucketed_join_agg,
        )

        p = plan(bucketed_join_agg(spark, SF_DIR))
        assert "SortMergeJoin" in p
        assert p.count("Bucketed: true") == 2
        exchanges = re.findall(r"\(\d+\) Exchange", p)
        assert len(exchanges) == 1, f"expected only the agg exchange: {exchanges}"

    def test_bucketed_matches_plain(self, spark):
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import analytics
        from project_samanvay_a_true_hybrid_htap_database_spark.sources.bucketing import (
            bucketed_join_agg,
        )

        a = sorted(
            tuple(r)
            for r in analytics.join_agg_orders_lineitem(spark, SF_DIR).collect()
        )
        b = sorted(tuple(r) for r in bucketed_join_agg(spark, SF_DIR).collect())
        assert a == b and len(a) > 0


class TestSemiFilterBelowShuffle:
    """r3 rewrites: Q2/Q16 must keep their selective broadcast semi/anti
    filters BELOW the wide aggregate/distinct shuffle — regression here
    silently reverts to shuffling the whole fact table."""

    def test_q2_semi_filters_feed_the_pair_aggregate(self, spark):
        qs = entrymod.queries()
        p = plan(qs["tpch_q2"](spark, SF_DIR))
        # two broadcast semi joins (part, EU suppliers) below the agg
        assert p.count("BroadcastHashJoin LeftSemi") >= 2
        semi_pos = p.find("BroadcastHashJoin LeftSemi")
        agg_pos = p.find("HashAggregate")
        assert semi_pos != -1 and agg_pos != -1

    def test_q16_distinct_sees_filtered_rows_only(self, spark):
        qs = entrymod.queries()
        p = plan(qs["tpch_q16"](spark, SF_DIR))
        assert "BroadcastHashJoin LeftSemi" in p
        assert "BroadcastHashJoin LeftAnti" in p

    def test_q21_has_no_expand(self, spark):
        # the countDistinct pair would compile to Expand; the
        # per-(order,supplier) pre-aggregate must not
        qs = entrymod.queries()
        p = plan(qs["tpch_q21"](spark, SF_DIR))
        assert "Expand" not in p

    def test_q21_scans_each_fact_once(self, spark):
        """The r6 single-pass shape: the late supplier's identity rides
        through the per-order aggregate, so there is no join-back and each
        fact is scanned once (the join-back form scanned lineitem and
        orders twice — ReuseExchange never fired across its differently-
        pruned consumers)."""
        import re

        qs = entrymod.queries()
        p = plan(qs["tpch_q21"](spark, SF_DIR))
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 3


class TestNoUnboundedBroadcast:
    """VERDICT r5 #1 (inverse of TestJoinStrategy): no explicit broadcast
    hint may sit on a side that grows with the data — a full customer scan,
    a per-user/per-key aggregate derived from a fact table. Spark honors
    hints regardless of size, so such a hint is a deferred driver OOM at
    100×. Method: with AQE off and autoBroadcastJoinThreshold=-1 the
    planner broadcasts ONLY where a hint forces it, so every
    BroadcastExchange left in the plan is hint-caused; none of their
    subtrees may scan the forbidden (unbounded) table. Bounded dims
    (nation/region/supplier/part, filtered-customer in Q3, O(1)/O(k)
    aggregates) keep their hints and still appear — with allowed scans."""

    CASES = [
        ("funnel_conversion", "events.parquet"),
        ("retention_cohorts", "events.parquet"),
        ("revenue_by_nation", "customer.parquet"),
        ("tpch_q7", "customer.parquet"),
        ("tpch_q8", "customer.parquet"),
        ("tpch_q10", "customer.parquet"),
        ("tpch_q18", "customer.parquet"),
        ("tpch_q17", "lineitem.parquet"),
    ]

    @staticmethod
    def _broadcast_subtrees(df) -> list[str]:
        out = []

        def walk(node):
            if node.getClass().getSimpleName().startswith("BroadcastExchange"):
                out.append(node.treeString())
            cs = node.children()
            for i in range(cs.size()):
                walk(cs.apply(i))

        walk(df._jdf.queryExecution().executedPlan())  # noqa: SLF001
        return out

    @pytest.mark.parametrize("name,forbidden", CASES)
    def test_no_hint_broadcast_of_unbounded_side(self, spark, name, forbidden):
        qs = entrymod.queries()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = qs[name](spark, SF_DIR)
            for sub in self._broadcast_subtrees(df):
                assert forbidden not in sub, (
                    f"{name}: hint-forced broadcast whose build side scans "
                    f"{forbidden} (unbounded at scale):\n{sub[:2000]}"
                )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    def test_q3_filtered_customer_broadcast_is_kept(self, spark):
        """The blessed shape: Q3 filters customer to one segment FIRST and
        broadcasts the filtered slice — that hint must survive."""
        qs = entrymod.queries()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = qs["tpch_q3"](spark, SF_DIR)
            subs = self._broadcast_subtrees(df)
            assert any("customer.parquet" in s for s in subs)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.enabled", "true")


class TestBandedIntervalJoin:
    def test_attribution_join_is_banded_equi_join(self, spark):
        """The inequality predicate must ride on an equi-join over
        (user, day band) — never a cartesian/broadcast-nested-loop over
        per-user event pairs."""
        qs = entrymod.queries()
        p = plan(qs["attribution_window_join"](spark, SF_DIR))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestRangeJoinShape:
    """interval_overlap_join's bin-bucketing must keep the interval join an
    EQUI-join: the naive ts-BETWEEN formulation plans a
    BroadcastNestedLoopJoin (every event probed against every window),
    which is the exact 100 TB failure the bucket key exists to prevent."""

    def test_interval_overlap_join_is_equi_join(self, plans):
        p = plans["interval_overlap_join"]
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p


class TestSingleScanTokenPipeline:
    """unigram_lm_score's window-sum + ln-decomposition rewrite exists to
    cut corpus scans: the naive vocab-join form compiled to SIX parquet
    scans of documents (every branch re-derived the token counts). The
    rewrite's executed plan must stay at <=3 scans with at least one
    exchange reused between the corpus-total branch and the main branch —
    the regression signature is the scan count creeping back up."""

    def test_unigram_lm_executed_plan_reuses_exchange(self, spark):
        qs = entrymod.queries()
        df = qs["unigram_lm_score"](spark, SF_DIR)
        df.collect()  # AQE reuse only materializes in the executed plan
        p = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert p.count("Scan parquet") <= 3, (
            f"unigram_lm_score re-scans the corpus: {p.count('Scan parquet')} scans"
        )
        assert "ReusedExchange" in p, (
            "the corpus-total branch no longer reuses the per-doc exchange"
        )


class TestPQServing:
    """r10: the IVF-PQ serving contract — queries rank COMPRESSED codes,
    never raw vectors, and the coarse probe reaches the codes index as a
    partition filter. At 100 TB the codes table is ~32x smaller than the
    embeddings; a serving scan that still touches embeddings.parquet would
    silently forfeit the entire compression win."""

    def test_adc_scan_reads_codes_not_vectors(self, spark):
        df = similarity.ann_pq_adc_topk(spark, SF_DIR)
        p = plan(df)
        assert "ivfpq_index" in p, "serving must scan the PQ codes index"
        assert "embeddings.parquet" not in p, (
            "ADC serving plan touches the raw vector table"
        )
        # ADC arithmetic stays in codegen: no Python eval in the scan
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_adc_topk_is_take_ordered(self, spark):
        p = plan(similarity.ann_pq_adc_topk(spark, SF_DIR))
        assert "TakeOrderedAndProject" in p

    def test_ivfpq_scan_prunes_to_nprobe_partitions(self, spark):
        df = similarity.ann_ivfpq_topk(spark, SF_DIR)
        p = plan(df)
        pf = p.split("PartitionFilters")[1][:300] if "PartitionFilters" in p else ""
        assert "cluster" in pf and "IN" in pf.upper(), f"no IN prune: {pf!r}"
        assert "embeddings.parquet" not in p

    def test_ivfpq_is_flat_adc_restricted(self, spark):
        """List pruning must only REMOVE candidates: the IVF-PQ top-k is
        exactly the flat-ADC ranking restricted to the probed lists, so
        every IVF-PQ hit appears in the flat ADC pool with the same
        rounded distance."""
        flat = {
            r["vec_id"]: r["adc_dist"]
            for r in similarity.ann_pq_adc_topk(spark, SF_DIR, k=10_000).collect()
        }
        pruned = similarity.ann_ivfpq_topk(spark, SF_DIR).collect()
        assert 0 < len(pruned) <= 10
        for r in pruned:
            assert flat[r["vec_id"]] == r["adc_dist"]

    def test_codes_are_within_codebook_range(self, spark):
        from pyspark.sql import functions as F

        enc = similarity.pq_encode(spark, SF_DIR)
        bad = enc.filter(
            (F.col("code") < 0)
            | (F.col("code") >= similarity.PQ_KSUB)
            | (F.col("sub") < 0)
            | (F.col("sub") >= similarity.PQ_M)
        ).count()
        assert bad == 0
        # every vector carries exactly m codes
        n_vec = enc.select("vec_id").distinct().count()
        assert enc.count() == n_vec * similarity.PQ_M

    def test_residual_serving_scan_is_pruned_and_codes_only(self, spark):
        df = similarity.ann_ivfpq_res_topk(spark, SF_DIR)
        p = plan(df)
        assert "ivfpqres_index" in p
        assert "embeddings.parquet" not in p
        pf = p.split("PartitionFilters")[1][:300] if "PartitionFilters" in p else ""
        assert "cluster" in pf and "IN" in pf.upper(), f"no IN prune: {pf!r}"
        assert "TakeOrderedAndProject" in p


class TestSegmentCleaningPlans:
    """r11 segment-level cleaning: the scrub ops must stay inside the scan
    stage (zero corpus shuffle), and the boilerplate set must broadcast."""

    def test_intradoc_scrub_is_zero_shuffle_single_scan(self, spark):
        p = plan(text.dedup_segments_within_doc(spark, SF_DIR))
        assert "Exchange" not in p
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
        assert "BatchEvalPython" not in p and "ArrowEval" not in p

    def test_char_entropy_is_zero_shuffle_single_scan(self, spark):
        p = plan(text.char_entropy_score(spark, SF_DIR))
        assert "Exchange" not in p
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
        assert "BatchEvalPython" not in p and "ArrowEval" not in p

    def test_char_entropy_scan_prunes_to_two_columns(self, spark):
        p = plan(text.char_entropy_score(spark, SF_DIR))
        rs = p.split("ReadSchema")[1].split("\n")[0]
        assert "doc_id" in rs and "text" in rs
        assert "embedding" not in rs and "source" not in rs

    def test_boilerplate_scrub_corpus_side_joins_broadcast(self, spark):
        p = plan(text.boilerplate_scrub(spark, SF_DIR))
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        # the corpus is scanned once to build the flagged set and once to
        # scrub — never more
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2

    def test_boilerplate_report_totals_join_broadcasts(self, spark):
        p = plan(text.boilerplate_segments_report(spark, SF_DIR))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p


class TestSourceKlPlan:
    def test_kl_has_no_vocab_join(self, spark):
        """Corpus token counts come from a window over the (source, token)
        aggregate — a vocab-sized join or broadcast must never appear."""
        p = plan(text.source_token_kl(spark, SF_DIR))
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p
        # the only broadcast is the 1-row corpus total
        assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 1


class TestPipelineCleanCorpusPlan:
    """r12 composed batch cleaning pipeline: every gate must stay inside
    the scan stage (weights as literals, flagged sets and the Bloom
    bitmap broadcast or folded), with the final fp-keyed aggregate as
    the only corpus-sized shuffle."""

    def test_gates_fold_into_scan_no_python(self, spark):
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            sampling,
        )

        p = plan(sampling.pipeline_clean_corpus(spark, SF_DIR))
        assert "BatchEvalPython" not in p and "ArrowEval" not in p
        assert "CartesianProduct" not in p
        # flagged-set join is broadcast; no corpus-side sort-merge join
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        # the fp dedup is the only corpus-sized hash-partition exchange:
        # every hashpartitioning exchange keys on fp or on the
        # model-building (source[, segment]) side (partial-agg'd
        # map-side), never on doc_id
        ex_keys = re.findall(r"hashpartitioning\(([a-zA-Z_0-9#]+)", p)
        assert any(k.startswith("fp") for k in ex_keys), ex_keys
        assert all(
            k.startswith(("fp", "source", "segment")) for k in ex_keys
        ), ex_keys

    def test_export_plan_adds_only_bucket_keyed_exchanges(self, spark):
        """training_export_plan = the cleaned manifest + the terasort
        shuffle/pack: beyond the pipeline's own exchanges, every new
        hash partitioning must key on the shard bucket (the per-shard
        window + the (bucket, bin) audit) — never a global sort and
        never doc_id."""
        from project_samanvay_a_true_hybrid_htap_database_spark.operators import (
            sampling,
        )

        p = plan(sampling.training_export_plan(spark, SF_DIR))
        assert "BatchEvalPython" not in p and "ArrowEval" not in p
        ex_keys = re.findall(r"hashpartitioning\(([a-zA-Z_0-9#]+)", p)
        assert any(k.startswith("bucket") for k in ex_keys), ex_keys
        assert all(
            k.startswith(("fp", "source", "segment", "bucket")) for k in ex_keys
        ), ex_keys
        # the pack window is per-shard: no rangepartitioning (global sort)
        assert "rangepartitioning" not in p
