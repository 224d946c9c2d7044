"""Deterministic sampling & split operators for training-data pipelines.

Every operator keys off md5 of a salted document id — NOT ``rand()`` — so
(a) the sample is reproducible run-to-run and engine-to-engine (the DuckDB
oracle computes the identical membership), (b) membership is a pure
per-row filter evaluated inside the parquet scan stage: no shuffle, no
driver coordination, no seed-plumbed RNG state. At 100 TB a hash-gated
sample is embarrassingly parallel and composes with predicate pushdown;
``df.sample()``'s per-partition RNG is neither portable nor stable under
repartitioning.

Reference scope note: the reference engine has no sampling surface at all
(SURVEY.md §2.4); these are the pipeline extensions the build brief asks
for alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long32
from ..sources import load_table

# Per-language downsampling rates in basis points (of 10,000) for the
# stratified sample: keep all low-resource text, thin the dominant bucket.
# Literal constants so the oracle SQL embeds the same values.
STRATA_BP = {"en": 5000, "de": 8000, "es": 8000, "fr": 8000, "und": 2500}


def _bucket(salt: str, col: str | F.Column = "doc_id") -> F.Column:
    """Deterministic bucket in [0, 10000): md5 of the salted id."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long32(F.concat(F.lit(salt + "|"), c.cast("string"))) % 10000


def _split_expr(col: str | F.Column = "doc_id") -> F.Column:
    """THE train/valid/test assignment (80/10/10 on the 'split'-salted
    bucket). Single definition shared by train_test_split and
    split_leakage_audit — the audit is only valid if it reproduces the
    production split bit-for-bit, so neither may restate the salt or the
    cut-points."""
    b = _bucket("split", col)
    return F.when(b < 8000, "train").when(b < 9000, "valid").otherwise("test")


def hash_sample(spark: SparkSession, sf_dir: str, rate_bp: int = 1000) -> DataFrame:
    """Bernoulli-style deterministic sample: keep a doc iff its salted hash
    bucket falls below ``rate_bp`` (default 10%). Pure scan-stage filter —
    the sample of a 100 TB corpus costs one pass and prunes columns like
    any other scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        docs.filter(_bucket("smp") < rate_bp)
        .select("doc_id", "lang", "n_chars")
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified downsampling (the corpus-rebalancing step): each
    language keeps its own hash-rate. Output is the per-language audit —
    total vs sampled counts — computed with conditional aggregation in the
    same single scan that evaluates membership; no join, no second pass."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(bp))
            for lang, bp in STRATA_BP.items()
        ],
        F.lit(0),
    )
    kept = _bucket("strat") < rate
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_sampled"),
        )
        .orderBy("lang")
    )


def fixed_k_per_stratum(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Uniform fixed-size sample per language: rank docs inside each
    language by their salted hash (a deterministic random order) and keep
    the first ``k``. The reservoir-sampling shape without reservoir state:
    one window shuffle on the stratum key. At 100 TB with a skewed stratum,
    swap the window for a per-partition top-k (mapPartitions heap) feeding
    a final merge — same output, bounded memory."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        _bucket("resv").asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "lang", "rk")
        .orderBy("lang", "rk")
    )


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment by hash bucket,
    reported as per-split counts + character volume. Assignment is a pure
    row expression: the same doc lands in the same split on every engine,
    every run, every repartitioning — the property that matters when the
    split must stay stable across pipeline re-runs on growing data."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        docs.groupBy(_split_expr().alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


def pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end data-cleaning funnel: total → language-identified →
    quality-passing → exact-dedup canonical → NEAR-dedup survivors.
    The flag stages compose the text operators' expressions over ONE scan
    of documents (per-doc flags are plain column expressions; the
    canonical-duplicate flag and every stage count fold through one
    groupBy on the content hash with map-side partials — no window, no
    per-group sort). Emitted as one row per stage via explode of a
    literal struct array — NOT an N-way union, which would clone the
    aggregate per branch.

    The near-dup stage (r9 — VERDICT r8 #6) runs in the STAGED order
    staged_dedup_report established as the production composition: the
    n-gram pair graph is restricted to the stage-3 survivors (lang-ok,
    quality-ok, exact-canonical) BEFORE its quadratic self-join, so the
    pair stage never sees a wide exact-duplicate clique — the measured
    containment/jaccard clique blowup (SCALE.md: 978× output at 10×
    unstaged) cannot occur in the default path. Near-duplicate groups
    collapse via connected components; stage 4 counts what ships."""
    from .text import LANG_MARKERS
    from ..functions.textfns import tokens

    # tokens staged as a column (r15): the 4 marker filters + the three
    # quality sub-expressions below would each re-run the split() subtree
    # otherwise (the _doc_shingles trap, ~7 tokenizations per row)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("T", tokens("text"))
    )
    toks = F.col("T")

    def _is_marker(markers: list[str]):
        arr = F.array(*[F.lit(x) for x in markers])
        return lambda t: F.array_contains(arr, t)

    scores = [
        F.size(F.filter(toks, _is_marker(m))) for m in LANG_MARKERS.values()
    ]
    lang_ok = F.greatest(*scores) > 0

    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    alpha_ratio = F.length(
        F.regexp_replace(F.lower("text"), "[^a-z]", "")
    ) / F.length("text")
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.3
        + alpha_ratio * 0.3
    )
    quality_ok = quality > 0.45

    # Canonical-duplicate accounting WITHOUT a window (r15 pass 4, guide
    # §2.3/§2.4): the canonical flag is "doc_id == min(doc_id) within the
    # md5(text) group", and every stage count is a sum over those groups —
    # so ONE groupBy(md5) with map-side partial aggregation replaces the
    # window form, whose exchange shipped full per-doc flag rows and then
    # SORTED every group just to mark the min. "The group-min doc passes
    # lang+quality" is read off two LONG minima — min(doc_id) and
    # min(doc_id among lq_ok docs) agree exactly when the canonical doc
    # passes (the overall min, when it passes, is also the passing-subset
    # min; NULL when no doc passes, and NULL == m_all is never true) —
    # exact even under an md5 collision, where group members could
    # disagree on lang/quality. All-primitive aggregates keep this a
    # HashAggregate; a struct-min argmin would force SortAggregate (a
    # map-side sort of every corpus row — measured and rejected).
    grp = (
        docs.select(
            "doc_id",
            lang_ok.alias("lang_ok"),
            (lang_ok & quality_ok).alias("lq_ok"),
            F.md5("text").alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("lang_ok"), 1).otherwise(0)).alias("nl"),
            F.sum(F.when(F.col("lq_ok"), 1).otherwise(0)).alias("nq"),
            F.min("doc_id").alias("m_all"),
            F.min(F.when(F.col("lq_ok"), F.col("doc_id"))).alias("m_lq"),
        )
    )

    # Stage 4 (staged near-dedup): the pair graph sees ONLY stage-3
    # survivors — the allowlist lands before ngram_jaccard_pairs'
    # quadratic inverted-index self-join (exact-first staging).
    from ..operators.dedup import connected_components, ngram_jaccard_pairs

    survivors = grp.filter(F.col("m_lq") == F.col("m_all")).select(
        F.col("m_all").alias("doc_id")
    )
    pairs = ngram_jaccard_pairs(spark, sf_dir, keep=survivors).select("d1", "d2")
    near_removed = connected_components(pairs).agg(
        F.coalesce(
            F.sum(F.when(F.col("doc_id") != F.col("group_id"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_near_removed")
    )

    # c0 was count(*) (0 on an empty corpus, never NULL) — coalesce keeps
    # that exact; c1–c3 were sums (NULL on empty), so plain sums match.
    agg = grp.agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("c0"),
        F.sum("nl").alias("c1"),
        F.sum("nq").alias("c2"),
        F.sum(
            F.when(F.col("m_lq") == F.col("m_all"), 1).otherwise(0)
        ).alias("c3"),
    )
    stages = F.array(
        F.struct(F.lit("0_total").alias("stage"), F.col("c0").alias("n_docs")),
        F.struct(F.lit("1_lang_id").alias("stage"), F.col("c1").alias("n_docs")),
        F.struct(F.lit("2_quality").alias("stage"), F.col("c2").alias("n_docs")),
        F.struct(F.lit("3_dedup").alias("stage"), F.col("c3").alias("n_docs")),
        F.struct(
            F.lit("4_near_dedup").alias("stage"),
            (F.col("c3") - F.col("n_near_removed")).alias("n_docs"),
        ),
    )
    return (
        agg.crossJoin(F.broadcast(near_removed))
        .select(F.explode(stages).alias("s"))
        .select(F.col("s.stage").alias("stage"), F.col("s.n_docs").alias("n_docs"))
        .orderBy("stage")
    )


def pack_sequences(
    spark: SparkSession, sf_dir: str, budget: int = 512, shards: int = 8
) -> DataFrame:
    """Training-sequence packing (the concat-then-chunk step of LLM
    pretraining): documents are concatenated in a deterministic order and
    chunked into fixed-token-budget bins; a doc belongs to the bin its
    start offset falls in. Packing is per-shard (doc_id mod ``shards``) so
    the cumulative-sum window parallelizes — a single global ordering would
    serialize the corpus through one task at 100 TB, while per-shard
    packing runs one window partition per shard and loses nothing (shards
    are independent training streams). Output is the per-bin audit
    (docs + token mass per bin), which is also what a capacity planner
    needs."""
    from ..functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_tokens = F.size(tokens("text"))
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % shards).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget),
    )
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
    )


def pack_sequences_bpe(
    spark: SparkSession, sf_dir: str, budget: int = 512, shards: int = 8
) -> DataFrame:
    """pack_sequences with the LEARNED tokenizer's token counts (r15) —
    the real pretraining-export composition: packing budgets are spent in
    the units the training tokenizer actually produces (bpe_segment_stats'
    n_bpe_symbols, the 6-round learned-merge application), not whitespace
    words. Same per-shard cumulative-sum packing shape (one window
    partition per shard — no global ordering bottleneck at 100 TB); the
    tokenizer learning itself is a bounded index-build (one corpus token
    shuffle + 6 vocab-sized argmax rounds, see text.bpe_learn_merges).
    Docs with no tokenizable words are excluded, exactly as
    bpe_segment_stats excludes them."""
    from .text import bpe_segment_stats

    sized = bpe_segment_stats(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % shards).alias("shard"),
        F.col("n_bpe_symbols").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )


def source_mixture_weights(
    spark: SparkSession, sf_dir: str, alpha: float = 0.7
) -> DataFrame:
    """Temperature-based source re-weighting (the multilingual-training
    mixing knob): each source's sampling weight is its natural token share
    raised to ``alpha`` and renormalized — alpha < 1 up-weights small
    feeds, alpha = 1 is natural sampling. Output is the per-source mixing
    table a data loader consumes: natural share, alpha share, and the
    boost factor (alpha share / natural share ≈ virtual epochs over that
    feed).

    One corpus scan (token counts fold map-side into the per-source
    aggregate); both normalizations are windows over the per-SOURCE table,
    which is bounded by the feed count, not the corpus. The pow-derived
    shares are floor-truncated at 1e-6 like every transcendental output
    (libm ulp differences must not flip a rounded digit cross-engine)."""
    from ..functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    nat = F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    aw = F.pow(nat, F.lit(alpha))
    ash = aw / F.sum(aw).over(w_all)
    trunc = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        trunc(nat).alias("nat_share"),
        trunc(ash).alias("alpha_share"),
        trunc(ash / nat).alias("boost"),
    )


def temperature_resample(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.7,
    target_frac: float = 0.5,
) -> DataFrame:
    """APPLIES source_mixture_weights' temperature shares as an actual
    resampling pass (r10): per-source acceptance rate
    r_s = min(1, boost_s × target_frac) — up-weighted (small) feeds keep
    up to all of their docs (capped at 1: no replication here; virtual
    epochs are the loader's job), down-weighted feeds are thinned — and
    membership is the repo's standard deterministic md5 threshold, so the
    sample is reproducible, join-free per row, and decided INSIDE the scan
    stage. Scale shape: one tiny per-source aggregate (bounded by feed
    count) broadcast back onto one corpus scan; no corpus shuffle, no
    sort. The rate lives as an INTEGER parts-per-million threshold from
    the moment it is floored (never a float round-trip that could
    truncate differently per engine) — the cross-engine contract every
    hash-membership operator here uses.

    Output: surviving (doc_id, source) — the resampled corpus manifest."""
    from ..functions.hashing import md5_long32

    shares = source_mixture_weights(spark, sf_dir, alpha=alpha).select(
        "source",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.floor(F.col("boost") * target_frac * 1e6).cast("long"),
        ).alias("thresh_ppm"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    keep = (
        md5_long32(F.concat(F.lit("tsamp|"), F.col("doc_id").cast("string")))
        % 1_000_000
    ) < F.col("thresh_ppm")
    return docs.join(F.broadcast(shares), "source").filter(keep).select(
        "doc_id", "source"
    )


LEAKAGE_TEST_PPM = 200_000  # 20% test split, as integer ppm


def leakage_safe_split(
    spark: SparkSession, sf_dir: str, test_ppm: int = LEAKAGE_TEST_PPM
) -> DataFrame:
    """Train/test split that can NEVER leak a near-duplicate across the
    boundary — the fix for what split_leakage_audit measures on the plain
    hash split: membership is decided by the md5 of the doc's near-dup
    GROUP representative (connected-component min doc_id over the exact
    pair graph; singletons represent themselves), so an entire duplicate
    cluster lands on one side by construction. The per-pair invariant is
    pinned in pytest; the group machinery is dedup_groups (at 100 TB,
    swap in dedup_groups_lsh — banded candidates instead of the exact
    inverted index, identical downstream contract).

    Shape: pair graph + CC (both 10x-probed), one doc-keyed left join to
    attach representatives, split decided inside the scan — the same
    integer-ppm md5 threshold every membership operator here uses.
    Output: (doc_id, group_id, split)."""
    from ..functions.hashing import md5_long32
    from .dedup import dedup_groups

    groups = dedup_groups(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    rep = docs.join(groups, "doc_id", "left").select(
        "doc_id", F.coalesce("group_id", "doc_id").alias("group_id")
    )
    is_test = (
        md5_long32(F.concat(F.lit("lsplit|"), F.col("group_id").cast("string")))
        % 1_000_000
    ) < test_ppm
    return rep.withColumn(
        "split", F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: every doc bucketed into an easy/medium/hard
    stage by corpus-relative unigram cross-entropy terciles — the
    schedule a curriculum-learning loader consumes (train on
    corpus-typical text first, feed the tail later). Difficulty is the
    model-free unigram_lm_score; the tercile cuts are EXACT
    linear-interpolation percentiles of the (already 1e-6-floored)
    scores, computed in one 1-row aggregate, rounded to 1e-6 and
    broadcast back onto the doc-sized score table — one comparison per
    row, no sort of the corpus, no window. At 100 TB the cuts would come
    from percentile_approx; the exact form is the spec and the oracle
    (the percentile_prices precedent). Output: (doc_id, cross_entropy,
    stage 1..3)."""
    from .text import unigram_lm_score

    ce = unigram_lm_score(spark, sf_dir).select("doc_id", "cross_entropy")
    cuts = ce.agg(
        F.round(
            F.expr(
                "percentile(cross_entropy, array(0.3333333333333333,"
                " 0.6666666666666666))"
            )[0],
            6,
        ).alias("c1"),
        F.round(
            F.expr(
                "percentile(cross_entropy, array(0.3333333333333333,"
                " 0.6666666666666666))"
            )[1],
            6,
        ).alias("c2"),
    )
    return ce.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "cross_entropy",
        (
            F.lit(1)
            + (F.col("cross_entropy") > F.col("c1")).cast("int")
            + (F.col("cross_entropy") > F.col("c2")).cast("int")
        ).alias("stage"),
    )


CONTRASTIVE_NEG_K = 3      # negatives mined per (anchor, positive) pair
CONTRASTIVE_NEG_BUCKETS = 64


def contrastive_pairs(
    spark: SparkSession,
    sf_dir: str,
    k_neg: int = CONTRASTIVE_NEG_K,
    buckets: int = CONTRASTIVE_NEG_BUCKETS,
) -> DataFrame:
    """Training-pair mining for embedding/reranker models: every verified
    near-duplicate pair from the n-gram Jaccard graph becomes an
    (anchor, positive), and each anchor draws ``k_neg`` deterministic
    pseudo-random negatives — the (anchor, positive, negative) triplets a
    contrastive loss consumes, reproducible run-over-run because nothing
    here is RNG.

    The negative draw is the scale-shaped part: a uniform "random doc"
    per anchor would need either a global index (single-partition window
    — banned) or an anchor x corpus join. Instead every doc hashes into
    one of ``buckets`` md5 buckets once (a bucket-min table bounded by
    the bucket count, broadcast), and anchor j probes bucket
    md5(anchor, j) — one broadcast hash join, zero corpus shuffles
    beyond the pair generator itself. In-batch duplicates (negative
    colliding with the anchor or its positive) are dropped rather than
    redrawn, so a probe can yield fewer than k_neg rows — both engines
    drop the same rows. Two disclosed draw biases (ADVICE r10): two j
    draws for one anchor can hash to the SAME bucket, so a triplet can
    repeat under different neg_rank (kept — the oracle keeps it too);
    and the negative pool is the <= ``buckets`` bucket-min docs
    corpus-wide (biased toward low doc_ids). Raise ``buckets`` to widen
    the pool; a per-epoch salt in the bucket hash rotates it. Output:
    (anchor, positive, neg_rank, negative)."""
    from ..functions.hashing import md5_long32
    from .dedup import ngram_jaccard_pairs

    pos = ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("d1").alias("anchor"), F.col("d2").alias("positive")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bmin = docs.groupBy(
        (
            md5_long32(F.concat(F.lit("cbkt|"), F.col("doc_id").cast("string")))
            % buckets
        )
        .cast("int")
        .alias("bkt")
    ).agg(F.min("doc_id").alias("negative"))
    probes = pos.select(
        "anchor",
        "positive",
        F.explode(F.array(*[F.lit(j) for j in range(k_neg)])).alias("j"),
    ).withColumn(
        "bkt",
        (
            md5_long32(
                F.concat(
                    F.lit("cneg|"),
                    F.col("anchor").cast("string"),
                    F.lit("|"),
                    F.col("j").cast("string"),
                )
            )
            % buckets
        ).cast("int"),
    )
    return (
        probes.join(F.broadcast(bmin), "bkt")
        .filter(
            (F.col("negative") != F.col("anchor"))
            & (F.col("negative") != F.col("positive"))
        )
        .select(
            "anchor",
            "positive",
            (F.col("j") + 1).cast("int").alias("neg_rank"),
            "negative",
        )
    )


TOKEN_BUDGET_DEFAULT = 12_000  # sized so the cutoff BINDS on the test corpus
# (~27k corpus tokens at either test SF — a budget above the corpus would
# select everything and the admission boundary would go untested)


def token_budget_select(
    spark: SparkSession,
    sf_dir: str,
    budget_tokens: int = TOKEN_BUDGET_DEFAULT,
    alpha: float = 0.7,
) -> DataFrame:
    """Quality-ranked selection under a per-source token budget — the
    curation pass that turns \"we can afford N training tokens\" into a
    manifest: each source gets floor(alpha_share x budget) tokens (the
    temperature mixture deciding WHERE the budget goes), and within a
    source, docs are taken best-quality-first (quality_score's composite,
    rounded to 1e-4, ties to the lower doc_id) until the running token
    sum exceeds the source's budget.

    Shape: the budget table is feed-count-bounded and broadcast; the
    prefix sum is a window per SOURCE (shuffle on source + within-source
    sort) — exact and oracle-able, the right call up to partition-sized
    sources. At 100 TB a hot source outgrows one partition; use
    ``token_budget_select_scaled`` there — a two-level prefix sum over
    the bounded (source, quality) tier table that produces the
    IDENTICAL manifest (differential-pinned in test_sampling.py) with
    no per-source corpus sort. This windowed form stays the executable
    spec the scaled twin is audited against.

    Output: the selected manifest (doc_id, source, n_tokens, quality,
    cum_tokens), cum_tokens <= the source's budget by construction."""
    from pyspark.sql import Window as W

    from .text import quality_score

    shares = source_mixture_weights(spark, sf_dir, alpha=alpha).select(
        "source",
        F.floor(F.col("alpha_share") * budget_tokens)
        .cast("long")
        .alias("budget"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    ranked = docs.join(q, "doc_id").join(F.broadcast(shares), "source")
    w = (
        W.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        ranked.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "quality", "cum_tokens")
    )


def token_budget_select_scaled(
    spark: SparkSession,
    sf_dir: str,
    budget_tokens: int = TOKEN_BUDGET_DEFAULT,
    alpha: float = 0.7,
) -> DataFrame:
    """The 100 TB form of ``token_budget_select`` — same contract, same
    manifest, no per-source corpus sort (VERDICT r10 #1 / next-round #2).

    The windowed spec's scale hazard is its per-source window: one hot
    source (a CommonCrawl-style feed that is most of the corpus) funnels
    every doc through a single task's sort. The fix exploits that
    ``quality`` is rounded to 1e-4 in [0, 1], so a source has at most
    10,001 distinct quality TIERS no matter how many docs it has. The
    per-source running sum decomposes exactly into

        cum_tokens(doc) = tokens_before_tier(source, quality)
                        + within_tier_prefix(doc)            (doc_id asc)

    because (quality desc, doc_id asc) is a total order refined by tiers.

    Plan: (1) one partial-agg scan builds the (source, quality,
    tier_tokens) table — bounded at sources x 10,001 rows; (2) the
    tier-prefix window runs over THAT table (per-source input <= 10,001
    rows — driver-safe at any corpus size); (3) tiers that start at or
    past the budget are dropped BEFORE rejoining docs (broadcast join —
    the tier table is bounded), so the surviving doc set is already
    budget-bounded-ish; (4) the only corpus-side window partitions by
    (source, quality) — granularity 1e-4, so the hot-source key is split
    ~10,000 ways. Exact equality with the windowed spec (not merely "up
    to boundary ties") is pinned by the differential test; the driver
    also hash-checks this form against the same DuckDB oracle as the
    spec."""
    from .text import quality_score

    shares = source_mixture_weights(spark, sf_dir, alpha=alpha).select(
        "source",
        F.floor(F.col("alpha_share") * budget_tokens)
        .cast("long")
        .alias("budget"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    ranked = docs.join(q, "doc_id").join(F.broadcast(shares), "source")

    # (1) bounded tier table: <= 10,001 rows per source regardless of corpus
    tiers = ranked.groupBy("source", "quality", "budget").agg(
        F.sum("n_tokens").cast("long").alias("tier_tokens")
    )
    # (2) tier prefix over the BOUNDED table (tokens strictly before tier)
    tw = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tiers = tiers.withColumn(
        "tier_prefix", F.coalesce(F.sum("tier_tokens").over(tw), F.lit(0)).cast("long")
    )
    # (3) tiers starting at/past the budget cannot admit any doc with
    # n_tokens >= 1; keep tier_prefix <= budget so zero-token docs at the
    # exact boundary survive identically to the spec.
    live = tiers.filter(F.col("tier_prefix") <= F.col("budget")).select(
        "source", "quality", "tier_prefix"
    )
    # (4) within-tier prefix: partition key carries quality too, so a hot
    # source's docs spread across its ~10k tiers instead of one task.
    dw = (
        Window.partitionBy("source", "quality")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranked.join(F.broadcast(live), ["source", "quality"])
        .withColumn(
            "cum_tokens",
            (F.col("tier_prefix") + F.sum("n_tokens").over(dw)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "quality", "cum_tokens")
    )


DSIR_BUCKETS = 1024  # hashed-feature dimensionality (fixed-size histograms)
DSIR_SMOOTH = 0.5    # add-k smoothing so unseen buckets stay finite


def dsir_importance_weights(
    spark: SparkSession,
    sf_dir: str,
    target_source: str = "src0",
    buckets: int = DSIR_BUCKETS,
    smooth: float = DSIR_SMOOTH,
) -> DataFrame:
    """Data selection via importance resampling (DSIR — Xie et al. 2023,
    public method): score every raw document by how target-like its
    hashed-token features are, logw(doc) = sum over tokens of
    ln(p_target[bucket] / p_raw[bucket]) with add-k smoothing — the
    standard cheap proxy for "train on data that looks like the domain I
    care about" (here ``target_source`` stands in for the target domain;
    the published method hashes n-grams — unigrams keep the oracle exact
    without changing the shape).

    Scale shape: the feature space is FIXED at ``buckets`` cells, so both
    domain histograms come out of ONE corpus-token pass as a single
    bucket-keyed partial agg (a 1024-row table regardless of corpus
    size), the log-ratio weight table broadcasts, and scoring is a
    broadcast hash join + one doc-keyed partial agg over the exploded
    tokens — no corpus-corpus join anywhere. At 100 TB this is two scans
    (histogram, score) of the token stream and nothing else.

    Cross-engine contract: bucket ids via the portable md5 hash; the ln
    argument is assembled with the exact same division tree both sides
    (IEEE-exact), and per-doc sums round to 1e-4 before the output and the
    ``selected`` flag (libm ulp drift and summation order cannot flip a
    digit). Output: (doc_id, n_tokens, log_weight, selected) for every
    non-target doc."""
    from ..functions.hashing import md5_long32
    from ..functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tb = docs.select(
        "doc_id",
        "source",
        F.explode(tokens("text")).alias("tok"),
    ).select(
        "doc_id",
        "source",
        (md5_long32(F.concat(F.lit("dsir|"), F.col("tok"))) % buckets)
        .cast("int")
        .alias("b"),
    )
    is_t = F.col("source") == target_source
    hist = tb.groupBy("b").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~is_t, 1).otherwise(0)).alias("cr"),
    )
    tot = hist.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    w = hist.crossJoin(F.broadcast(tot)).select(
        "b",
        F.log(
            ((F.col("ct") + smooth) / (F.col("tt") + smooth * buckets))
            / ((F.col("cr") + smooth) / (F.col("tr") + smooth * buckets))
        ).alias("lw"),
    )
    scored = (
        tb.filter(~is_t)
        .join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("lw"), 4).alias("log_weight"),
        )
    )
    return scored.withColumn("selected", F.col("log_weight") > 0)


def packing_efficiency(
    spark: SparkSession, sf_dir: str, budget: int = 512, shards: int = 8
) -> DataFrame:
    """Capacity audit of `pack_sequences`: how full the fixed-budget bins
    actually are — fill ratio (token mass / bin capacity) is the fraction
    of every training step NOT spent on padding, the number that converts
    directly into wasted accelerator hours at pretraining scale. One
    global row: bins, token mass, fill ratio, and the underfull-bin count
    (final partial bin per shard is expected; more means the packer
    regressed). Aggregates the per-bin audit — never re-scans the
    corpus."""
    bins = pack_sequences(spark, sf_dir, budget, shards)
    return bins.agg(
        F.count("*").alias("n_bins"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("bin_tokens").cast("long").alias("total_tokens"),
        F.floor(
            F.sum("bin_tokens") / (F.count("*") * F.lit(budget)) * 1e6
        ).cast("long").alias("fill_ppm"),
        F.sum(
            (F.col("bin_tokens") < F.lit(budget)).cast("long")
        ).alias("underfull_bins"),
    )


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage across train/valid/test: a per-DOCUMENT hash
    split (train_test_split) can place two near-duplicate docs on opposite
    sides of the boundary, so eval measures memorization instead of
    generalization. This audit counts it, and quantifies the fix: assign
    every doc the split of its near-dup COMPONENT (hash the connected-
    component group id with the same salt) so clusters move as a unit.

    One row: verified near-dup pairs, pairs straddling splits under the
    per-doc assignment (the leak), pairs straddling under the group
    assignment (0 by construction — computed honestly through the same
    join, not asserted), distinct components, and how many docs the
    group-aware assignment moves relative to the per-doc split (the cost
    of the fix). Scale shape: reuses the df-capped inverted-index pair
    graph + min-label CC (both bucketed, never all-pairs); the leak test
    itself is two broadcast-sized equi-joins of the pair list against the
    label table and conditional aggregates — no new shuffle family."""
    from .dedup import connected_components, ngram_jaccard_pairs

    from ..functions.caching import bounded_persist

    pairs = bounded_persist(
        ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2"),
        "leakage_pairs",
        scope=sf_dir,
    )
    labels = connected_components(pairs)
    lab = labels.select(
        "doc_id",
        _split_expr(F.col("doc_id")).alias("doc_split"),
        _split_expr(F.col("group_id")).alias("grp_split"),
        "group_id",
    )
    doc_stats = lab.agg(
        F.countDistinct("group_id").alias("n_groups"),
        F.sum((F.col("doc_split") != F.col("grp_split")).cast("long")).alias(
            "n_docs_moved"
        ),
    )
    l1 = lab.select(
        F.col("doc_id").alias("d1"),
        F.col("doc_split").alias("ds1"),
        F.col("grp_split").alias("gs1"),
    )
    l2 = lab.select(
        F.col("doc_id").alias("d2"),
        F.col("doc_split").alias("ds2"),
        F.col("grp_split").alias("gs2"),
    )
    pair_stats = (
        pairs.join(l1, "d1")
        .join(l2, "d2")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("ds1") != F.col("ds2")).cast("long")).alias(
                "leaked_pairs"
            ),
            F.sum((F.col("gs1") != F.col("gs2")).cast("long")).alias(
                "leaked_pairs_grouped"
            ),
        )
    )
    out = pair_stats.crossJoin(F.broadcast(doc_stats)).select(
        "n_pairs",
        "leaked_pairs",
        "leaked_pairs_grouped",
        "n_groups",
        "n_docs_moved",
    )
    return out


def virtual_epochs(
    spark: SparkSession, sf_dir: str, alpha: float = 0.7, target_frac: float = 1.0
) -> DataFrame:
    """The UP-sampling half of temperature mixing — temperature_resample
    thins over-represented feeds (acceptance capped at 1); this emits the
    replication manifest for under-represented ones: each doc appears
    floor(rate) times plus one more with probability frac(rate), where
    rate = boost_s x target_frac — "virtual epochs" as an actual
    (doc_id, source, epoch) roster a loader can shuffle and stream,
    deterministic because the fractional copy is the standard salted-md5
    ppm draw, not RNG.

    Shape: the per-source rate table is feed-count-bounded and broadcast;
    the copy count is decided inside the scan and the fan-out is an
    explode of a 1..n_copies sequence — output size is exactly the token
    budget the mixture dictates, and nothing shuffles. The rate lives as
    integer ppm from the floor onward (the temperature_resample
    contract), split into whole epochs (ppm div 1e6) and the fractional
    ppm remainder."""
    from ..functions.hashing import md5_long32

    shares = source_mixture_weights(spark, sf_dir, alpha=alpha).select(
        "source",
        F.floor(F.col("boost") * target_frac * 1e6).cast("long").alias("rppm"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    extra = (
        (
            md5_long32(F.concat(F.lit("vepoch|"), F.col("doc_id").cast("string")))
            % 1_000_000
        )
        < (F.col("rppm") % 1_000_000)
    ).cast("int")
    n_copies = (F.col("rppm") / 1_000_000).cast("long") + extra
    return (
        docs.join(F.broadcast(shares), "source")
        .withColumn("_n", n_copies)
        .filter(F.col("_n") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_e"),
        )
        .select("doc_id", "source", F.col("_e").cast("int").alias("epoch"))
    )


SHUFFLE_BUCKETS = 64  # training-order shards; scale to ~cluster partitions


def global_shuffle_order(
    spark: SparkSession, sf_dir: str, buckets: int = SHUFFLE_BUCKETS
) -> DataFrame:
    """Deterministic corpus-wide training-order shuffle — the step that
    turns a curated corpus into the (shard, position) order a data loader
    consumes. A true global random sort of 100 TB is a full-corpus
    single-ordering shuffle; the standard decomposition (terasort-style)
    is hash-bucket THEN sort within bucket: every doc hashes to one of
    ``buckets`` shards (scan-stage filterless map), and positions are a
    row_number over the bucket ordered by an independent second hash — so
    the expensive sort is per-shard (corpus/buckets rows), shards are
    written in parallel, and the loader reads shard files in bucket order
    for a full pass whose order is indistinguishable-from-random for any
    content-correlated property (both keys are md5 of salted doc_id, so
    no locality of source/lang/time survives). Reproducible end-to-end:
    re-running yields byte-identical order (the epoch salt rotates it —
    pass a different salt per epoch via the bucket/order strings).

    Output: (doc_id, bucket, pos) — pos is 1-based within bucket; the
    total order is (bucket, pos)."""
    from ..functions.hashing import md5_long32

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        (
            md5_long32(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
            % buckets
        ).cast("int").alias("bucket"),
        md5_long32(
            F.concat(F.lit("ord|"), F.col("doc_id").cast("string"))
        ).alias("_ord"),
    )
    w = Window.partitionBy("bucket").orderBy(F.col("_ord").asc(), F.col("doc_id").asc())
    return keyed.select(
        "doc_id", "bucket", F.row_number().over(w).alias("pos")
    )


HARD_NEG_K = 3  # hard negatives per anchor


def contrastive_hard_negatives(
    spark: SparkSession,
    sf_dir: str,
    k_neg: int = HARD_NEG_K,
    nprobe: int | None = None,
) -> DataFrame:
    """HARD-negative mining for contrastive training — the upgrade over
    contrastive_pairs' uniform bucket draw: for each anchor (a doc with a
    verified near-duplicate positive), the negatives are its most
    SIMILAR non-duplicate neighbors in embedding space — the examples a
    contrastive loss actually learns from (random negatives are trivially
    separable after the first epochs; hard-negative mining is standard in
    dense-retriever training, e.g. DPR/ANCE — public methods).

    Composition, all existing machinery: anchors come from the exact
    n-gram-Jaccard pair graph (anchor = d1, the contrastive_pairs
    convention); candidates from the anchor's nprobe nearest LEARNED IVF
    lists (the measured probe depth, never all-pairs); the anchor's OWN
    near-dup partners (either orientation) are anti-joined out — a
    near-duplicate is a positive, mining it as a negative would poison
    the loss; survivors rank by exact cosine (desc, vec_id asc) and the
    top k_neg ship. Embeddings and documents share the id space in the
    test corpora (vec_id == doc_id).

    Scale shape: anchors are pair-graph-bounded; the candidate join is
    the same cluster equi-join as knn_join_ivf_blocked (co-partitioned
    on cluster id at 100 TB); the anti-join keys on (anchor, partner) —
    pair-graph-sized, not corpus-sized; the rank window partitions by
    anchor over nprobe-list-bounded candidate sets.

    Output: (anchor, neg_rank, negative, cos_sim)."""
    from pyspark.sql import Window as W

    from ..functions.vectors import dot
    from .dedup import ngram_jaccard_pairs
    from .similarity import (
        IVF_JOIN_NPROBE,
        _audit_emb,
        _dist_structs_col,
        _with_nearest_centroid,
        learned_centroids,
    )

    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    anchors = pairs.select(F.col("d1").alias("anchor")).distinct()
    partners = (
        pairs.select(F.col("d1").alias("anchor"), F.col("d2").alias("partner"))
        .union(
            pairs.select(F.col("d2").alias("anchor"), F.col("d1").alias("partner"))
        )
        .distinct()
    )
    cents = learned_centroids(spark, sf_dir)
    emb = _audit_emb(spark, sf_dir)
    home = (
        _with_nearest_centroid(emb, cents, "embedding", "_b")
        .select("*", F.col("_b")["l"].alias("cluster"))
        .drop("_b")
    )
    aemb = anchors.join(emb, anchors["anchor"] == emb["vec_id"]).select(
        "anchor",
        F.col("embedding").alias("aemb"),
        F.col("nrm").alias("anrm"),
    )
    probes = _dist_structs_col(aemb, cents, "aemb", "_cdl").select(
        "anchor",
        "aemb",
        "anrm",
        F.explode(
            F.transform(
                F.slice(F.array_sort(F.col("_cdl")), 1, nprobe),
                lambda s: s["l"],
            )
        ).alias("probe"),
    )
    cand = (
        home.join(
            probes,
            (F.col("cluster") == F.col("probe"))
            & (F.col("vec_id") != F.col("anchor")),
        )
        .join(
            partners,
            (home["vec_id"] == partners["partner"])
            & (probes["anchor"] == partners["anchor"]),
            "left_anti",
        )
        .select(
            "anchor",
            F.col("vec_id").alias("negative"),
            (
                dot(F.col("embedding"), F.col("aemb"))
                / (F.col("nrm") * F.col("anrm"))
            ).alias("cos"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("anchor").orderBy(
            F.col("cos").desc(), F.col("negative").asc()
        )
    )
    return (
        cand.withColumn("rk", rk)
        .filter(F.col("rk") <= k_neg)
        .select(
            "anchor",
            F.col("rk").cast("int").alias("neg_rank"),
            "negative",
            F.round("cos", 4).alias("cos_sim"),
        )
    )


def contrastive_hard_negatives_vectorized(
    spark: SparkSession,
    sf_dir: str,
    k_neg: int = HARD_NEG_K,
    nprobe: int | None = None,
    n_clusters: int | None = None,
) -> DataFrame:
    """BLAS twin of contrastive_hard_negatives — the production mining
    shape (the knn_join_ivf_vectorized relationship): instead of the
    anchor×list equi-join + corpus-wide rank window (candidate volume =
    anchors × probed-list width, all of it shuffled to one window), the
    home lists COGROUP with the anchor probes on the cluster id — one
    (anchors × list) float64 matmul per learned list, partner/self
    masking inside the block, LOCAL top-k_neg per anchor per block — and
    the final merge window ranks <= nprobe·k_neg survivors per anchor.
    Executor memory is bounded by the widest list; the big candidate set
    never crosses a shuffle.

    Per-anchor cost is the probed-list width — at fixed n_lists that
    grows with the corpus, which is why production scales n_lists with
    corpus size (k ~ sqrt(N) up to 4096; learned_centroids' documented
    discipline) keeping list width ~constant; ``n_clusters`` exposes
    that contract directly (the knn_join_ivf_vectorized precedent) and
    the scaled-n_lists 10x probe in tests/test_scaling_probe.py /
    SCALE.md measures it. Same float contract as
    knn_join_ivf_vectorized: BLAS float64 agrees with the HOF fold to
    ~1 ulp; rounding to 4 decimals happens AFTER ranking, in Spark.

    Registered against the SAME oracle as the spec form — row-identical,
    not approximately so. Output: (anchor, neg_rank, negative, cos_sim).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window as W

    from .dedup import ngram_jaccard_pairs
    from .similarity import (
        IVF_JOIN_NPROBE,
        _audit_emb,
        _dist_structs_col,
        _with_nearest_centroid,
        learned_centroids,
    )

    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    anchors = pairs.select(F.col("d1").alias("anchor")).distinct()
    partners = (
        pairs.select(F.col("d1").alias("anchor"), F.col("d2").alias("partner"))
        .union(
            pairs.select(F.col("d2").alias("anchor"), F.col("d1").alias("partner"))
        )
        .distinct()
    )
    # per-anchor partner arrays: pair-graph bounded (an anchor's near-dup
    # group), so they ride the probe rows into the cogroup
    plists = partners.groupBy("anchor").agg(
        F.collect_set("partner").alias("plist")
    )
    cents = (
        learned_centroids(spark, sf_dir)
        if n_clusters is None
        else learned_centroids(spark, sf_dir, k=n_clusters)
    )
    emb = _audit_emb(spark, sf_dir)
    home = (
        _with_nearest_centroid(emb, cents, "embedding", "_b")
        .select("vec_id", "embedding", F.col("_b")["l"].alias("cluster"))
    )
    aemb = anchors.join(emb, anchors["anchor"] == emb["vec_id"]).select(
        "anchor", F.col("embedding").alias("aemb")
    )
    probes = (
        _dist_structs_col(aemb, cents, "aemb", "_cdl")
        .select(
            "anchor",
            "aemb",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(F.col("_cdl")), 1, nprobe),
                    lambda s: s["l"],
                )
            ).alias("probe"),
        )
        .join(plists, "anchor", "left")
    )

    def per_list(home_pdf: pd.DataFrame, probe_pdf: pd.DataFrame) -> pd.DataFrame:
        if home_pdf.empty or probe_pdf.empty:
            return pd.DataFrame({"anchor": [], "negative": [], "cos": []}).astype(
                {"anchor": "int64", "negative": "int64", "cos": "float64"}
            )
        hid = home_pdf["vec_id"].to_numpy()
        H = np.stack(home_pdf["embedding"].to_numpy()).astype(np.float64)
        aid = probe_pdf["anchor"].to_numpy()
        A = np.stack(probe_pdf["aemb"].to_numpy()).astype(np.float64)
        hn = np.sqrt((H * H).sum(axis=1))
        an = np.sqrt((A * A).sum(axis=1))
        C = (A @ H.T) / np.outer(an, hn)
        # self must not be its own negative
        C[aid[:, None] == hid[None, :]] = -np.inf
        # a near-dup partner is a POSITIVE — mask it out of the negatives
        hpos = {v: i for i, v in enumerate(hid)}
        for r, pl in enumerate(probe_pdf["plist"]):
            if pl is None:
                continue
            for p in pl:
                i = hpos.get(p)
                if i is not None:
                    C[r, i] = -np.inf
        kk = min(k_neg, H.shape[0])
        anc, neg, cos = [], [], []
        for i in range(len(aid)):
            idx = np.lexsort((hid, -C[i]))[:kk]
            idx = idx[np.isfinite(C[i][idx])]
            anc.extend([aid[i]] * len(idx))
            neg.extend(hid[idx])
            cos.extend(C[i][idx])
        return pd.DataFrame({"anchor": anc, "negative": neg, "cos": cos})

    local = (
        home.groupBy("cluster")
        .cogroup(probes.groupBy("probe"))
        .applyInPandas(per_list, schema="anchor long, negative long, cos double")
    )
    rk = F.row_number().over(
        W.partitionBy("anchor").orderBy(F.col("cos").desc(), F.col("negative").asc())
    )
    return (
        local.withColumn("rk", rk)
        .filter(F.col("rk") <= k_neg)
        .select(
            "anchor",
            F.col("rk").cast("int").alias("neg_rank"),
            "negative",
            F.round("cos", 4).alias("cos_sim"),
        )
    )


DIVERSITY_PER_CLUSTER = 5


def diversity_sample(
    spark: SparkSession,
    sf_dir: str,
    per_cluster: int = DIVERSITY_PER_CLUSTER,
) -> DataFrame:
    """Cluster-balanced DIVERSITY sampling — equal quota per LEARNED
    embedding cluster instead of a uniform corpus draw: a uniform sample
    of a skewed corpus is mostly the dominant mode, while per-cluster
    quotas guarantee every semantic region is represented (the standard
    seed-set/eval-set construction when you need coverage, not
    proportionality; fixed_k_per_stratum's cross-modal sibling — strata
    here are learned geometry, not a metadata column).

    Within each cluster the pick is the usual salted-md5 order (h asc,
    vec_id asc) — deterministic, replayable, and independent of any
    content property. Shape: one assignment scan via
    _with_nearest_centroid (literal centroids folded into the scan up to
    IVF_LITERAL_K_MAX lists; the broadcast-DATA join path above that —
    the production strategy at scaled n_lists) + ONE cluster-keyed
    shuffle whose per-partition width is the
    list width — bounded in production by scaling n_lists with the corpus
    (learned_centroids' discipline), exactly the IVF-list partitioning
    the serving layout already relies on. Clusters smaller than the quota
    contribute all their members.

    Output: (cluster, pick_rank, vec_id)."""
    from .similarity import _with_nearest_centroid, learned_centroids

    cents = learned_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    home = _with_nearest_centroid(emb, cents, "embedding", "_b").select(
        "vec_id", F.col("_b")["l"].cast("int").alias("cluster")
    )
    keyed = home.withColumn(
        "_h",
        md5_long32(F.concat(F.lit("divs|"), F.col("vec_id").cast("string"))),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("_h").asc(), F.col("vec_id").asc()
    )
    return (
        keyed.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= per_cluster)
        .select("cluster", F.col("pick_rank").cast("int").alias("pick_rank"), "vec_id")
    )


def shard_manifest(
    spark: SparkSession, sf_dir: str, buckets: int = SHUFFLE_BUCKETS
) -> DataFrame:
    """Loader-facing manifest of the training-order shuffle's shards: per
    bucket (the shard global_shuffle_order assigns), the document count
    and token mass a data loader uses to plan epoch passes, plus each
    shard's share of the corpus token budget — also the hash-balance
    audit (md5 bucketing should land every shard within a few percent of
    corpus/buckets; a skewed manifest means the salt or the bucket count
    needs attention BEFORE a 100 TB shuffle is materialized). One scan,
    one bucket-keyed aggregate (bucket-count-sized output).

    Output: (bucket, n_docs, n_tokens, token_share)."""
    from ..functions.hashing import md5_long32
    from ..functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    keyed = docs.select(
        (
            md5_long32(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
            % buckets
        ).cast("int").alias("bucket"),
        F.size(tokens("text")).alias("n_tok"),
    )
    per = keyed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").cast("double").alias("tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "bucket",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("tot"), 6).alias("token_share"),
    )


def _clean_survivors(
    spark: SparkSession, sf_dir: str, decon_n: int = 8
) -> DataFrame:
    """Stages 1-3 of the composed cleaning pipeline (quality gate →
    boilerplate scrub → Bloom decontamination on the scrubbed text),
    shared by pipeline_clean_corpus and its near-dup twin so the two
    manifests cannot drift. Returns the survivor frame
    (doc_id, clean_text); the callers differ only in the dedup stage."""
    from ..functions.textfns import token_segments, tokens, word_shingles
    from .dedup import bloom_hit_expr, eval_bloom_bitmap
    from .text import (
        BOILERPLATE_SEG_TOKENS,
        boilerplate_flagged_sets,
        quality_logit_expr,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    accepted = docs.filter(quality_logit_expr("text") >= 0)
    bset = boilerplate_flagged_sets(spark, sf_dir)
    segs = accepted.withColumn(
        "segs", token_segments(tokens("text"), BOILERPLATE_SEG_TOKENS)
    ).join(F.broadcast(bset), "source", "left")
    kept = F.when(F.col("bset").isNull(), F.col("segs")).otherwise(
        F.filter(F.col("segs"), lambda s: ~F.array_contains(F.col("bset"), s))
    )
    scrubbed = segs.select(
        "doc_id", F.array_join(kept, " ").alias("clean_text")
    )
    eval_sh = docs.select(
        "doc_id", word_shingles(tokens("text"), decon_n).alias("shingles")
    )
    bitmap = eval_bloom_bitmap(spark, sf_dir, sh=eval_sh)
    return (
        scrubbed.withColumn(
            "_sh", word_shingles(tokens("clean_text"), decon_n)
        )
        .filter(~bloom_hit_expr(F.col("_sh"), bitmap))
        .drop("_sh")
    )


def pipeline_clean_corpus(
    spark: SparkSession, sf_dir: str, decon_n: int = 8
) -> DataFrame:
    """The COMPOSED batch cleaning pipeline — the batch twin of
    streaming.documents.cleaned_ingest_stream, stage for stage:

        learned quality gate → boilerplate scrub → Bloom decontaminate
        (on the SCRUBBED text) → exact dedup on the recomputed content
        fingerprint

    This is the manifest a production corpus build ships: every stage is
    an existing, individually-oracled operator's expression, composed
    over the corpus in the order the ingest stream runs them, so the
    batch backfill and the streaming frontier admit the same content.
    The boilerplate model (flagged sets) comes from the FULL corpus (the
    periodic batch model pass); the Bloom bitmap is built from the same
    eval split every decontamination operator here uses — eval docs drop
    themselves by construction. The contamination unit is the exact
    ``decon_n``-gram (default 8): the single-operator gates default to
    the repo-wide 3-shingle, but on a shared-vocabulary corpus 3-grams
    collide naturally (measured: 274 of 276 quality survivors flagged at
    sf0.001), so the COMPOSED pipeline keys on the longer unit a
    production decontamination pass uses (8-13-gram overlap is the
    standard published practice) — same bitmap machinery, same bits
    discipline, different shingle width. Dedup keys on the md5 of the scrubbed
    text (a pre-scrub fingerprint would keep boilerplate-only variants
    apart — the exact bug the streaming gate fixed in r12), carrier =
    min doc_id (batch rule; the stream keeps first arrival).

    100 TB shape: quality + scrub are scan-stage expressions over one
    corpus pass (flagged sets broadcast); the Bloom probe folds the
    bitmap into the same scan below the 64 MB broadcast cap (the
    distributed word-table path above it); the only corpus shuffle is
    the final fp-keyed aggregate, map-side partial. Admit-set parity
    with the wired stream is pinned in tests/test_streaming.py.
    Output: (doc_id, fp, n_merged, clean_text)."""
    survivors = _clean_survivors(spark, sf_dir, decon_n)
    return (
        survivors.withColumn(
            "fp", F.md5(F.trim(F.lower(F.col("clean_text"))))
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").cast("bigint").alias("n_merged"),
            F.min_by("clean_text", "doc_id").alias("clean_text"),
        )
        .select("doc_id", "fp", "n_merged", "clean_text")
    )


def _neardup_kept(
    spark: SparkSession, sf_dir: str, decon_n: int = 8
) -> DataFrame:
    """Stage 4 of the near-dup pipeline: the post-LSH carrier set
    (doc_id, clean_text, _rep = component members represented) over the
    stage-1-3 survivors — shared by pipeline_clean_corpus_neardup and its
    funnel report so the manifest and the observability row count the
    same carriers by construction."""
    from ..functions.caching import bounded_persist
    from ..functions.textfns import tokens, word_shingles
    from .dedup import (
        SHINGLE_N,
        connected_components,
        lsh_pairs_from_hashed_shingles,
    )

    # Persisted: read by the shingle pass, the keep-join, and the fp agg.
    surv = bounded_persist(
        _clean_survivors(spark, sf_dir, decon_n), "pcc_survivors", scope=sf_dir
    )
    # Same staged-tokens + hashed-shingle form as dedup._shingle_hashes,
    # over clean_text (tokens staged as an attribute: a HOF lambda
    # re-evaluates closure sub-expressions per element).
    sh = bounded_persist(
        surv.withColumn("_t", tokens("clean_text")).select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    word_shingles(F.col("_t"), SHINGLE_N),
                    lambda s: F.conv(
                        F.substring(F.md5(s), 1, 8), 16, 10
                    ).cast("long"),
                )
            ).alias("hs"),
        ),
        "pcc_neardup_shingles",
        scope=sf_dir,
    )
    pairs = lsh_pairs_from_hashed_shingles(sh, scope=sf_dir).select("d1", "d2")
    groups = connected_components(pairs)
    gsz = groups.groupBy("group_id").agg(
        F.count("*").cast("bigint").alias("_gsz")
    )
    return (
        surv.join(groups, "doc_id", "left")
        .filter(F.col("group_id").isNull() | (F.col("group_id") == F.col("doc_id")))
        .join(gsz, "group_id", "left")
        .select(
            "doc_id",
            "clean_text",
            F.coalesce(F.col("_gsz"), F.lit(1).cast("bigint")).alias("_rep"),
        )
    )


def pipeline_clean_corpus_neardup(
    spark: SparkSession, sf_dir: str, decon_n: int = 8
) -> DataFrame:
    """pipeline_clean_corpus with the FUZZY dedup stage production corpus
    builds run in the main funnel (VERDICT r12 #4): between the Bloom
    decontamination and the exact-fp aggregate, a MinHash-LSH keep-first
    pass over the SCRUBBED text —

        quality gate → boilerplate scrub → Bloom decontaminate →
        MinHash-LSH near-dup keep-first → exact-fp dedup

    The near-dup stage is minhash_lsh_pairs' exact machinery
    (lsh_pairs_from_hashed_shingles: 16-perm signatures, 4×4 banding,
    hashed-shingle Jaccard ≥ 0.5 verify) over the survivors' clean_text,
    with dedup_groups' carrier rule: connected components over the
    verified pair graph, keep the min-doc_id carrier per component
    (singletons and sub-3-token docs keep themselves). The trailing exact
    stage still earns its keep: docs too short to shingle never enter the
    pair graph, so byte-identical short docs collapse only on the fp.

    100 TB shape: stages 1-3 are pipeline_clean_corpus's (one corpus scan,
    broadcast gates); the near-dup stage adds the LSH pipeline's known
    shuffles over the SURVIVOR set only (signature agg, banded self-join,
    two SMJ verify joins — nothing all-pairs, SCALE.md's lsh inventory)
    plus the CC rounds over the near-dup edge list (component-diameter
    bounded, tiny vs the corpus). Output: (doc_id, fp, n_merged,
    n_docs_represented, clean_text) — n_merged counts exact-fp copies
    among near-dup carriers; n_docs_represented counts every survivor the
    carrier stands for (its component members + itself), the number a
    re-crawl audit wants."""
    kept = _neardup_kept(spark, sf_dir, decon_n)
    return (
        kept.withColumn("fp", F.md5(F.trim(F.lower(F.col("clean_text")))))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").cast("bigint").alias("n_merged"),
            F.sum("_rep").cast("bigint").alias("n_docs_represented"),
            F.min_by("clean_text", "doc_id").alias("clean_text"),
        )
        .select(
            "doc_id", "fp", "n_merged", "n_docs_represented", "clean_text"
        )
    )


def pipeline_clean_report_neardup(
    spark: SparkSession, sf_dir: str, decon_n: int = 8
) -> DataFrame:
    """Stage-count funnel for the NEAR-DUP pipeline (the
    pipeline_clean_report sibling, completing the capstone symmetry):
    total → quality-accepted → decontaminated → near-dup carriers →
    distinct admitted fingerprints. The new stage-4 row is the fuzzy
    stage's drop volume; (decontaminated − carriers) is re-crawled
    NEAR-duplicate mass, (carriers − fps) the residual byte-identical
    shorts the trailing exact stage collapses.

    Shape: stages 1-3 count off one gate scan (the pipeline's own
    expressions); stage 4-5 count the shared carrier frame
    (_neardup_kept — the manifest and this report can never disagree).
    Three single-row aggregates crossJoined, stage rows via explode of a
    literal struct array (never an N-way union that clones a subtree).
    Output: (stage, label, n_docs)."""
    from .text import quality_logit_expr

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a01 = docs.agg(
        F.count("*").cast("bigint").alias("n0"),
        F.sum(
            F.when(quality_logit_expr("text") >= 0, 1).otherwise(0)
        ).cast("bigint").alias("n1"),
    )
    surv = _clean_survivors(spark, sf_dir, decon_n)
    a2 = surv.agg(F.count("*").cast("bigint").alias("n2"))
    kept = _neardup_kept(spark, sf_dir, decon_n)
    a34 = kept.agg(
        F.count("*").cast("bigint").alias("n3"),
        F.countDistinct(
            F.md5(F.trim(F.lower(F.col("clean_text"))))
        ).cast("bigint").alias("n4"),
    )
    stages = F.array(
        F.struct(F.lit(1).alias("stage"), F.lit("total").alias("label"), F.col("n0").alias("n_docs")),
        F.struct(F.lit(2).alias("stage"), F.lit("quality_accepted").alias("label"), F.col("n1").alias("n_docs")),
        F.struct(F.lit(3).alias("stage"), F.lit("decontaminated").alias("label"), F.col("n2").alias("n_docs")),
        F.struct(F.lit(4).alias("stage"), F.lit("neardup_carriers").alias("label"), F.col("n3").alias("n_docs")),
        F.struct(F.lit(5).alias("stage"), F.lit("admitted_fps").alias("label"), F.col("n4").alias("n_docs")),
    )
    return (
        a01.crossJoin(a2)
        .crossJoin(a34)
        .select(F.explode(stages).alias("s"))
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.label").alias("label"),
            F.col("s.n_docs").cast("bigint").alias("n_docs"),
        )
    )


def training_export_plan(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 512,
    buckets: int = SHUFFLE_BUCKETS,
) -> DataFrame:
    """The OUTPUT-side capstone composition — what a trainer is actually
    handed: the cleaned corpus (pipeline_clean_corpus's admitted
    carriers) laid out in training order (global_shuffle_order's terasort
    decomposition over the carrier ids) and packed into fixed-token-
    budget bins per shard (pack_sequences' per-shard cumulative window,
    here over the SHUFFLED order and the CLEAN text's token counts).
    Together with pipeline_clean_corpus this closes the loop: raw corpus
    → cleaned manifest → shard/bin layout, every stage an existing
    oracled operator's expression.

    100 TB shape: the cleaning stages are pipeline_clean_corpus's (one
    corpus scan + the fp aggregate); the shuffle/pack adds ONE
    bucket-keyed window whose partitions are corpus/buckets rows each
    (buckets scale with the corpus — SHUFFLE_BUCKETS' contract), and the
    bin audit is a (bucket, bin)-keyed partial aggregate. No global
    sort, no driver materialization. Output: (bucket, bin, n_docs,
    n_tokens) — the per-bin capacity audit a loader plans epochs with."""
    clean = pipeline_clean_corpus(spark, sf_dir)
    keyed = export_keyed(clean, buckets)
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("o").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Integer bin math: the cumulative token count and the budget are both
    # integral and nonnegative, so `div` (integral division) gives the bin
    # exactly — no double rounding, no power-of-two budget requirement,
    # bit-identical across engines at any cumulative magnitude.
    binned = keyed.withColumn(
        "_cum0", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn("bin", export_bin_expr("_cum0", budget))
    return binned.groupBy("bucket", "bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


def export_keyed(df: DataFrame, buckets: int = SHUFFLE_BUCKETS) -> DataFrame:
    """The export layout keying — (doc_id, n_tokens, bucket, o) from a
    (doc_id, clean_text) frame: whitespace token count, the terasort
    shuffle bucket (md5 of 'shuf|doc_id' mod buckets) and the in-bucket
    order key (md5 of 'ord|doc_id'). ONE definition shared by
    training_export_plan and streaming.export's incremental twin, so the
    batch backfill and the streaming frontier can never key differently."""
    from ..functions.hashing import md5_long32
    from ..functions.textfns import tokens

    return df.select(
        "doc_id",
        F.size(tokens("clean_text")).alias("n_tokens"),
        (
            md5_long32(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
            % buckets
        ).cast("int").alias("bucket"),
        md5_long32(
            F.concat(F.lit("ord|"), F.col("doc_id").cast("string"))
        ).alias("o"),
    )


def export_bin_expr(cum0_col: str, budget: int):
    """bin = cum0 DIV budget — integral division of the nonnegative
    cumulative token count, exact in any engine (shared with the
    streaming twin; see training_export_plan)."""
    return F.expr(f"CAST({cum0_col} DIV {int(budget)} AS INT)")


def pipeline_clean_report(
    spark: SparkSession, sf_dir: str, decon_n: int = 8
) -> DataFrame:
    """Stage-count observability for pipeline_clean_corpus — the funnel a
    corpus owner reads after a cleaning run (pipeline_funnel's sibling
    for the composed pipeline's exact stages): total → quality-accepted
    → decontaminated (``decon_n``-gram Bloom on the scrubbed text,
    default 8 — pass the same width as the pipeline run being observed)
    → distinct admitted fingerprints. The scrub stage changes text, not
    row count,
    so its effect shows up in the later stages' membership, and the
    dedup stage's drop (survivors − fps) is re-crawl volume.

    Shape: the same gate expressions as the pipeline, but the output is
    four conditional aggregates — the corpus is scanned once for the
    flag battery plus the model/bitmap builds the pipeline itself needs;
    stage rows emit via explode of a literal struct array (the
    pipeline_funnel pattern — never an N-way union that clones the
    aggregate). Output: (stage, label, n_docs)."""
    from ..functions.textfns import token_segments, tokens, word_shingles
    from .dedup import bloom_hit_expr, eval_bloom_bitmap
    from .text import (
        BOILERPLATE_SEG_TOKENS,
        boilerplate_flagged_sets,
        quality_logit_expr,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    bset = boilerplate_flagged_sets(spark, sf_dir)
    eval_sh = docs.select(
        "doc_id", word_shingles(tokens("text"), decon_n).alias("shingles")
    )
    bitmap = eval_bloom_bitmap(spark, sf_dir, sh=eval_sh)

    segs = token_segments(tokens("text"), BOILERPLATE_SEG_TOKENS)
    joined = docs.withColumn("_segs", segs).join(
        F.broadcast(bset), "source", "left"
    )
    kept = F.when(F.col("bset").isNull(), F.col("_segs")).otherwise(
        F.filter(F.col("_segs"), lambda s: ~F.array_contains(F.col("bset"), s))
    )
    flagged = joined.select(
        "doc_id",
        (quality_logit_expr("text") >= 0).alias("q_ok"),
        F.array_join(kept, " ").alias("clean_text"),
    ).withColumn(
        "decon_ok",
        ~bloom_hit_expr(word_shingles(tokens("clean_text"), decon_n), bitmap),
    )
    agg = flagged.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(F.col("q_ok"), 1).otherwise(0)).alias("n1"),
        F.sum(
            F.when(F.col("q_ok") & F.col("decon_ok"), 1).otherwise(0)
        ).alias("n2"),
        F.countDistinct(
            F.when(
                F.col("q_ok") & F.col("decon_ok"),
                F.md5(F.trim(F.lower(F.col("clean_text")))),
            )
        ).alias("n3"),
    )
    stages = F.array(
        F.struct(F.lit(1).alias("stage"), F.lit("total").alias("label"), F.col("n0").alias("n_docs")),
        F.struct(F.lit(2).alias("stage"), F.lit("quality_accepted").alias("label"), F.col("n1").alias("n_docs")),
        F.struct(F.lit(3).alias("stage"), F.lit("decontaminated").alias("label"), F.col("n2").alias("n_docs")),
        F.struct(F.lit(4).alias("stage"), F.lit("admitted_fps").alias("label"), F.col("n3").alias("n_docs")),
    )
    return agg.select(F.explode(stages).alias("s")).select(
        F.col("s.stage").alias("stage"),
        F.col("s.label").alias("label"),
        F.col("s.n_docs").cast("bigint").alias("n_docs"),
    )
