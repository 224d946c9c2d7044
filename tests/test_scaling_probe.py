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
    text,
)

SCALE = 10
MAX_RATIO = 35.0  # linear ≈ 10, quadratic ≈ 100


@pytest.fixture(scope="module")
def scaled_dirs(spark, tmp_path_factory):
    """1× = the sf0.1 documents table re-written locally (so both sides
    read identically-laid-out parquet); 10× = SCALE perturbed copies with
    disjoint doc_id ranges. The perturbation appends a copy-specific token
    so copies are near-duplicates of the original, not byte-exact ones —
    the LSH/simhash candidate structure stays realistic instead of
    collapsing into one giant bucket of identical fingerprints."""
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    root = tmp_path_factory.mktemp("scaling")
    one_dir = str(root / "sf1x")
    ten_dir = str(root / "sf10x")
    base.write.mode("overwrite").parquet(os.path.join(one_dir, "documents.parquet"))
    copies = base.crossJoin(
        spark.range(SCALE).select(F.col("id").alias("copy"))
    ).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copytok"), F.col("copy").cast("string")).alias(
            "text"
        ),
        "lang",
        "source",
        (F.col("n_chars") + 9).alias("n_chars"),
    )
    copies.write.mode("overwrite").parquet(
        os.path.join(ten_dir, "documents.parquet")
    )
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.write.mode("overwrite").parquet(
        os.path.join(one_dir, "embeddings.parquet")
    )
    # jitter dim 0 per copy: copies are near-identical vectors (cosine
    # ~0.9999), the adversarial dup-cluster shape for pair generators
    emb.crossJoin(spark.range(SCALE).select(F.col("id").alias("copy"))).select(
        (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x + F.when(i == 0, F.col("copy") * 0.01).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(os.path.join(ten_dir, "embeddings.parquet"))
    return one_dir, ten_dir


def _warm_time(fn, spark, sf_dir):
    fn(spark, sf_dir).count()  # warm: JIT, codegen, file listing
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
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
    ],
)
def test_corpus_operator_scales_subquadratically(spark, scaled_dirs, name, fn):
    one_dir, ten_dir = scaled_dirs
    t1 = _warm_time(fn, spark, one_dir)
    t10 = _warm_time(fn, spark, ten_dir)
    ratio = t10 / max(t1, 1e-3)
    assert ratio < MAX_RATIO, (
        f"{name}: 10x corpus cost {ratio:.1f}x the 1x run "
        f"({t1:.2f}s -> {t10:.2f}s) — growth order regressed"
    )
