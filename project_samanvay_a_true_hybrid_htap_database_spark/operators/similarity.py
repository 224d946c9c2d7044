"""Similarity search over embedding columns (array<float>).

Extension beyond the reference surface (no vector support there —
SURVEY.md §2.4). Two paths:

- brute-force top-k: exact cosine against every vector. The baseline and
  the verifier for approximate methods; one pass over the table, no shuffle
  (the query vector is a literal folded into the plan).
- IVF-style top-k: prune to the query's coarse partition (here ``label`` —
  at scale, a centroid assignment produced by a k-means pre-pass) and search
  only inside it. This is the 100 TB path: partition pruning on the cluster
  id column means the scan touches only matching files.

All math via functions/vectors.py higher-order functions — JVM codegen,
no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, lit_doubles
from ..sources import load_table

TOP_K = 10
QUERY_VEC_ID = 0


def _index_dir(tag: str, sf_dir: str) -> str:
    """Temp location for a materialized index layout, keyed by the SOURCE
    FILE's identity (size + mtime), not just the sf dir name: the test
    harness regenerates the parquet between rounds in place (it did in
    round 4 — TESTDATA.md), and an index dir keyed by name alone would
    silently serve the previous generation's rows."""
    import os
    import tempfile

    base = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_size}_{st.st_mtime_ns}"
    except OSError:
        fp = "nostat"
    return os.path.join(tempfile.gettempdir(), f"samanvay_{tag}_{base}_{fp}")


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int):
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding", "label").head()
    return row["embedding"], row["label"]


def ann_bruteforce_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k for one query vector. Deterministic tie-break on
    vec_id so the result set is stable across engines."""
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    emb = load_table(spark, sf_dir, "embeddings")
    q = lit_doubles(qvec)
    scored = (
        emb.filter(F.col("vec_id") != vec_id)
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """IVF-pruned top-k: search only the query's coarse cluster — since r9
    the LEARNED kmeans cluster (learned_centroids), not the synthetic
    ``label`` column the r8 recall audit measured at 0.08 (VERDICT r8 #3/#4).
    At scale the table is written partitioned by cluster id
    (build_ivf_index), so this is a partition-pruned scan of
    ~1/n_clusters of the data. Centroids enter via _dist_structs_col's
    per-k strategy (literals at probe-scale k, broadcast data above);
    each row's cluster is the standard rounded-L2 argmin."""
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    cents = learned_centroids(spark, sf_dir)
    qcluster = _query_cluster(spark, sf_dir, vec_id, cents)
    emb = load_table(spark, sf_dir, "embeddings")
    q = lit_doubles(qvec)
    scored = (
        _with_nearest_centroid(
            emb.filter(F.col("vec_id") != vec_id), cents, "embedding", "_b"
        )
        .filter(F.col("_b")["l"] == qcluster)
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def _query_cluster(spark: SparkSession, sf_dir: str, vec_id: int, cents: list) -> int:
    """The query vector's learned cluster, computed by the SAME Spark
    argmin expression every corpus row uses (a one-row job, like
    _query_vector's fetch) — never a Python reimplementation, whose
    decimal rounding could disagree with F.round at a .5e-6 boundary.
    Returns a plain int so the indexed path pushes a LITERAL cluster id
    into PartitionFilters."""
    row = (
        _with_nearest_centroid(
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") == vec_id
            ),
            cents,
            "embedding",
            "_b",
        )
        .select(F.col("_b")["l"].alias("l"))
        .head()
    )
    return int(row["l"])


def knn_join_blocked(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """k-NN join inside blocks: for every vector, its k nearest neighbors
    within the same label block (rank by cosine desc, vec_id tie-break).
    The blocked shape is how a full kNN-join runs at 100 TB — candidates
    from a coarse quantizer, exact rerank inside.

    RECALL VERDICT (r13, VERDICT r12 #5): NOT the recommended path on
    this corpus. The `label` column is a random blocking, not a semantic
    clustering — measured mean recall@3 = 0.08 (RECALL_r12
    `label_blocking`, ≈ the 1/n_labels floor). Production kNN joins
    should use the LEARNED quantizer twin knn_join_ivf_vectorized
    (k-means lists + multi-probe; recall measured head-to-head at the
    same k in RECALL_r13 `learned_ivf_join`, via
    knn_join_ivf_recall_audit). This form stays as the blocking-agnostic
    template — correct whenever the blocking key IS semantic — and as
    the oracle twin of knn_join_vectorized."""
    from pyspark.sql import Window

    from ..functions.vectors import dot, norm

    # Norms are per-vector: compute them once before the join (n ops) instead
    # of inside cosine() per pair (2n² ops). Same double math, same values.
    # No persist: the norm projection is O(n·d) — cheaper to recompute per
    # join side than to materialize.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label", norm(F.col("embedding")).alias("nrm")
    )
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), on="label")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("nbr"),
            (
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("nbr").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("src", "nbr", "rk", F.round("cos", 4).alias("cos_sim"))
    )


LSH_PLANES = 4  # 16 buckets — sized so test-SF buckets stay populated


def _sign_bucket(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: bit i = (dot(v, plane_i) >= 0). The planes are
    literal constants folded into the plan — no broadcast, no shuffle; the
    bucket computation is a single projection over the scan."""
    from ..functions.vectors import dot as vdot

    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = lit_doubles(plane)
        bucket = bucket + F.when(
            vdot(vec_col, p) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Sign-LSH pruned top-k: search only vectors whose hyperplane-sign
    bucket equals the query's. The data-independent complement to
    ann_ivf_topk (no clustering pre-pass needed): at 100 TB the table is
    written partitioned by bucket, so this scan is partition-pruned to
    ~1/2^planes of the data. Recall is probabilistic — the exact
    brute-force twin (ann_bruteforce_topk) is the verifier."""
    from ..functions.hashing import hyperplanes

    planes = hyperplanes(LSH_PLANES, 64)
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(float(a) * b for a, b in zip(qvec, plane)) >= 0:
            qbucket |= 1 << i
    emb = load_table(spark, sf_dir, "embeddings")
    q = lit_doubles(qvec)
    scored = (
        emb.filter(F.col("vec_id") != vec_id)
        .filter(_sign_bucket(F.col("embedding"), planes) == qbucket)
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def build_lsh_index(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> str:
    """One-time materialization of the sign-LSH bucket layout: embeddings
    written to parquet PARTITIONED BY (bucket), bucket = hyperplane sign
    bits. This is what makes the "prunes to 1/2^planes of the data" claim
    physically real: a query filtering on bucket touches only that bucket's
    files via Catalyst partition pruning — the unindexed ann_lsh_topk
    recomputes the bucket per row over a full scan, which filters rows but
    still reads every byte. At 100 TB this is the difference between a 6 TB
    scan and a 100 TB scan per query. Idempotent: returns the existing
    layout if already built (keyed by the sf dir name)."""
    import os
    import tempfile

    from ..functions.hashing import hyperplanes

    if out_dir is None:
        out_dir = _index_dir(f"lsh_index_p{LSH_PLANES}", sf_dir)
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    planes = hyperplanes(LSH_PLANES, 64)
    emb = load_table(spark, sf_dir, "embeddings")
    (
        emb.withColumn("bucket", _sign_bucket(F.col("embedding"), planes))
        # one file per bucket partition at test SF; at scale the shuffle-free
        # write produces per-task files inside each bucket dir, which is fine
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def ann_lsh_indexed_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """ann_lsh_topk over the materialized bucket layout (build_lsh_index):
    the bucket predicate becomes a partition filter, so the scan reads ~
    1/2^planes of the files instead of computing 2n² multiply-adds of
    bucket projection over the full table. Same rows as ann_lsh_topk (same
    planes, same bucket function) — shares its oracle. tests/test_plans.py
    asserts the PartitionFilters actually appear in the scan."""
    from ..functions.hashing import hyperplanes

    index_dir = build_lsh_index(spark, sf_dir)
    planes = hyperplanes(LSH_PLANES, 64)
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(float(a) * b for a, b in zip(qvec, plane)) >= 0:
            qbucket |= 1 << i
    emb = spark.read.parquet(index_dir)
    q = lit_doubles(qvec)
    scored = (
        emb.filter(F.col("bucket") == qbucket)  # partition-pruned
        .filter(F.col("vec_id") != vec_id)
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def build_ivf_index(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> str:
    """One-time materialization of the IVF list layout: embeddings written
    partitioned by their LEARNED coarse cluster id — the fixed-round Lloyd
    assignment from learned_centroids (since r9; the r8 layout partitioned
    by the synthetic ``label``, which the recall audit measured at 0.08 —
    a random split makes a real-looking but useless index). ann_ivf_topk
    filters rows over a full scan; over this layout the cluster predicate
    is a partition filter, so a query reads ~1/n_clusters of the FILES —
    the inverted-file structure every production vector store builds.
    The centroid learning itself is part of this build cost (memoized per
    table identity). Idempotent per sf dir, like build_lsh_index."""
    import os

    if out_dir is None:
        out_dir = _index_dir("ivf_kmeans_index", sf_dir)
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    cents = learned_centroids(spark, sf_dir)
    emb = _with_nearest_centroid(
        load_table(spark, sf_dir, "embeddings"), cents, "embedding", "_b"
    ).select("*", F.col("_b")["l"].alias("cluster")).drop("_b")
    (
        emb.repartition("cluster")
        .write.partitionBy("cluster")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def ann_ivf_indexed_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """ann_ivf_topk over the materialized list layout (build_ivf_index):
    same rows, but the learned-cluster predicate prunes partitions instead
    of filtering a full scan — at 100 TB the difference between reading
    one IVF list and reading the table. Shares ann_ivf_topk's oracle."""
    index_dir = build_ivf_index(spark, sf_dir)
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    cents = learned_centroids(spark, sf_dir)
    qcluster = _query_cluster(spark, sf_dir, vec_id, cents)
    emb = spark.read.parquet(index_dir)
    q = lit_doubles(qvec)
    scored = (
        emb.filter(F.col("cluster") == qcluster)  # partition-pruned
        .filter(F.col("vec_id") != vec_id)
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def _query_probe_clusters(
    spark: SparkSession, sf_dir: str, vec_id: int, cents: list, nprobe: int
) -> list[int]:
    """The query vector's nprobe nearest learned clusters, by the SAME
    Spark ranking expression every probe list uses (one-row job, the
    _query_cluster convention). Plain ints, so the indexed path pushes a
    LITERAL IN-list into PartitionFilters."""
    from ..sources import load_table

    row = (
        _dist_structs_col(
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") == vec_id
            ),
            cents,
            "embedding",
            "_cdl",
        )
        .select(
            F.transform(
                F.slice(F.array_sort(F.col("_cdl")), 1, nprobe),
                lambda s: s["l"],
            ).alias("ls")
        )
        .head()
    )
    return [int(x) for x in row["ls"]]


def ann_ivf_multiprobe_topk(
    spark: SparkSession,
    sf_dir: str,
    vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    nprobe: int | None = None,
) -> DataFrame:
    """Multi-probe IVF serving (r10): the single-query form of the probe
    depth the measured curve endorses (RECALL_r10.json — nprobe=3 recalls
    0.6733 vs single-list 0.2533). The query's nprobe nearest learned
    lists become a literal IN-list over build_ivf_index's partitioned
    layout, so the scan reads exactly nprobe partitions' FILES
    (PartitionFilters, plan-asserted) — at 100 TB, nprobe IVF lists
    instead of the table, the standard FAISS-style nprobe>1 serving
    shape. Completes the multiprobe pair: ann_lsh_multiprobe_topk widens
    by Hamming-1 buckets, this widens by centroid-distance rank."""
    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    index_dir = build_ivf_index(spark, sf_dir)
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    cents = learned_centroids(spark, sf_dir)
    probes = _query_probe_clusters(spark, sf_dir, vec_id, cents, nprobe)
    emb = spark.read.parquet(index_dir)
    q = lit_doubles(qvec)
    scored = (
        emb.filter(F.col("cluster").isin(probes))  # nprobe-partition pruned
        .filter(F.col("vec_id") != vec_id)
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


PROJ_DIMS = 16
PROJ_SEED = 11


def _proj_planes() -> list[list[float]]:
    from ..functions.hashing import hyperplanes

    return hyperplanes(PROJ_DIMS, 64, seed=PROJ_SEED)


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection 64 → 16 dims: each
    output coordinate is a dot product with a fixed pseudo-random plane
    (same deterministic LCG planes as the LSH family, so the DuckDB oracle
    computes identical doubles). The cheap-representation step of a vector
    pipeline — 4× smaller vectors for coarse search/clustering, exact
    rerank on the originals (ann_projected_rerank_topk). One scan, all
    JVM HOF arithmetic, no shuffle; projected vectors emitted as a
    formatted CSV string (float arrays don't hash identically across
    engines, strings do — same contract as embedding_centroids)."""
    from ..functions.vectors import dot as vdot

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = F.col("embedding").cast("array<double>")
    coords = [
        F.format_number(vdot(x, lit_doubles(plane)), 4)
        for plane in _proj_planes()
    ]
    return emb.select("vec_id", F.concat_ws(",", *coords).alias("proj_csv"))


def build_projection_index(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> str:
    """One-time materialization of the projected representation: the table
    rewritten with a ``proj`` column (16 doubles) NEXT TO the original
    embedding. Parquet is columnar, so a stage-1 scan that selects only
    (vec_id, proj) never reads the 64-dim column — the projection is paid
    once at build, not per query. Idempotent per sf dir."""
    import os
    import tempfile

    from ..functions.vectors import dot as vdot

    if out_dir is None:
        out_dir = _index_dir(f"proj_index_d{PROJ_DIMS}", sf_dir)
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    proj = F.array(*[
        vdot(x, lit_doubles(plane)) for plane in _proj_planes()
    ])
    (
        emb.select("vec_id", "embedding", proj.alias("proj"))
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def projected_candidates(
    spark: SparkSession,
    sf_dir: str,
    vec_id: int = QUERY_VEC_ID,
    n_candidates: int = 50,
) -> DataFrame:
    """Stage 1 of two-stage retrieval: top-n candidates by cosine in the
    materialized 16-dim projected space. The scan's ReadSchema carries only
    (vec_id, proj) — the 64-dim column is never read (plan-asserted) — so
    this pass moves half the bytes (16 float64 vs 64 float32; storing the
    projection as float32 would buy the full 4× at the cost of mirroring
    the truncation in the oracle) and a quarter of the multiply-adds of
    the brute-force scan. Byte saving is measured, not assumed
    (tests/test_data_skipping.py)."""
    index_dir = build_projection_index(spark, sf_dir)
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    # project the query driver-side with the same left-to-right accumulation
    qproj = [
        sum(float(a) * b for a, b in zip(qvec, plane)) for plane in _proj_planes()
    ]
    qp = lit_doubles(qproj)
    idx = spark.read.parquet(index_dir)
    return (
        idx.filter(F.col("vec_id") != vec_id)
        .select("vec_id", cosine(F.col("proj"), qp).alias("proj_cos"))
        .orderBy(F.col("proj_cos").desc(), F.col("vec_id").asc())
        .limit(n_candidates)
    )


def ann_projected_rerank_topk(
    spark: SparkSession,
    sf_dir: str,
    vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    n_candidates: int = 50,
) -> DataFrame:
    """Two-stage retrieval — the production ANN serving shape: stage 1
    scores everything in the materialized PROJECTED space (reads only the
    16-dim column: half the bytes, a quarter of the ops), stage 2
    reranks ONLY the candidates with the exact 64-dim cosine. The bounded
    candidate id set (O(n_candidates)) is fetched to the driver and pushed
    into the rerank scan as an IN filter, so stage 2 reads just the
    candidates' row groups — never the full 64-dim column (the broadcast-
    join alternative would probe every row's embedding). Deterministic
    tie-breaks on vec_id at both cuts keep the result engine-portable (the
    oracle reproduces both stages in SQL)."""
    cand_ids = [int(r["vec_id"]) for r in projected_candidates(
        spark, sf_dir, vec_id, n_candidates
    ).collect()]
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    q = lit_doubles(qvec)
    idx = spark.read.parquet(build_projection_index(spark, sf_dir))
    return (
        idx.filter(F.col("vec_id").isin(cand_ids))
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def knn_join_vectorized(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Vectorized twin of knn_join_blocked: one Arrow batch per label block
    into applyInPandas, cosine via a single BLAS matmul (M @ M.T), top-k by
    (cos desc, nbr asc) per row. This is the endorsed shape for dense
    linear algebra the HOF path interprets element-at-a-time — same rows,
    ~5-10x faster per block, and the per-block matrix (block_size x dim)
    bounds executor memory at scale.

    Numerical note: BLAS accumulates the dot in a different order than the
    sequential HOF fold; both are float64 and agree to ~1 ulp, and results
    round to 4 decimals AFTER returning to Spark (F.round, same half-up as
    the DuckDB oracle — Python's round() is banker's and must not be used).
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        # Sort the block by id ONCE so a single stable argsort per matrix
        # (not a Python-loop lexsort per row — r15, guide §4.2) breaks cos
        # ties toward the lower nbr id, identical to the old per-row
        # np.lexsort((ids, -C[i])).
        order = np.argsort(ids, kind="stable")
        ids, M = ids[order], M[order]
        nrm = np.sqrt((M * M).sum(axis=1))
        C = (M @ M.T) / np.outer(nrm, nrm)
        np.fill_diagonal(C, -np.inf)  # exclude self-pairs
        n = len(ids)
        kk = min(k, n - 1)
        idx = np.argsort(-C, axis=1, kind="stable")[:, :kk]
        rows = np.arange(n)[:, None]
        return pd.DataFrame(
            {
                "src": np.repeat(ids, kk),
                "nbr": ids[idx].ravel(),
                "rk": np.tile(np.arange(1, kk + 1), n),
                "cos": C[rows, idx].ravel(),
            }
        )

    out = emb.groupBy("label").applyInPandas(
        per_block, schema="src long, nbr long, rk int, cos double"
    )
    return out.select("src", "nbr", "rk", F.round("cos", 4).alias("cos_sim"))


def ann_lsh_multiprobe_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Multi-probe sign-LSH top-k: probe the query's bucket plus every
    bucket at Hamming distance 1 in signature space (flip one hyperplane
    sign). Recall rises sharply — a near neighbor only escapes when ≥ 2 of
    the 4 plane signs disagree — while the scan still prunes to
    (planes+1)/2^planes of the data (5/16 here) instead of all of it."""
    from ..functions.hashing import hyperplanes

    planes = hyperplanes(LSH_PLANES, 64)
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(float(a) * b for a, b in zip(qvec, plane)) >= 0:
            qbucket |= 1 << i
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(LSH_PLANES)]
    emb = load_table(spark, sf_dir, "embeddings")
    q = lit_doubles(qvec)
    scored = (
        emb.filter(F.col("vec_id") != vec_id)
        .filter(_sign_bucket(F.col("embedding"), planes).isin(probes))
        .select("vec_id", cosine(F.col("embedding"), q).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the IVF/k-means build
    step. posexplode → groupBy (label, dim) avg → re-assemble ordered by
    dim. Two shuffles, both partial-agg friendly; no vector ever collects
    to the driver. The centroid is emitted as a rounded CSV string so the
    DuckDB oracle (unnest WITH ORDINALITY) hashes identically — array
    float layouts do not compare across engines, strings do."""
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: F.format_number(s["c"], 4),
                ),
            ).alias("centroid_csv"),
            F.count("*").alias("n_dims"),
        )
        .orderBy("label")
    )


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector as (c_label, centroid: array<double>) — the
    shared coarse-quantizer build. kmeans_assign, semantic_outliers, and
    ann_ivf_recall_audit all consume THIS table (one definition, so the
    assignment/tie-break contract cannot silently diverge between them);
    embedding_centroids is its human-readable CSV twin. posexplode →
    (label, dim) avg → re-assemble ordered by dim; two partial-agg
    friendly shuffles, output is clusters × dims — tiny by construction,
    broadcast by every caller."""
    per_dim = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
    )
    return per_dim.groupBy(F.col("label").alias("c_label")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def _sq_dist(vec_col, centroid_col):
    """Squared-L2 JVM fold over the zipped arrays, in dim order (a fixed
    accumulation order — the cross-engine float contract). Callers
    round/floor per their own gate convention."""
    return F.aggregate(
        F.zip_with(
            vec_col.cast("array<double>"),
            centroid_col,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step: each vector moves to its nearest per-label
    centroid (squared L2). Centroids are tiny (clusters × dim) and
    broadcast; distances are a JVM higher-order fold over the zipped
    arrays; argmin = min-distance struct per vector (array_min over
    (dist, label) structs — no window, one pass). Ties break to the lower
    label via struct ordering. This is the iterate of IVF list building:
    at 100 TB each pass is one broadcast join over the embedding table."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    centroids = _label_centroids(spark, sf_dir)
    dist = _sq_dist(F.col("embedding"), F.col("centroid"))
    scored = (
        emb.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "label",
            F.struct(
                F.round(dist, 6).alias("d"), F.col("c_label").alias("l")
            ).alias("dl"),
        )
        .groupBy("vec_id", "label")
        .agg(F.min("dl").alias("best"))
    )
    # No trailing orderBy: N-row output; a presentational global sort is a
    # full shuffle at scale and both correctness gates are order-insensitive.
    return scored.select(
        "vec_id",
        F.col("label").alias("old_label"),
        F.col("best.l").alias("new_label"),
        F.col("best.d").alias("dist_sq"),
    )


KMEANS_K = 10
KMEANS_ROUNDS = 5
_KMEANS_MEMO: dict[str, list] = {}


def learned_centroids(
    spark: SparkSession, sf_dir: str, k: int = KMEANS_K, rounds: int = KMEANS_ROUNDS
) -> list:
    """Fixed-round Lloyd k-means over the embedding table — the LEARNED
    coarse quantizer that build_ivf_index partitions by and every IVF
    operator probes, replacing the synthetic ``label`` blocking the r8
    recall audit measured at recall@3 = 0.08 (a random 10-way split).

    Deterministic and cross-engine reproducible by construction, so the
    DuckDB oracle replays the identical iteration as unrolled SQL:

    - init: random-partition seeding — cluster = md5(vec_id) % k (the
      repo's standard portable hash; Forgy vector seeds would need
      engine-identical row order, md5 bucketing does not);
    - each round: per-cluster per-dim mean ROUNDED to 1e-6 — re-anchoring
      both engines to the same doubles every round so float summation
      order cannot compound across rounds — then reassign each vector to
      the nearest centroid by squared L2 rounded to 1e-6, ties to the
      lower cluster id (the kmeans_assign argmin contract).

    Scale shape: each round is ONE job — scan + partial-agg (cluster, dim)
    means; the k × dim centroid table collects to the driver (bounded by
    construction: 10 × 64 doubles here; k=4096 × dim=1024 at 100 TB is
    still 32 MB) and re-enters the next round via _dist_structs_col's
    per-k strategy — literals below IVF_LITERAL_K_MAX, a broadcast data
    array above (VERDICT r9 #2: folding 4M literal nodes is analyzer
    death; the data path keeps the plan O(1) nodes at any k) — the
    standard distributed-Lloyd shape (broadcast centroids, never a
    corpus-side shuffle). Memoized per table identity (size+mtime, same
    fingerprint discipline as _index_dir): learning is a one-time
    index-build cost, not a per-query cost.

    Empty clusters stay dead (no re-seeding) — both engines replay the
    same deaths; md5-bucket init starts every cluster ~n/k strong.

    Returns [(cluster_id, [centroid floats])] sorted by cluster_id.
    """
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        key = f"{src}|{st.st_size}|{st.st_mtime_ns}|{k}|{rounds}"
    except OSError:
        key = f"{src}|nostat|{k}|{rounds}"
    if key in _KMEANS_MEMO:
        return _KMEANS_MEMO[key]

    from ..functions.hashing import md5_long32

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned = emb.select(
        (md5_long32(F.col("vec_id").cast("string")) % k).cast("int").alias("cl"),
        "embedding",
    )
    cents: list = []
    for _ in range(rounds):
        # Two selects, not one: placing the struct-field argmin (the
        # cluster expression) in the same projection as the posexplode
        # generator trips a Spark analyzer quirk that rewrites the aliased
        # struct to default col1/col2 field names (FIELD_NOT_FOUND on `l`).
        rows = (
            assigned.select("cl", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cl", "dim")
            .agg(F.round(F.avg("x"), 6).alias("c"))
            .groupBy("cl")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"],
                ).alias("centroid")
            )
            .collect()
        )
        cents = sorted((int(r["cl"]), [float(x) for x in r["centroid"]]) for r in rows)
        assigned = _with_nearest_centroid(emb, cents, "embedding", "_b").select(
            F.col("_b")["l"].alias("cl"), "embedding"
        )
    _KMEANS_MEMO[key] = cents
    return cents


def _centroid_dist_structs(vec, cents: list):
    """(rounded squared L2, cluster id) struct per LITERAL centroid — the
    argmin/probe-ranking primitive over learned_centroids' output. All
    literals fold into the scan (no join, no extra shuffle); array_min /
    array_sort on the struct give nearest-first with ties to the lower id.

    Literal folding is O(k·dim) ANALYZER nodes, so it is gated to
    k <= IVF_LITERAL_K_MAX — production k goes through _dist_structs_col's
    broadcast data path (VERDICT r9 #2)."""
    return F.array(
        *[
            F.struct(
                F.round(
                    _sq_dist(vec, lit_doubles(c)), 6
                ).alias("d"),
                F.lit(cid).cast("int").alias("l"),
            )
            for cid, c in cents
        ]
    )


def _nearest_centroid(vec, cents: list):
    """argmin struct (d, l) over the literal centroids."""
    return F.array_min(_centroid_dist_structs(vec, cents))


# Above this k the centroids ship as broadcast DATA, not literal
# expressions: one literal struct per centroid is O(k·dim) Catalyst nodes
# per consumer — at the production k the docstrings advertise (k=4096 ×
# dim=1024) that is ~4M expression nodes, analyzer/codegen death long
# before the 32 MB of centroid bytes matter (VERDICT r9 #2).
IVF_LITERAL_K_MAX = 64


def _dist_structs_col(df: DataFrame, cents: list, vec_col: str, out: str) -> DataFrame:
    """Attach an array<struct<d,l>> column of (rounded squared L2, cluster
    id) — one entry per centroid — to every row: the argmin / probe-ranking
    primitive at ANY k. Two physical strategies, ONE arithmetic contract
    (the identical _sq_dist dim-order fold + F.round(…, 6), so the paths
    are row-identical and share one oracle; test_ivf_centroid_paths pins
    the parity):

    - k <= IVF_LITERAL_K_MAX: centroids fold into the plan as literals —
      zero joins, zero extra scans; the right call at probe-scale k.
    - k > IVF_LITERAL_K_MAX: the centroid table rides as DATA — a
      broadcast single-row crossJoin carrying array<struct<i, v>> (k·dim
      doubles, bounded by construction, never corpus-sized) — and the same
      distance fold runs as a higher-order transform over that array:
      O(1) plan nodes, O(k·dim) runtime work per row (exactly the literal
      path's cost), still no shuffle and no per-row join fan-out."""
    if len(cents) <= IVF_LITERAL_K_MAX:
        return df.withColumn(out, _centroid_dist_structs(F.col(vec_col), cents))
    spark = df.sparkSession
    one = spark.createDataFrame(
        [([(int(cid), [float(x) for x in c]) for cid, c in cents],)],
        "_cents array<struct<i:int,v:array<double>>>",
    )
    structs = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.round(_sq_dist(F.col(vec_col), c["v"]), 6).alias("d"),
            c["i"].alias("l"),
        ),
    )
    return df.crossJoin(F.broadcast(one)).withColumn(out, structs).drop("_cents")


def _with_nearest_centroid(
    df: DataFrame, cents: list, vec_col: str, out: str
) -> DataFrame:
    """df + struct column ``out`` = (d, l) argmin over the centroids —
    strategy picked per k by _dist_structs_col."""
    tmp = f"_{out}_cdl"
    return (
        _dist_structs_col(df, cents, vec_col, tmp)
        .withColumn(out, F.array_min(F.col(tmp)))
        .drop(tmp)
    )


def kmeans_iterate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final assignment of the fixed-round learned quantizer: each vector's
    nearest learned centroid after KMEANS_ROUNDS Lloyd rounds (vs
    kmeans_assign, which documents exactly ONE step from the per-label
    means). One scan — the centroids enter as literals, so there is no
    join and no shuffle; the N-row output carries no presentational sort
    (both correctness gates compare order-insensitively)."""
    cents = learned_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # argmin staged once, fields projected after — selecting both fields
    # from the same select would inline the literal argmin expression
    # twice per row
    return _with_nearest_centroid(emb, cents, "embedding", "b").select(
        "vec_id",
        F.col("b.l").alias("cluster"),
        F.col("b.d").alias("dist_sq"),
    )


# Default probe depth for the production kNN joins — set by the measured
# nprobe curve (RECALL_r10.json, VERDICT r9 #8): recall@3 = 0.2533 / 0.4867
# / 0.6733 / 0.74 at nprobe 1/2/3/4. nprobe=3 beats sign-LSH multiprobe's
# 0.58 at essentially the same scanned fraction (3/10 vs 5/16), while
# nprobe=4 pays another tenth of the corpus for +0.07 — so 3 is the default
# and 4 stays a caller knob. The DuckDB oracle interpolates this SAME
# constant, so the two engines cannot probe at different depths.
IVF_JOIN_NPROBE = 3


def knn_join_ivf_blocked(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    nprobe: int = IVF_JOIN_NPROBE,
    n_clusters: int = KMEANS_K,
) -> DataFrame:
    """Corpus-wide kNN join blocked on the LEARNED IVF clusters with
    nprobe=IVF_JOIN_NPROBE — closing the loop the r8 audit triad opened
    (VERDICT r8 #3): the label-blocked knn_join measured recall@3 = 0.08,
    the learned-IVF quantizer 0.2533/0.4867/0.6733/0.74 at nprobe 1-4
    (RECALL_r10.json), so the production blocked join probes the depth
    the instruments say pays for itself.

    Shape: every vector probes its nprobe nearest learned centroids; the
    candidate set is (probe → home-cluster members), an equi-join on the
    cluster id — never all-pairs. Pair count is ~nprobe·N²/k (same growth
    order as label blocking, nprobe× the candidates for ~8× the recall on
    the r10 audit record). The per-src top-k ranks with the standard
    (cos DESC, nbr ASC) window. Centroids enter both scans via
    _dist_structs_col's per-k strategy: literals at probe-scale k (no
    join, no broadcast), a bounded k·dim broadcast data array above
    IVF_LITERAL_K_MAX — never a broadcast that grows with the corpus.
    At 100 TB the cluster equi-join co-partitions both sides on
    the cluster id; k is the skew knob (10 here — production raises it
    with corpus size, bounding both block width and skew)."""
    from pyspark.sql import Window

    from ..functions.vectors import dot

    cents = learned_centroids(spark, sf_dir, k=n_clusters)
    emb = _audit_emb(spark, sf_dir)
    home = _with_nearest_centroid(emb, cents, "embedding", "_b").select(
        "*", F.col("_b")["l"].alias("cluster")
    ).drop("_b")
    probes = _dist_structs_col(emb, cents, "embedding", "_cdl").select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("semb"),
        F.col("nrm").alias("snrm"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(F.col("_cdl")), 1, nprobe),
                lambda s: s["l"],
            )
        ).alias("probe"),
    )
    cand = home.join(
        probes,
        (F.col("cluster") == F.col("probe")) & (F.col("vec_id") != F.col("src")),
    ).select(
        "src",
        F.col("vec_id").alias("nbr"),
        (
            dot(F.col("embedding"), F.col("semb")) / (F.col("nrm") * F.col("snrm"))
        ).alias("cos"),
    )
    rk = F.row_number().over(
        Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("nbr").asc())
    )
    return (
        cand.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select("src", "nbr", "rk", F.round("cos", 4).alias("cos_sim"))
    )


def knn_join_ivf_vectorized(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    nprobe: int = IVF_JOIN_NPROBE,
    n_clusters: int = KMEANS_K,
) -> DataFrame:
    """BLAS twin of knn_join_ivf_blocked — the production serving shape
    for the learned-quantizer kNN join (same relationship
    knn_join_vectorized has to knn_join_blocked: identical rows, one
    Arrow batch + matmul per block instead of an element-at-a-time HOF
    fold per pair).

    Shape: group the exploded probe list on the cluster id (a vector's
    home list is its first-ranked probe, so one frame carries both
    roles) — one (home_block × probe_block) BLAS matmul per learned
    list, so executor memory is bounded by the widest list, never the
    corpus. Each block emits its LOCAL top-k per probing src; a src
    probes nprobe lists, so a final (cos DESC, nbr ASC) window over the
    ≤ nprobe·k survivors per src picks the global top-k — the block pass
    does the heavy pruning, the merge window touches k·nprobe rows per
    vector. Same float contract as knn_join_vectorized: BLAS float64
    agrees with the HOF fold to ~1 ulp, rounding to 4 decimals happens
    AFTER ranking, in Spark (F.round, half-up like the oracle).

    Registered against the SAME oracle as knn_join_ivf_blocked — the
    fast path must be row-identical, not approximately so."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    cents = learned_centroids(spark, sf_dir, k=n_clusters)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # ONE scan + ONE centroid-distance pass (r16, guide §2.3/§2.4): the
    # home relation IS the probe list's first entry — argmin over the
    # (d, l) structs equals array_sort(...)[0] — so exploding the sorted
    # nprobe slice with posexplode and flagging position 0 yields both
    # sides of the old cogroup from a single frame. The old shape scanned
    # the embeddings twice (once per cogroup side), evaluated the k-centroid
    # distance fold twice per vector, and shuffled BOTH sides (home:
    # N·(id+embedding); probes: nprobe·N·(id+embedding)); this groupBy
    # ships only the probe-side rows (is_home rides along as one byte) —
    # one exchange, one Arrow transpose per list instead of two.
    assigned = _dist_structs_col(emb, cents, "embedding", "_cdl").select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.transform(
                F.slice(F.array_sort(F.col("_cdl")), 1, nprobe),
                lambda s: s["l"],
            )
        ).alias("_pi", "cluster"),
    ).select(
        "vec_id", "embedding", "cluster", (F.col("_pi") == 0).alias("is_home")
    )

    def per_list(pdf: pd.DataFrame) -> pd.DataFrame:
        hmask = pdf["is_home"].to_numpy()
        if not hmask.any():
            return pd.DataFrame({"src": [], "nbr": [], "cos": []}).astype(
                {"src": "int64", "nbr": "int64", "cos": "float64"}
            )
        sid = pdf["vec_id"].to_numpy()
        S = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        hid = sid[hmask]
        H = S[hmask]
        # Sort homes by id ONCE so a single stable argsort per matrix (not
        # a Python-loop lexsort per probe row — r15, guide §4.2) breaks cos
        # ties toward the lower nbr id, identical to the old per-row
        # np.lexsort((hid, -C[i])).
        order = np.argsort(hid, kind="stable")
        hid, H = hid[order], H[order]
        hn = np.sqrt((H * H).sum(axis=1))
        sn = np.sqrt((S * S).sum(axis=1))
        C = (S @ H.T) / np.outer(sn, hn)
        # self-pairs: a src probing its own home list must not match itself
        C[sid[:, None] == hid[None, :]] = -np.inf
        kk = min(k, H.shape[0])
        idx = np.argsort(-C, axis=1, kind="stable")[:, :kk]
        top = C[np.arange(len(sid))[:, None], idx]
        keep = np.isfinite(top).ravel()  # drops the self-pair -inf slots
        return pd.DataFrame(
            {
                "src": np.repeat(sid, kk)[keep],
                "nbr": hid[idx].ravel()[keep],
                "cos": top.ravel()[keep],
            }
        )

    local = assigned.groupBy("cluster").applyInPandas(
        per_list, schema="src long, nbr long, cos double"
    )
    rk = F.row_number().over(
        Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("nbr").asc())
    )
    return (
        local.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select("src", "nbr", "rk", F.round("cos", 4).alias("cos_sim"))
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the storage/
    serving compression step of a vector pipeline (4x smaller, SIMD-
    friendly). Per-vector scale = max|x| / 127; q_i = floor(x_i / scale)
    (floor, not round — an exact function of the shared IEEE double, so
    the DuckDB oracle computes identical codes). All JVM higher-order
    functions over the array — one scan, no shuffle, no Python. Codes are
    emitted as a CSV string: int arrays hash differently across engines,
    strings do not."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = F.col("embedding").cast("array<double>")
    max_abs = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = max_abs / F.lit(127.0)
    # all-zero vector → scale 0; x/0 is NULL and concat_ws would silently
    # drop the NULL codes (ADVICE r3) — emit explicit zero codes instead.
    codes = F.transform(
        x,
        lambda v: F.when(max_abs == 0, F.lit(0)).otherwise(
            F.floor(v / scale).cast("int")
        ),
    )
    return emb.select(
        "vec_id",
        (F.floor(scale * 1e6) / 1e6).alias("scale_1e6"),
        F.concat_ws(",", F.transform(codes, lambda c: c.cast("string"))).alias(
            "codes_csv"
        ),
    )


def cluster_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal audit: per embedding cluster (label), how good is the
    corresponding text? Joins the vector table to the documents table on
    id (vec_id ↔ doc_id) and aggregates the text-quality score and vector
    norm per cluster — the table that tells a curator which clusters to
    drop wholesale. One equi-join on the shared id (co-partitionable at
    100 TB) + one small agg; the quality expression is the same JVM
    expression the text operators use (no Python)."""
    from ..functions.textfns import tokens

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    n_tokens = F.size(toks)
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.size(F.array_distinct(toks)) / n_tokens) * 0.3
        + (
            F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
            / F.length("text")
        )
        * 0.3
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return (
        emb.join(docs, emb.vec_id == docs.doc_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg(quality), 4).alias("avg_quality"),
            F.round(F.avg(norm), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )


def semantic_outliers(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Embedding outlier detection: the k vectors farthest (squared L2)
    from their own label's centroid — the semantic-noise removal step of a
    vector pipeline (mislabeled or junk members surface first). Reuses the
    kmeans_assign machinery: centroids are tiny and broadcast, distance is
    a JVM fold, the global top-k runs as TakeOrderedAndProject over the
    per-vector distances (never a full sort)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    centroids = _label_centroids(spark, sf_dir)
    dist = _sq_dist(F.col("embedding"), F.col("centroid"))
    return (
        emb.join(F.broadcast(centroids), emb.label == F.col("c_label"))
        .select("vec_id", "label", (F.floor(dist * 1e6) / 1e6).alias("dist_sq"))
        .orderBy(F.col("dist_sq").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def build_mips_index(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> str:
    """One-time materialization of the MIPS bucket layout via norm
    augmentation (Bachrach et al., RecSys'14): append sqrt(M² − |x|²) to
    every vector (M = max norm over the table), after which inner-product
    order against any query equals cosine order in the augmented space —
    so the same sign-LSH bucketing that indexes cosine indexes MIPS.
    Embeddings are written partitioned by the augmented-space bucket; the
    stored column is the ORIGINAL vector (the augmented coordinate only
    influences the bucket, never the returned inner product). Idempotent
    per sf dir, like build_lsh_index. The M fetch is a 1-row aggregate —
    an index-build job cost, not a per-query cost."""
    import os
    import tempfile

    from ..functions.hashing import hyperplanes
    from ..functions.vectors import dot as vdot
    from ..functions.vectors import norm

    if out_dir is None:
        out_dir = _index_dir(f"mips_index_p{LSH_PLANES}", sf_dir)
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    emb = load_table(spark, sf_dir, "embeddings")
    m_val = float(emb.agg(F.max(norm(F.col("embedding"))).alias("m")).head()["m"])
    x = F.col("embedding").cast("array<double>")
    # greatest(…, 0): for the max-norm vector itself M²−|x|² can round a
    # hair below zero; both engines clamp identically before sqrt.
    aug = F.sqrt(F.greatest(F.lit(m_val * m_val) - vdot(x, x), F.lit(0.0)))
    augmented = F.concat(x, F.array(aug))
    planes = hyperplanes(LSH_PLANES, 65)
    (
        emb.withColumn("bucket", _sign_bucket(augmented, planes))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def ann_mips_indexed_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Indexed MIPS top-k — the 100 TB path ann_mips_topk's docstring
    promises: norm augmentation reduces MIPS to cosine (augmented query
    coordinate is 0, so its bucket uses the raw 64-dim signs), and the
    materialized bucket layout (build_mips_index) turns the bucket
    predicate into a partition filter — the scan reads ~1/2^planes of the
    files. Recall is probabilistic exactly as in the cosine LSH family;
    the oracle reproduces the bucket filter so correctness is exact."""
    from ..functions.hashing import hyperplanes

    index_dir = build_mips_index(spark, sf_dir)
    planes = hyperplanes(LSH_PLANES, 65)
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    qbucket = 0
    for i, plane in enumerate(planes):
        # zip stops at the 64 query dims: the augmented coordinate is 0.
        if sum(float(a) * b for a, b in zip(qvec, plane)) >= 0:
            qbucket |= 1 << i
    from ..functions.vectors import dot as vdot

    emb = spark.read.parquet(index_dir)
    q = lit_doubles(qvec)
    scored = (
        emb.filter(F.col("bucket") == qbucket)  # partition-pruned
        .filter(F.col("vec_id") != vec_id)
        .select("vec_id", vdot(F.col("embedding"), q).alias("ip"))
    )
    return (
        scored.orderBy(F.col("ip").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("ip", 4).alias("inner_product"))
    )


def ann_mips_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Maximum-inner-product search (MIPS) top-k for one query vector —
    the retrieval metric for unnormalized embedding spaces (recommendation
    scores, unnormalized dual encoders), complementing the cosine family.

    Brute-force dot product with the query broadcast as a literal array;
    one scan, JVM-side zip_with/aggregate fold, TakeOrderedAndProject
    top-k (no global sort). The 100 TB path is ann_mips_indexed_topk:
    norm augmentation (append sqrt(M^2 - |x|^2) to each vector, 0 to the
    query) reduces MIPS to cosine, bucketed and partition-pruned by
    build_mips_index. This brute-force form is its exact verifier."""
    from ..functions.vectors import dot

    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    emb = load_table(spark, sf_dir, "embeddings")
    q = lit_doubles(qvec)
    scored = emb.filter(F.col("vec_id") != vec_id).select(
        "vec_id", dot(F.col("embedding"), q).alias("ip")
    )
    return (
        scored.orderBy(F.col("ip").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("ip", 4).alias("inner_product"))
    )


def _audit_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, nrm) — the corpus as every recall audit reads
    it, norms hoisted once."""
    from ..functions.vectors import norm

    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )


def _audit_sample(emb: DataFrame, n_queries: int) -> DataFrame:
    """The audits' query sample — the first n_queries vec_ids, renamed so
    callers can broadcast it against the corpus."""
    return emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )


def _exact_knn(emb: DataFrame, sample: DataFrame, k: int) -> DataFrame:
    """Exact global kNN ground truth: broadcast sample × corpus cosine,
    ranked (cos DESC, vec_id ASC) — THE tie-break contract every recall
    audit (and its DuckDB oracle) measures against, defined once so the
    three audits cannot compute different 'exact' baselines. Never
    corpus × corpus. Returns (qid, nbr) rows, k per query."""
    from pyspark.sql import Window

    from ..functions.vectors import dot

    pairs = emb.join(
        F.broadcast(sample), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "vec_id",
        (
            dot(F.col("embedding"), F.col("qemb"))
            / (F.col("nrm") * F.col("qnrm"))
        ).alias("cos"),
    )
    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("cos").desc(), F.col("vec_id").asc()
        )
    )
    return (
        pairs.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select("qid", F.col("vec_id").alias("nbr"))
    )


def ann_recall_audit(
    spark: SparkSession, sf_dir: str, k: int = 3, n_queries: int = 50
) -> DataFrame:
    """Measured recall@k of the label-blocked kNN join against EXACT
    global kNN on a query sample — the ANN-family analog of
    dedup.lsh_recall_audit (VERDICT r7 #7's tuning-loop pattern): before
    committing a corpus-wide blocked kNN pass at 100 TB, run exactly this
    on a held-out sample to decide whether the coarse quantizer (here the
    label blocking) keeps enough true neighbors, and re-cluster or add
    multi-probe if not.

    Scale shape: the exact side is sample × corpus with the ≤n_queries
    sample BROADCAST (never corpus × corpus — that is the thing blocking
    exists to avoid); the blocked side reuses knn_join_vectorized's BLAS
    path filtered to the sample. One global aggregate row out.

    Both sides rank by (cosine DESC, vec_id ASC) on full-precision
    doubles — the same deterministic tie-break every ANN oracle here
    uses — so the DuckDB twin computes the identical recall.

    Measured on the synthetic testdata (sf0.01): mean recall@3 = 0.08 —
    almost exactly the 1/n_labels ≈ 0.1 a RANDOM 10-way blocking predicts,
    because the synthetic `label` column is not a semantic clustering.
    That is the audit doing its job: it tells a curator this quantizer
    loses 92% of true neighbors and must be replaced (kmeans_assign /
    embedding_centroids are the re-clustering pass) or supplemented with
    multi-probe before a corpus-scale blocked kNN run."""
    emb = _audit_emb(spark, sf_dir)
    exact = _exact_knn(emb, _audit_sample(emb, n_queries), k)
    blocked = (
        knn_join_vectorized(spark, sf_dir, k)
        .filter(F.col("src") < n_queries)
        .select(F.col("src").alias("qid"), "nbr", F.lit(1).alias("hit"))
    )
    per_q = (
        exact.join(blocked, ["qid", "nbr"], "left")
        .groupBy("qid")
        .agg((F.count("hit") / F.lit(k)).alias("recall"))
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.lit(k).alias("k"),
        F.round(F.avg("recall"), 4).alias("mean_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )


def knn_join_ivf_recall_audit(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_queries: int = 50,
    nprobe: int = IVF_JOIN_NPROBE,
) -> DataFrame:
    """Measured recall@k of the LEARNED-IVF kNN join (knn_join_ivf_vectorized:
    k-means lists + nprobe multi-probe) against exact global kNN on the
    same query sample — the head-to-head row VERDICT r12 #5 asked for: the
    label-blocked join audits at 0.08 (ann_recall_audit — the synthetic
    label is a random blocking), and THIS audit measures what the learned
    quantizer retains at the identical k, making the "use the IVF twin"
    docstring verdicts a measured claim (RECALL_r13), not an appeal.

    Scale shape: the exact side is the shared broadcast-sample ground
    truth (_exact_knn, never corpus × corpus); the IVF side is the
    production join itself filtered to the sample. One aggregate row."""
    emb = _audit_emb(spark, sf_dir)
    exact = _exact_knn(emb, _audit_sample(emb, n_queries), k)
    ivf = (
        knn_join_ivf_vectorized(spark, sf_dir, k, nprobe=nprobe)
        .filter(F.col("src") < n_queries)
        .select(F.col("src").alias("qid"), "nbr", F.lit(1).alias("hit"))
    )
    per_q = (
        exact.join(ivf, ["qid", "nbr"], "left")
        .groupBy("qid")
        .agg((F.count("hit") / F.lit(k)).alias("recall"))
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.lit(k).alias("k"),
        F.lit(nprobe).alias("nprobe"),
        F.round(F.avg("recall"), 4).alias("mean_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )


def ann_lsh_recall_audit(
    spark: SparkSession, sf_dir: str, k: int = 3, n_queries: int = 50
) -> DataFrame:
    """Measured recall@k of the sign-LSH bucket quantizer — single-probe
    AND Hamming-1 multi-probe in one row — against exact global kNN on
    the same query sample. Completes the tuning loop ann_recall_audit
    opens: that audit shows the random label blocking loses ~92% of true
    neighbors; THIS one shows what the data-driven sign-LSH quantizer
    (the one the indexed layouts actually partition by) retains, and how
    much the +1-bucket probe buys — the (planes, probes) knob a curator
    turns before committing a corpus-scale blocked pass.

    Scale shape: exact side is sample × corpus with the sample BROADCAST
    (never corpus × corpus); probed side computes each row's bucket in
    the same scan (a literal-hyperplane projection), keeps only pairs
    within Hamming distance 1 of the query's bucket, and ranks the two
    candidate sets with windows over the ≤n_queries partitions. One
    global row out."""
    from pyspark.sql import Window

    from ..functions.hashing import hyperplanes
    from ..functions.vectors import dot, norm

    planes = hyperplanes(LSH_PLANES, 64)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("nrm"),
        _sign_bucket(F.col("embedding"), planes).alias("eb"),
    )
    sample = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("eb").alias("qb"),
    )
    pairs = emb.join(
        F.broadcast(sample), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "vec_id",
        (
            dot(F.col("embedding"), F.col("qemb"))
            / (F.col("nrm") * F.col("qnrm"))
        ).alias("cos"),
        F.bit_count(
            F.col("eb").cast("long").bitwiseXOR(F.col("qb").cast("long"))
        ).alias("ham"),
    )
    order = [F.col("cos").desc(), F.col("vec_id").asc()]
    exact = _exact_knn(
        emb.select("vec_id", "embedding", "nrm"),
        sample.select("qid", "qemb", "qnrm"),
        k,
    )
    probed = pairs.filter(F.col("ham") <= 1).select(
        "qid",
        F.col("vec_id").alias("nbr"),
        "ham",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(*order))
        .alias("rk_mp"),
    )
    sp = probed.filter(F.col("ham") == 0).withColumn(
        "rk_sp",
        F.row_number().over(Window.partitionBy("qid").orderBy("rk_mp")),
    )
    per_q = (
        exact.join(
            probed.filter(F.col("rk_mp") <= k)
            .select("qid", "nbr", F.lit(1).alias("mp_hit")),
            ["qid", "nbr"],
            "left",
        )
        .join(
            sp.filter(F.col("rk_sp") <= k)
            .select("qid", "nbr", F.lit(1).alias("sp_hit")),
            ["qid", "nbr"],
            "left",
        )
        .groupBy("qid")
        .agg(
            (F.count("sp_hit") / F.lit(k)).alias("recall_sp"),
            (F.count("mp_hit") / F.lit(k)).alias("recall_mp"),
        )
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.lit(k).alias("k"),
        F.round(F.avg("recall_sp"), 4).alias("recall_single_probe"),
        F.round(F.avg("recall_mp"), 4).alias("recall_multiprobe"),
    )


def ann_ivf_recall_audit(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_queries: int = 50,
    nprobes: tuple = (1, 2),
) -> DataFrame:
    """Measured recall@k of the learned-centroid IVF probe — nprobe=1 AND
    nprobe=2 in one row — against exact global kNN on the same query
    sample. Completes the coarse-quantizer audit triad: ann_recall_audit
    shows what the metadata label blocking retains (0.08 — random),
    ann_lsh_recall_audit what the data-independent sign-LSH keeps, and
    THIS one what the data-DRIVEN quantizer (per-label centroids +
    nearest-centroid assignment, exactly the lists build_ivf_index
    partitions by) buys, plus how much probing the second-nearest list
    adds — the nprobe knob a curator turns before a corpus-scale pass.

    Scale shape: centroids are collected into ONE broadcast row
    (clusters x dims — tiny by construction), so both every vector's
    list assignment and each query's probe ranking are a higher-order
    array argmin inside the scan: no corpus self-join, no window over
    the corpus, no Python. The candidate join is a broadcast hash
    equi-join on the assigned cluster against the <= n_queries x nprobe
    exploded probe list; the exact side is the standard broadcast
    sample x corpus verifier (never corpus x corpus). One global row
    out. Assignment distances are rounded to 1e-6 with ties to the
    lower cluster id (struct ordering) — the same cross-engine argmin
    contract kmeans_assign established.

    Measured on the synthetic testdata (sf0.01, committed record
    RECALL_r10.json, re-derivable via tools/recall_probe.py): recall@3 =
    0.2533 / 0.4867 / 0.6733 / 0.74 at nprobe 1–4 with the LEARNED
    centroids (the pre-r9 per-label means measured 0.26/0.43 — the Lloyd
    rounds buy +0.06 at nprobe=2 on vectors this uniform) — ~6x what the
    random label blocking retains (0.08) while scanning ~1/10 of the
    corpus per probe. On these near-uniform vectors the sign-LSH
    multi-probe wins at equal-2 probes (0.58) but nprobe=3 overtakes it
    at the same scanned fraction (0.6733 at 3/10 vs 0.58 at 5/16) — the
    basis for IVF_JOIN_NPROBE=3; the audit triad is exactly the evidence
    a curator needs to pick a quantizer + probe budget before a 100 TB
    blocked pass.

    ``nprobes`` generalizes the probe-depth sweep (r10, VERDICT r9 #8):
    the registered entry keeps the (1, 2) default and its oracle; the
    recall probe tool additionally records the (3, 4) points so the
    nprobe curve is a committed artifact (RECALL_r10.json) — the
    measured answer to \"does a deeper probe budget pay for itself?\"."""
    from pyspark.sql import Window

    from ..functions.vectors import dot

    emb = _audit_emb(spark, sf_dir)
    # Since r9 the centroids are the LEARNED fixed-round Lloyd output
    # (learned_centroids), entering each scan via _dist_structs_col's
    # per-k strategy (literals at this k) — the persist/crossJoin
    # machinery the per-label-centroid form needed (to stop 26 per-branch
    # centroid rebuilds) dissolves entirely: the centroid expression costs
    # zero scans in every branch.
    cents = learned_centroids(spark, sf_dir)
    embc = _with_nearest_centroid(emb, cents, "embedding", "_b").select(
        "*", F.col("_b")["l"].alias("cluster")
    ).drop("_b")
    sample = _audit_sample(emb, n_queries)
    # The struct field access happens INSIDE the transform lambda (before
    # the generator): posexploding the struct array itself trips the same
    # analyzer quirk learned_centroids documents (field names stripped to
    # col1/col2 when a Generate shares the projection).
    qprobes = _dist_structs_col(sample, cents, "qemb", "_cdl").select(
        "qid",
        "qemb",
        "qnrm",
        F.posexplode(
            F.transform(
                F.slice(F.array_sort(F.col("_cdl")), 1, max(nprobes)),
                lambda s: s["l"],
            )
        ).alias("pr0", "probe_label"),
    ).select(
        "qid",
        "qemb",
        "qnrm",
        (F.col("pr0") + 1).alias("probe_rank"),
        "probe_label",
    )
    cand = embc.join(
        F.broadcast(qprobes),
        (F.col("cluster") == F.col("probe_label"))
        & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        "vec_id",
        "probe_rank",
        (
            dot(F.col("embedding"), F.col("qemb"))
            / (F.col("nrm") * F.col("qnrm"))
        ).alias("cos"),
    )
    order = [F.col("cos").desc(), F.col("vec_id").asc()]
    joined = _exact_knn(emb, sample, k)
    for np_ in nprobes:
        p = (
            cand.filter(F.col("probe_rank") <= np_)
            .withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("qid").orderBy(*order)),
            )
            .filter(F.col("rk") <= k)
            .select(
                "qid", F.col("vec_id").alias("nbr"), F.lit(1).alias(f"p{np_}_hit")
            )
        )
        joined = joined.join(p, ["qid", "nbr"], "left")
    per_q = joined.groupBy("qid").agg(
        *[
            (F.count(f"p{np_}_hit") / F.lit(k)).alias(f"r{np_}")
            for np_ in nprobes
        ]
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.lit(k).alias("k"),
        *[
            F.round(F.avg(f"r{np_}"), 4).alias(f"recall_nprobe{np_}")
            for np_ in nprobes
        ],
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN (r10)
#
# The missing third leg of the production ANN stack: IVF prunes WHICH lists
# a query scans, LSH/projection cheapen the CANDIDATE ranking, PQ compresses
# the VECTORS themselves — m sub-quantizers of ksub codes each turn a
# dim-double vector into m small ints (here 16 x 4-bit codes for a 64-dim
# vector: 256 float32 bytes -> 8 bytes), and serving ranks candidates in
# the compressed domain via an asymmetric-distance (ADC) lookup table built
# once per query (Jégou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011 — public knowledge). At 100 TB this is the difference
# between an index that fits in cluster memory and one that does not:
# 1 B vectors x 64 dims of float = 256 GB raw, 8 GB as PQ codes. The m knob
# trades compression for fidelity; the measured curve on THIS corpus
# (RECALL_r10.json, tools/recall_probe.py, sf0.01) is recall@3 = 0.0733 /
# 0.1667 / 0.34 / 0.4667 at m = 4 / 8 / 16 / 32 — near-uniform synthetic
# vectors are PQ's worst case (concentration of measure: pairwise distances
# cluster tightly, so quantization noise swamps the ranking margin); real
# embedding corpora have low intrinsic dimension and retain far more. That
# is exactly the decision the ann_pq_recall_audit instrument exists to make
# per-corpus before a 100 TB serving rollout. The residual variant
# (learned_pq_res_codebooks / ann_ivfpq_res_topk — the true FAISS IVFPQ) is
# measured by ann_ivfpq_recall_audit: plain 0.3067 vs residual 0.2667 at
# nprobe=3, and residual still loses one probe deeper (RECALL_r12.json,
# both operating points). VERDICT (r12): the DEFAULT serving path on this
# corpus is plain PQ + exact re-rank (ann_ivfpq_rerank_topk — 0.6267 at
# mult=10, 93% of the nprobe=3 pruning ceiling); residual encoding is
# EXPERIMENTAL here — kept because its advantage is corpus-dependent
# (it pays when vectors cluster tightly around their coarse centroids,
# which these near-uniform synthetics don't), and the audit exists to
# re-make that call per corpus.
#
# Everything is deterministic and cross-engine reproducible by the same
# construction as learned_centroids: md5-bucket init per (vector, subspace),
# fixed Lloyd rounds with per-round 1e-6 re-anchoring, squared-L2 argmin
# rounded to 1e-6 with ties to the lower code — so the DuckDB oracle replays
# the identical training as unrolled SQL and the driver hash-checks codes,
# ADC top-k, and the recall audit end-to-end.
# ---------------------------------------------------------------------------

PQ_M = 16       # subspaces (64-dim embedding -> 16 x 4-dim sub-vectors)
PQ_KSUB = 16    # codes per subspace (4-bit sub-quantizers)
PQ_ROUNDS = 3   # fixed Lloyd rounds per sub-quantizer
_PQ_MEMO: dict[str, list] = {}


def _pq_subs(emb: DataFrame, m: int, subdim: int) -> DataFrame:
    """(vec_id, s, subvec): each embedding split into its m sub-vectors —
    one posexplode over an array of slices, still a single scan."""
    return emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("embedding", s * subdim + 1, subdim).cast(
                        "array<double>"
                    )
                    for s in range(m)
                ]
            )
        ).alias("s", "subvec"),
    )


def _pq_cb_df(spark: SparkSession, cb: list) -> DataFrame:
    """The trained codebook as ONE broadcastable row of
    array<struct<s,c,v>> — m·ksub·subdim doubles, bounded by construction
    (4 KB here; m=16 x ksub=256 x subdim=64 at production scale is still
    2 MB). Data, not literals, unconditionally: the codebook is consulted
    via higher-order filter/transform, so the plan stays O(1) nodes at any
    (m, ksub) — the lesson _dist_structs_col's k-gate encodes
    (VERDICT r9 #2), applied from the start."""
    return spark.createDataFrame(
        [([(int(s), int(c), [float(x) for x in v]) for s, c, v in cb],)],
        "_pqcb array<struct<s:int,c:int,v:array<double>>>",
    )


def _pq_assign(subs: DataFrame, cb: list) -> DataFrame:
    """(vec_id, s, subvec, code): each sub-vector's nearest codebook entry
    within its OWN subspace — squared L2 rounded to 1e-6, ties to the
    lower code (the kmeans_assign argmin contract). One broadcast
    single-row crossJoin, no shuffle."""
    spark = subs.sparkSession
    structs = F.transform(
        F.filter(F.col("_pqcb"), lambda e: e["s"] == F.col("s")),
        lambda e: F.struct(
            F.round(_sq_dist(F.col("subvec"), e["v"]), 6).alias("d"),
            e["c"].alias("l"),
        ),
    )
    return (
        subs.crossJoin(F.broadcast(_pq_cb_df(spark, cb)))
        .withColumn("_dl", F.array_min(structs))
        .select(
            "vec_id", "s", "subvec", F.col("_dl")["l"].alias("code")
        )
    )


def learned_pq_codebooks(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rounds: int = PQ_ROUNDS,
) -> list:
    """Fixed-round Lloyd training of the m sub-quantizers — ALL subspaces
    in the same jobs (the subspace id is just another grouping key), so a
    round costs one scan + one partial-agg shuffle regardless of m:

    - init: code = md5(vec_id || ':' || s) % ksub — per-(vector, subspace)
      md5 bucketing, the repo's portable seeding (row-order-free);
    - round: per-(s, code, dim) mean ROUNDED to 1e-6 (the cross-engine
      re-anchor learned_centroids established), then reassign every
      sub-vector to its nearest code within its subspace.

    The m·ksub x subdim codebook collects to the driver (bounded by
    construction) and re-enters the next round as broadcast DATA via
    _pq_assign. Dead codes stay dead — both engines replay the same
    deaths. Memoized per table identity. Returns [(s, code, [floats])]
    sorted."""
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        key = f"{src}|{st.st_size}|{st.st_mtime_ns}|{m}|{ksub}|{rounds}"
    except OSError:
        key = f"{src}|nostat|{m}|{ksub}|{rounds}"
    if key in _PQ_MEMO:
        return _PQ_MEMO[key]

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = _train_pq(emb, m, ksub, rounds)
    _PQ_MEMO[key] = cb
    return cb


def _train_pq(emb: DataFrame, m: int, ksub: int, rounds: int) -> list:
    """The fixed-round sub-quantizer training loop over ANY (vec_id,
    embedding) frame — the plain path trains on raw vectors, the
    residual path (learned_pq_res_codebooks) on x − coarse_centroid."""
    from ..functions.hashing import md5_long32

    dim = len(emb.select("embedding").head()["embedding"])
    subdim = dim // m
    subs = _pq_subs(emb, m, subdim)
    assigned = subs.select(
        "vec_id",
        "s",
        "subvec",
        (
            md5_long32(
                F.concat(
                    F.col("vec_id").cast("string"),
                    F.lit(":"),
                    F.col("s").cast("string"),
                )
            )
            % ksub
        ).cast("int").alias("code"),
    )
    cb: list = []
    for _ in range(rounds):
        # Two grouping stages, struct argmin kept OUT of the generator
        # projection — the same analyzer quirk learned_centroids documents.
        rows = (
            assigned.select("s", "code", F.posexplode("subvec").alias("j", "x"))
            .groupBy("s", "code", "j")
            .agg(F.round(F.avg("x"), 6).alias("c"))
            .groupBy("s", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "c"))),
                    lambda t: t["c"],
                ).alias("cvec")
            )
            .collect()
        )
        cb = sorted(
            (int(r["s"]), int(r["code"]), [float(x) for x in r["cvec"]])
            for r in rows
        )
        assigned = _pq_assign(subs, cb)
    return cb


def pq_encode(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rounds: int = PQ_ROUNDS,
) -> DataFrame:
    """The compressed corpus: every vector's m PQ codes, one (vec_id, sub,
    code) row per subspace. One scan + the broadcast codebook — this is
    the table a 100 TB deployment stores INSTEAD of raw embeddings for
    serving (8 bytes/vector here vs 256 of float32)."""
    cb = learned_pq_codebooks(spark, sf_dir, m=m, ksub=ksub, rounds=rounds)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").head()["embedding"])
    subs = _pq_subs(emb, m, dim // m)
    return _pq_assign(subs, cb).select(
        "vec_id",
        F.col("s").cast("int").alias("sub"),
        F.col("code").cast("int").alias("code"),
    )


def build_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """One-time IVF-PQ layout: (vec_id, codes array<int>) partitioned by
    the LEARNED coarse cluster (the same learned_centroids lists every IVF
    operator probes). The serving scans below read ONLY this index — never
    the raw embedding table — which is the entire point of PQ: at 100 TB
    the codes table is ~32x smaller than the vectors, and a probe reads
    nprobe partitions of it. Idempotent per table identity."""
    import os

    # the layout depends on the quantizer geometry, so the idempotence key
    # carries (m, ksub, rounds) alongside the table identity — a constants
    # change must rebuild, not silently serve codes of the old shape
    out_dir = _index_dir(
        f"ivfpq_index_m{PQ_M}k{PQ_KSUB}r{PQ_ROUNDS}", sf_dir
    )
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    cb = learned_pq_codebooks(spark, sf_dir)
    cents = learned_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").head()["embedding"])
    codes = (
        _pq_assign(_pq_subs(emb, PQ_M, dim // PQ_M), cb)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda t: t["code"],
            ).alias("codes")
        )
    )
    coarse = _with_nearest_centroid(emb, cents, "embedding", "_b").select(
        "vec_id", F.col("_b")["l"].alias("cluster")
    )
    (
        codes.join(coarse, "vec_id")
        .repartition("cluster")
        .write.partitionBy("cluster")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def _pq_query_lut(
    spark: SparkSession, sf_dir: str, cb: list, vec_id: int, m: int, subdim: int
) -> dict:
    """The query's ADC lookup table {(s, code): rounded squared L2} —
    computed by the SAME Spark fold (_sq_dist + F.round HALF_UP) that
    trained the codebook, not driver-side Python (whose round() is
    half-to-even — a real cross-engine hazard at exact .5e-7 boundaries).
    One single-row job; m·ksub values out."""
    qsubs = _pq_subs(
        load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == vec_id),
        m,
        subdim,
    )
    rows = (
        qsubs.crossJoin(F.broadcast(_pq_cb_df(spark, cb)))
        .select(
            "s",
            "subvec",
            F.explode(
                F.filter(F.col("_pqcb"), lambda e: e["s"] == F.col("s"))
            ).alias("e"),
        )
        .select(
            "s",
            F.col("e")["c"].alias("c"),
            F.round(_sq_dist(F.col("subvec"), F.col("e")["v"]), 6).alias("d"),
        )
        .collect()
    )
    return {(int(r["s"]), int(r["c"])): float(r["d"]) for r in rows}


def _adc_expr(lut: dict, m: int, ksub: int):
    """ADC distance over a ``codes`` array column: sum over subspaces of
    LUT[s][codes[s]] — the lut folds into the plan as m·ksub literal
    doubles (64 here; 4096 at production m=16 x ksub=256 — constants, not
    per-centroid structs, so no analyzer blowup), making the serving scan
    pure whole-stage-codegen arithmetic with zero joins."""
    lut_arr = F.array(
        *[
            lit_doubles(lut.get((s, c), float("inf")) for c in range(ksub))
            for s in range(m)
        ]
    )
    terms = [
        F.element_at(F.element_at(lut_arr, s + 1), F.col("codes")[s] + 1)
        for s in range(m)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return F.round(total, 4)


def ann_pq_adc_topk(
    spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Asymmetric-distance top-k over the FLAT compressed corpus: one scan
    of the PQ codes index (never the raw vectors), ADC arithmetic from the
    literal per-query LUT, TakeOrderedAndProject for the k rows. Both
    engines rank by the ROUNDED distance (1e-4) with ties to the lower
    vec_id, so the selected set is hash-identical. The exhaustive-ADC
    baseline FAISS calls IndexPQ — ann_ivfpq_topk adds the list pruning."""
    cb = learned_pq_codebooks(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").head()["embedding"])
    lut = _pq_query_lut(spark, sf_dir, cb, vec_id, PQ_M, dim // PQ_M)
    codes = spark.read.parquet(build_pq_index(spark, sf_dir))
    scored = codes.filter(F.col("vec_id") != vec_id).select(
        "vec_id", _adc_expr(lut, PQ_M, PQ_KSUB).alias("adc_dist")
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc()).limit(k)


def ann_ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    nprobe: int | None = None,
) -> DataFrame:
    """IVF-PQ serving — the full production composition: the query's
    nprobe nearest LEARNED coarse lists become a literal IN-list over the
    partitioned codes index (PartitionFilters prune to nprobe lists), and
    the surviving codes rank by ADC. At 100 TB a query touches
    nprobe/n_lists of a table that is itself ~32x smaller than the
    vectors — the standard FAISS IVFPQ shape, expressed as a pruned
    parquet scan + codegen arithmetic + TakeOrderedAndProject."""
    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    cb = learned_pq_codebooks(spark, sf_dir)
    cents = learned_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").head()["embedding"])
    lut = _pq_query_lut(spark, sf_dir, cb, vec_id, PQ_M, dim // PQ_M)
    probes = _query_probe_clusters(spark, sf_dir, vec_id, cents, nprobe)
    codes = spark.read.parquet(build_pq_index(spark, sf_dir))
    scored = (
        codes.filter(F.col("cluster").isin(probes))  # nprobe-partition pruned
        .filter(F.col("vec_id") != vec_id)
        .select("vec_id", _adc_expr(lut, PQ_M, PQ_KSUB).alias("adc_dist"))
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc()).limit(k)


def ann_pq_recall_audit(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_queries: int = 50,
    m: int = PQ_M,
) -> DataFrame:
    """Measured recall@k of exhaustive-ADC ranking vs exact global kNN on
    the audit sample — what quantization alone costs, BEFORE any list
    pruning (compare ann_ivf_recall_audit, which measures pruning alone on
    exact distances). The quartet {label 0.08, sign-LSH, learned-IVF, PQ}
    is the complete quantizer decision kit for a 100 TB corpus pass.

    Scale shape: per-query LUTs are a broadcast (sample x m·ksub) table —
    the asymmetric trick means the corpus side never touches a raw vector,
    only a broadcast-hash-join on (s, code) and a partial-agg sum over m
    rows per (query, vector). Exact side is the shared _exact_knn
    verifier. One row out."""
    cb = learned_pq_codebooks(spark, sf_dir, m=m)
    emb = _audit_emb(spark, sf_dir)
    sample = _audit_sample(emb, n_queries)
    exact = _exact_knn(emb, sample, k)
    dim = len(emb.select("embedding").head()["embedding"])
    ksub, subdim = PQ_KSUB, dim // m

    # per-query LUT rows (qid, s, c, d) — sample x m·ksub, broadcast-sized
    qsubs = sample.select(
        F.col("qid"),
        F.posexplode(
            F.array(
                *[
                    F.slice("qemb", s * subdim + 1, subdim).cast("array<double>")
                    for s in range(m)
                ]
            )
        ).alias("s", "subvec"),
    )
    luts = (
        qsubs.crossJoin(F.broadcast(_pq_cb_df(spark, cb)))
        .select(
            "qid",
            "s",
            "subvec",
            F.explode(
                F.filter(F.col("_pqcb"), lambda e: e["s"] == F.col("s"))
            ).alias("e"),
        )
        .select(
            "qid",
            "s",
            F.col("e")["c"].alias("code"),
            F.round(_sq_dist(F.col("subvec"), F.col("e")["v"]), 6).alias("d"),
        )
    )
    codes = pq_encode(spark, sf_dir, m=m).withColumnRenamed("sub", "s")
    adc = (
        codes.join(F.broadcast(luts), ["s", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        # ordered fold, not sum(): both engines accumulate the m lut terms
        # in subspace order, so a result landing exactly on a 1e-4 rounding
        # boundary cannot flip between them (it did once at sf0.001)
        .agg(F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "d"))),
                    lambda t: t["d"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("adc_dist"))
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("adc_dist").asc(), F.col("vec_id").asc()
        )
    )
    pq_top = (
        adc.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select("qid", F.col("vec_id").alias("nbr"), F.lit(1).alias("hit"))
    )
    per_q = (
        exact.join(pq_top, ["qid", "nbr"], "left")
        .groupBy("qid")
        .agg((F.count("hit") / F.lit(k)).alias("recall"))
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.lit(k).alias("k"),
        F.round(F.avg("recall"), 4).alias("mean_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ (r10): PQ over x − coarse_centroid — true FAISS IVFPQ
# ---------------------------------------------------------------------------

_PQ_RES_MEMO: dict[str, list] = {}


def _coarse_cents_df(spark: SparkSession, cents: list) -> DataFrame:
    """The coarse centroid table as ONE broadcastable row (same bounded
    data-path discipline as _pq_cb_df / _dist_structs_col's large-k arm)."""
    return spark.createDataFrame(
        [([(int(cid), [float(x) for x in v]) for cid, v in cents],)],
        "_cents array<struct<i:int,v:array<double>>>",
    )


def _residual_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster, embedding = x − coarse_centroid[cluster]): the
    residual space the true IVFPQ quantizes. Residuals concentrate around
    the origin with far less variance than raw vectors (the coarse
    quantizer has already explained the cluster mean), so the SAME code
    budget quantizes them more faithfully — the whole reason FAISS encodes
    residuals. One scan: assignment argmin + a zip_with subtraction
    against the broadcast centroid row, exact float arithmetic (the
    centroids are already 1e-6-rounded, so both engines subtract
    identical doubles)."""
    cents = learned_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned = _with_nearest_centroid(emb, cents, "embedding", "_b").select(
        "vec_id", "embedding", F.col("_b")["l"].alias("cluster")
    )
    cvec = F.element_at(
        F.filter(F.col("_cents"), lambda c: c["i"] == F.col("cluster")), 1
    )["v"]
    res = F.zip_with(
        F.col("embedding").cast("array<double>"), cvec, lambda a, b: a - b
    )
    return (
        assigned.crossJoin(F.broadcast(_coarse_cents_df(spark, cents)))
        .select("vec_id", "cluster", res.alias("embedding"))
    )


def learned_pq_res_codebooks(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rounds: int = PQ_ROUNDS,
) -> list:
    """learned_pq_codebooks trained in RESIDUAL space — identical loop
    (_train_pq), identical md5 init and rounding contract, different
    input geometry. Memoized per table identity like the plain form."""
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        key = f"{src}|{st.st_size}|{st.st_mtime_ns}|res|{m}|{ksub}|{rounds}"
    except OSError:
        key = f"{src}|nostat|res|{m}|{ksub}|{rounds}"
    if key in _PQ_RES_MEMO:
        return _PQ_RES_MEMO[key]
    cb = _train_pq(
        _residual_emb(spark, sf_dir).select("vec_id", "embedding"),
        m,
        ksub,
        rounds,
    )
    _PQ_RES_MEMO[key] = cb
    return cb


def build_ivfpq_res_index(spark: SparkSession, sf_dir: str) -> str:
    """The residual-coded IVF-PQ layout: (vec_id, codes) where codes
    quantize x − centroid[home cluster], partitioned by that cluster.
    Same 8 B/vector, geometry-keyed idempotence as build_pq_index."""
    import os

    out_dir = _index_dir(
        f"ivfpqres_index_m{PQ_M}k{PQ_KSUB}r{PQ_ROUNDS}", sf_dir
    )
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    cb = learned_pq_res_codebooks(spark, sf_dir)
    res = _residual_emb(spark, sf_dir)
    dim = len(res.select("embedding").head()["embedding"])
    codes = (
        _pq_assign(
            _pq_subs(res.select("vec_id", "embedding"), PQ_M, dim // PQ_M), cb
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda t: t["code"],
            ).alias("codes")
        )
    )
    (
        codes.join(res.select("vec_id", "cluster"), "vec_id")
        .repartition("cluster")
        .write.partitionBy("cluster")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def _pq_luts_for_vectors(
    spark: SparkSession, rows: list, cb: list, m: int, subdim: int
) -> dict:
    """{(tag, s, code): rounded squared L2} for a small list of (tag,
    vector) pairs — the multi-vector generalization of _pq_query_lut,
    computed by the SAME Spark fold + HALF_UP rounding as training (never
    driver-side Python round). Bounded: len(rows) x m·ksub values."""
    df = spark.createDataFrame(
        [(int(t), [float(x) for x in v]) for t, v in rows],
        "tag int, vec array<double>",
    )
    subs = df.select(
        "tag",
        F.posexplode(
            F.array(*[F.slice("vec", s * subdim + 1, subdim) for s in range(m)])
        ).alias("s", "subvec"),
    )
    out = (
        subs.crossJoin(F.broadcast(_pq_cb_df(spark, cb)))
        .select(
            "tag",
            "s",
            "subvec",
            F.explode(
                F.filter(F.col("_pqcb"), lambda e: e["s"] == F.col("s"))
            ).alias("e"),
        )
        .select(
            "tag",
            "s",
            F.col("e")["c"].alias("c"),
            F.round(_sq_dist(F.col("subvec"), F.col("e")["v"]), 6).alias("d"),
        )
        .collect()
    )
    return {(int(r["tag"]), int(r["s"]), int(r["c"])): float(r["d"]) for r in out}


def ann_ivfpq_res_topk(
    spark: SparkSession,
    sf_dir: str,
    vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    nprobe: int | None = None,
) -> DataFrame:
    """Residual IVF-PQ serving — the full FAISS IVFPQ contract: per probed
    list L the query builds a lookup table against ITS residual q −
    centroid[L] (the asymmetric trick now applied per list), candidates
    rank by summed lut entries over their stored residual codes. The scan
    is still exactly nprobe partitions of the 8 B/vector codes index with
    the per-list luts folded as literals (nprobe x m·ksub doubles) and a
    cluster CASE choosing the lut — zero joins, whole-stage codegen,
    TakeOrderedAndProject. EXPERIMENTAL on this corpus: the measured gap
    runs the OTHER way here (plain 0.3067 vs residual 0.2667 at nprobe=3,
    still behind at nprobe=4 — RECALL_r12.json), so the default serving
    path is plain PQ + exact re-rank (ann_ivfpq_rerank_topk); residual
    pays only when vectors concentrate around their coarse centroids,
    and ann_ivfpq_recall_audit exists to re-make that call per corpus."""
    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    cents = learned_centroids(spark, sf_dir)
    cb = learned_pq_res_codebooks(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").head()["embedding"])
    subdim = dim // PQ_M
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    q = [float(x) for x in qvec]
    probes = _query_probe_clusters(spark, sf_dir, vec_id, cents, nprobe)
    cmap = dict(cents)
    # exact float subtraction (no rounding) — the centroids are already
    # 1e-6-rounded doubles, so both engines build identical residuals
    qres_rows = [(cl, [a - b for a, b in zip(q, cmap[cl])]) for cl in probes]
    luts = _pq_luts_for_vectors(spark, qres_rows, cb, PQ_M, subdim)
    codes = spark.read.parquet(build_ivfpq_res_index(spark, sf_dir))
    adc = None
    for cl in probes:
        lut_cl = {
            (s, c): d for (tag, s, c), d in luts.items() if tag == cl
        }
        branch = _adc_expr(lut_cl, PQ_M, PQ_KSUB)
        adc = (
            F.when(F.col("cluster") == cl, branch)
            if adc is None
            else adc.when(F.col("cluster") == cl, branch)
        )
    scored = (
        codes.filter(F.col("cluster").isin(probes))
        .filter(F.col("vec_id") != vec_id)
        .select("vec_id", adc.alias("adc_dist"))
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc()).limit(k)


def ann_ivfpq_recall_audit(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_queries: int = 50,
    nprobe: int | None = None,
) -> DataFrame:
    """Plain vs RESIDUAL IVF-PQ recall@k in one row — the measured answer
    to "does residual encoding pay for itself at the same code budget?",
    completing the quantizer decision kit (label / sign-LSH / learned-IVF
    / PQ / IVFPQ±residual). Both variants probe the same nprobe learned
    lists and rank candidates purely in the compressed domain (the full
    serving pipeline, pruning + quantization error together), against the
    shared exact-cosine ground truth every audit here uses.

    Scale shape: everything query-sided is sample-bounded and broadcast
    (probe lists, per-query and per-(query, list) luts — nprobe x m·ksub
    rows each); the corpus side contributes one codes pass per variant
    and a broadcast-hash join per lut; candidate sets are list-pruned
    BEFORE any distance work. One global row out."""
    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    from pyspark.sql import Window

    cents = learned_centroids(spark, sf_dir)
    cb_p = learned_pq_codebooks(spark, sf_dir)
    cb_r = learned_pq_res_codebooks(spark, sf_dir)
    emb = _audit_emb(spark, sf_dir)
    sample = _audit_sample(emb, n_queries)
    exact = _exact_knn(emb, sample, k)
    dim = len(emb.select("embedding").head()["embedding"])
    m, ksub, subdim = PQ_M, PQ_KSUB, dim // PQ_M

    home = _with_nearest_centroid(
        emb.select("vec_id", "embedding"), cents, "embedding", "_b"
    ).select("vec_id", F.col("_b")["l"].alias("cl"))
    qpr = _dist_structs_col(sample, cents, "qemb", "_cdl").select(
        "qid",
        "qemb",
        F.explode(
            F.transform(
                F.slice(F.array_sort(F.col("_cdl")), 1, nprobe),
                lambda s: s["l"],
            )
        ).alias("cl"),
    )
    cand = (
        home.join(qpr.select("qid", "cl"), "cl")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "cl")
    )

    def _sub_explode(df, vec_col, *keep):
        return df.select(
            *keep,
            F.posexplode(
                F.array(
                    *[
                        F.slice(vec_col, s * subdim + 1, subdim).cast(
                            "array<double>"
                        )
                        for s in range(m)
                    ]
                )
            ).alias("s", "subvec"),
        )

    def _lut_rows(subs_df, cb, *keys):
        return (
            subs_df.crossJoin(F.broadcast(_pq_cb_df(spark, cb)))
            .select(
                *keys,
                "s",
                "subvec",
                F.explode(
                    F.filter(F.col("_pqcb"), lambda e: e["s"] == F.col("s"))
                ).alias("e"),
            )
            .select(
                *keys,
                "s",
                F.col("e")["c"].alias("code"),
                F.round(_sq_dist(F.col("subvec"), F.col("e")["v"]), 6).alias("d"),
            )
        )

    def _topk_hits(adc, tag):
        rk = F.row_number().over(
            Window.partitionBy("qid").orderBy(
                F.col("adc_dist").asc(), F.col("vec_id").asc()
            )
        )
        return (
            adc.withColumn("rk", rk)
            .filter(F.col("rk") <= k)
            .select("qid", F.col("vec_id").alias("nbr"), F.lit(1).alias(tag))
        )

    # plain: one lut per query against the raw-space codebook
    luts_p = _lut_rows(_sub_explode(sample, F.col("qemb"), "qid"), cb_p, "qid")
    codes_p = pq_encode(spark, sf_dir).withColumnRenamed("sub", "s")
    adc_p = (
        cand.join(codes_p, "vec_id")
        .join(F.broadcast(luts_p), ["qid", "s", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "d"))),
                    lambda t: t["d"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("adc_dist"))
    )

    # residual: one lut per (query, probed list) against the residual
    # codebook, keyed additionally by the candidate's home list
    cvec = F.element_at(
        F.filter(F.col("_cents"), lambda c: c["i"] == F.col("cl")), 1
    )["v"]
    qres = (
        qpr.crossJoin(F.broadcast(_coarse_cents_df(spark, cents)))
        .select(
            "qid",
            "cl",
            F.zip_with(
                F.col("qemb").cast("array<double>"), cvec, lambda a, b: a - b
            ).alias("qres"),
        )
    )
    luts_r = _lut_rows(
        _sub_explode(qres, F.col("qres"), "qid", "cl"), cb_r, "qid", "cl"
    )
    res = _residual_emb(spark, sf_dir)
    codes_r = _pq_assign(
        _pq_subs(res.select("vec_id", "embedding"), m, subdim), cb_r
    ).select("vec_id", "s", "code")
    adc_r = (
        cand.join(codes_r, "vec_id")
        .join(F.broadcast(luts_r), ["qid", "cl", "s", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "d"))),
                    lambda t: t["d"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("adc_dist"))
    )

    joined = (
        exact.join(_topk_hits(adc_p, "p_hit"), ["qid", "nbr"], "left")
        .join(_topk_hits(adc_r, "r_hit"), ["qid", "nbr"], "left")
    )
    per_q = joined.groupBy("qid").agg(
        (F.count("p_hit") / F.lit(k)).alias("rp"),
        (F.count("r_hit") / F.lit(k)).alias("rr"),
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.lit(k).alias("k"),
        F.round(F.avg("rp"), 4).alias("recall_plain"),
        F.round(F.avg("rr"), 4).alias("recall_residual"),
    )


PQ_RERANK_MULT = 10  # ADC shortlist size = mult * k before the exact pass


def ann_ivfpq_rerank_topk(
    spark: SparkSession,
    sf_dir: str,
    vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    nprobe: int | None = None,
    shortlist_mult: int = PQ_RERANK_MULT,
) -> DataFrame:
    """IVF-PQ serving with an exact re-rank stage (r11, VERDICT r10 #8) —
    the standard FAISS fix for ADC's quantization error: the pruned ADC
    scan produces a SHORTLIST of ``shortlist_mult * k`` candidates (cheap,
    compressed-domain, nprobe partitions), and only those few rows fetch
    their true vectors for an exact cosine ranking. Cost at 100 TB: the
    same pruned codes scan as ann_ivfpq_topk plus a broadcast semi-join
    of ~mult*k ids against the vector table — bounded by the shortlist,
    never the corpus. Measured on the audit harness (RECALL_r11.json,
    sf0.01): pure ADC recall 0.3067 at k=3 rises to 0.5333 at mult=5 and
    0.6267 at mult=10 — 93% of the nprobe=3 pruning ceiling (0.6733), so
    quantization error is nearly eliminated and what remains is the
    coarse quantizer's miss rate (raise nprobe, not the shortlist).
    Output (vec_id, cos_sim), same contract as the rest of the serving
    family."""
    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    cb = learned_pq_codebooks(spark, sf_dir)
    cents = learned_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").head()["embedding"])
    lut = _pq_query_lut(spark, sf_dir, cb, vec_id, PQ_M, dim // PQ_M)
    probes = _query_probe_clusters(spark, sf_dir, vec_id, cents, nprobe)
    codes = spark.read.parquet(build_pq_index(spark, sf_dir))
    shortlist = (
        codes.filter(F.col("cluster").isin(probes))
        .filter(F.col("vec_id") != vec_id)
        .select("vec_id", _adc_expr(lut, PQ_M, PQ_KSUB).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(shortlist_mult * k)
        .select("vec_id")
    )
    qvec, _ = _query_vector(spark, sf_dir, vec_id)
    q = lit_doubles(qvec)
    reranked = emb.join(F.broadcast(shortlist), "vec_id").select(
        "vec_id", cosine(F.col("embedding"), q).alias("cos")
    )
    return (
        reranked.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def ann_ivfpq_rerank_recall_audit(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_queries: int = 50,
    nprobe: int | None = None,
    mults: tuple = (1, 5, 10),
) -> DataFrame:
    """Measured recall@k of ADC-shortlist -> exact-rerank at several
    shortlist sizes, plus the nprobe pruning CEILING (recall if the
    shortlist were every probed candidate) — the curve that decides
    whether a re-rank stage pays for itself and where it saturates.

    Uses the identity that makes the measurement exact and cheap: an
    exact re-rank of a shortlist surfaces precisely the true neighbors
    PRESENT in the shortlist (a true top-k neighbor beats every
    non-neighbor on exact distance), so recall@mult =
    |exact_topk ∩ ADC_top(mult*k)| / k — no second distance pass needed.
    mult=1 is pure-ADC serving (the ann_ivfpq_topk baseline); the
    ceiling is the learned-IVF pruning recall at this nprobe. All
    query-side tables are sample-bounded broadcasts (the audit-family
    discipline)."""
    if nprobe is None:
        nprobe = IVF_JOIN_NPROBE
    from pyspark.sql import Window

    cents = learned_centroids(spark, sf_dir)
    cb = learned_pq_codebooks(spark, sf_dir)
    emb = _audit_emb(spark, sf_dir)
    sample = _audit_sample(emb, n_queries)
    exact = _exact_knn(emb, sample, k)
    dim = len(emb.select("embedding").head()["embedding"])
    m, subdim = PQ_M, dim // PQ_M

    home = _with_nearest_centroid(
        emb.select("vec_id", "embedding"), cents, "embedding", "_b"
    ).select("vec_id", F.col("_b")["l"].alias("cl"))
    qpr = _dist_structs_col(sample, cents, "qemb", "_cdl").select(
        "qid",
        F.explode(
            F.transform(
                F.slice(F.array_sort(F.col("_cdl")), 1, nprobe),
                lambda s: s["l"],
            )
        ).alias("cl"),
    )
    cand = (
        home.join(qpr, "cl")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )
    qsubs = sample.select(
        "qid",
        F.posexplode(
            F.array(
                *[
                    F.slice("qemb", s * subdim + 1, subdim).cast("array<double>")
                    for s in range(m)
                ]
            )
        ).alias("s", "subvec"),
    )
    luts = (
        qsubs.crossJoin(F.broadcast(_pq_cb_df(spark, cb)))
        .select(
            "qid",
            "s",
            "subvec",
            F.explode(
                F.filter(F.col("_pqcb"), lambda e: e["s"] == F.col("s"))
            ).alias("e"),
        )
        .select(
            "qid",
            "s",
            F.col("e")["c"].alias("code"),
            F.round(_sq_dist(F.col("subvec"), F.col("e")["v"]), 6).alias("d"),
        )
    )
    codes = pq_encode(spark, sf_dir).withColumnRenamed("sub", "s")
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(luts), ["qid", "s", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "d"))),
                    lambda t: t["d"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("adc_dist"))
    )
    ranked = adc.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(
                F.col("adc_dist").asc(), F.col("vec_id").asc()
            )
        ),
    )
    joined = exact.join(
        ranked.select("qid", F.col("vec_id").alias("nbr"), "rk"),
        ["qid", "nbr"],
        "left",
    )
    aggs = [F.count("*").alias("n_hits_possible")]
    for mult in mults:
        aggs.append(
            F.sum(
                F.when(F.col("rk") <= mult * k, 1).otherwise(0)
            ).alias(f"h{mult}")
        )
    aggs.append(F.sum(F.when(F.col("rk").isNotNull(), 1).otherwise(0)).alias("hc"))
    per_q = joined.groupBy("qid").agg(*aggs)
    out = [
        F.count("*").alias("n_queries"),
        F.lit(k).alias("k"),
        F.lit(nprobe).alias("nprobe"),
    ]
    for mult in mults:
        out.append(
            F.round(F.avg(F.col(f"h{mult}") / F.lit(k)), 4).alias(
                f"recall_mult{mult}"
            )
        )
    out.append(F.round(F.avg(F.col("hc") / F.lit(k)), 4).alias("recall_ceiling"))
    return per_q.agg(*out)


def embedding_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene gate — run BEFORE building any index: counts of
    NaN-carrying, zero-norm, and off-dimension vectors (each silently
    poisons cosine/IVF math: NaN propagates through every distance,
    zero-norm divides by zero, a short vector breaks the zip), plus exact
    norm percentiles (p50/p99 — a norm distribution with a wild tail says
    the embedder mixed checkpoints; MIPS norm-augmentation needs the max
    anyway). One scan, one global aggregate row; the percentile is the
    exact interpolated form at test SF (the percentile_prices precedent —
    swap approx at 100 TB, same shape)."""
    from ..functions.vectors import norm

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim_mode = emb.select(F.size("embedding").alias("d")).groupBy("d").count()
    top_dim = (
        dim_mode.orderBy(F.col("count").desc(), F.col("d").asc())
        .limit(1)
        .collect()[0]["d"]
    )
    scored = emb.select(
        F.exists("embedding", F.isnan).cast("int").alias("has_nan"),
        (F.size("embedding") != top_dim).cast("int").alias("bad_dim"),
        norm(F.col("embedding")).alias("nrm"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.lit(int(top_dim)).alias("dim"),
        F.sum("has_nan").alias("n_nan"),
        F.sum("bad_dim").alias("n_bad_dim"),
        F.sum(F.when(F.col("nrm") == 0.0, 1).otherwise(0)).alias("n_zero_norm"),
        F.round(F.expr("percentile(nrm, 0.5)"), 6).alias("norm_p50"),
        F.round(F.expr("percentile(nrm, 0.99)"), 6).alias("norm_p99"),
    )
