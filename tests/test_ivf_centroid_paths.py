"""VERDICT r9 #2: the IVF family's centroid primitive must survive
production k. Below IVF_LITERAL_K_MAX the centroids fold into the plan as
literal expressions (zero joins — right at probe-scale k); above, they
ride as a broadcast single-row data array through the SAME _sq_dist fold
(O(1) plan nodes at any k). These tests pin the contract:

1. the two strategies are row-identical (same arithmetic, same rounding,
   same tie-break) — forced by dropping the gate to 0;
2. at k=256 (4x over the literal gate, the regime where the literal tree
   is the documented analyzer hazard) the data path compiles to a
   broadcast plan with no per-centroid literals and produces a valid
   argmin, cross-checked row-by-row against a Python sequential-fold
   recomputation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_samanvay_a_true_hybrid_htap_database_spark.operators import similarity
from project_samanvay_a_true_hybrid_htap_database_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "op",
    ["kmeans_iterate", "knn_join_ivf_blocked", "ann_ivf_topk"],
)
def test_data_path_matches_literal_path(spark, monkeypatch, op):
    """Same centroids (memoized), both strategies: identical rows. The
    gate constant is read at call time, so forcing it to 0 routes every
    consumer through the broadcast data path."""
    fn = getattr(similarity, op)
    lit = _rows(fn(spark, SF_DIR))
    monkeypatch.setattr(similarity, "IVF_LITERAL_K_MAX", 0)
    dat = _rows(fn(spark, SF_DIR))
    assert lit == dat
    assert len(lit) > 0


def test_k256_data_path_compiles_and_assigns(spark):
    """k=256 on sf0.01: the literal strategy would fold 256 x 64 distance
    expressions into every consumer; the data path must (a) compile to a
    single broadcast of the centroid array with no per-centroid literals,
    (b) assign every vector, (c) agree with a driver-side sequential-fold
    argmin within the 1e-6 rounding the contract specifies."""
    cents = similarity.learned_centroids(spark, SF01_DIR, k=256, rounds=2)
    assert len(cents) > similarity.IVF_LITERAL_K_MAX

    emb = load_table(spark, SF01_DIR, "embeddings").select("vec_id", "embedding")
    out = similarity._with_nearest_centroid(emb, cents, "embedding", "b").select(
        "vec_id", F.col("b.l").alias("cluster"), F.col("b.d").alias("dist_sq")
    )

    # plan shape: one broadcast (the single-row centroid array), no
    # literal centroid floats inlined into the plan text
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert len(plan) < 100_000, "plan text grew with k — literals leaked back in"

    rows = out.collect()
    n = emb.count()
    assert len(rows) == n and n > 0
    ids = {cid for cid, _ in cents}
    assert all(r["cluster"] in ids for r in rows)

    # driver-side cross-check on a sample: the Spark winner's TRUE
    # (unrounded, same sequential fold) distance must be within one
    # rounding step of the true minimum across all 256 centroids
    emb_py = {r["vec_id"]: r["embedding"] for r in emb.limit(25).collect()}
    cmap = dict(cents)
    by_id = {r["vec_id"]: r for r in rows if r["vec_id"] in emb_py}
    for vid, vec in emb_py.items():
        dists = {}
        for cid, c in cmap.items():
            acc = 0.0
            for a, b in zip(vec, c):
                d = float(a) - b
                acc += d * d
            dists[cid] = acc
        got = by_id[vid]
        assert abs(dists[got["cluster"]] - got["dist_sq"]) < 1e-6 + 1e-9
        assert dists[got["cluster"]] <= min(dists.values()) + 2e-6
