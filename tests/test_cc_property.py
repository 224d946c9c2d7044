"""Property-based differential for the connected-components family (r10).

CC sits under every dedup grouping (exact cliques, LSH pairs, SemDeDup,
split leakage, the funnel's stage 4), and it has TWO implementations with
one contract: label every node that appears in some pair with its
component's minimum id. The constructed-graph tests pin known shapes
(chains, cliques); this pins the contract on ADVERSARIAL random graphs —
self-loops, parallel/reversed duplicate edges, multiple components,
isolated pairs — against a driver-side union-find oracle.

Hypothesis generates the edge lists; examples are kept small (Spark
round-trips dominate) but the shrinker makes any failure minimal.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_samanvay_a_true_hybrid_htap_database_spark.operators import dedup


def _union_find_labels(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    return {(n, min(members)) for members in comps.values() for n in members}


EDGES = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=EDGES)
def test_both_cc_forms_match_union_find(spark, edges):
    want = _union_find_labels(edges)
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    lp = {
        (r["doc_id"], r["group_id"])
        for r in dedup.connected_components(df, max_iters=100).collect()
    }
    ts = {
        (r["doc_id"], r["group_id"])
        for r in dedup.connected_components_twostar(df).collect()
    }
    assert lp == want
    assert ts == want
