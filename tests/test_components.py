"""Transitive-closure canonicalization tests: min-label connected
components over near-dup pairs (the cluster step exact first-writer-wins
dedup, crawler.go:562-566, does not need but near-dup curation does)."""

from __future__ import annotations

from webcrawler_go_spark.operators.components import (
    canonicalize_closure,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_chain_collapses_to_one_canonical(spark):
    # A~B, B~C but never A~C: closure must still put all three in one
    # cluster with canonical = min id (one-pass min-neighbor would split
    # it: C's only neighbor is B, so C would canonicalize to B).
    comp = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    got = {r.node: r.label for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges_past_one_hop(spark):
    n = 12  # diameter 11 > 1: requires the iteration, not a single join
    comp = connected_components(_edges(spark, [(i, i + 1) for i in range(1, n)]))
    got = {r.node: r.label for r in comp.collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_multiple_components_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    pairs = _edges(spark, [(5, 2), (2, 7), (3, 8)])
    got = {
        r.doc_id: r.canonical_id
        for r in canonicalize_closure(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 2, 6: 6, 7: 2, 8: 3}


def test_diameter_50_path_converges_in_log_rounds(spark):
    """Pointer doubling (round-4 directive #8): a diameter-50 path graph
    must converge in O(log d) iterations, not O(d). Flood extends reach
    by 1 and doubling doubles it (reach(k) ≈ 2^(k+1) − 2), so 50 hops
    need 5 propagation rounds + 1 convergence-detection round."""
    import math

    n = 51  # nodes 1..51, diameter 50
    stats: dict = {}
    comp = connected_components(
        _edges(spark, [(i, i + 1) for i in range(1, n)]), stats=stats
    )
    got = {r.node: r.label for r in comp.collect()}
    assert got == {i: 1 for i in range(1, n + 1)}
    assert stats["iterations"] <= math.ceil(math.log2(50)) + 2  # = 8; measured 6


def test_non_convergence_raises_instead_of_wrong_labels(spark):
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(1, 8)]), max_iter=2
        )


def test_pagerank_fixed_point_exact(spark):
    """Integer fixed-point PageRank: bit-exact vs an independent scalar
    reference; sink nodes keep only teleport mass; rank order follows
    in-link structure."""
    from webcrawler_go_spark.operators.components import pagerank_fixed_point

    E = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {
        r.node: r.pagerank_scaled
        for r in pagerank_fixed_point(edges, iterations=3).collect()
    }
    SCALE = 10**12
    n = 4
    base = SCALE // n
    tel = base * 15 // 100
    deg = {1: 2, 2: 1, 3: 1, 4: 1}
    ranks = {i: base for i in (1, 2, 3, 4)}
    for _ in range(3):
        s: dict = {}
        for a, b in E:
            s[b] = s.get(b, 0) + ranks[a] // deg[a]
        ranks = {i: tel + s.get(i, 0) * 85 // 100 for i in (1, 2, 3, 4)}
    assert got == ranks
    # node 4 has no in-links: teleport only; 3 has the most in-links: top
    assert got[4] == tel
    assert max(got, key=got.get) == 3


def test_hits_matches_scalar_reference(spark):
    """HITS fixed-point: the distributed loop reproduces a scalar
    Python fold exactly (integer L1 rescale, 3 iterations) — including
    the flooring, the max(Σ,1) guard, and sink/source nodes (auth 0
    for in-degree-0, hub 0 for out-degree-0)."""
    from webcrawler_go_spark.operators.components import hits_fixed_point

    E = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {
        r["node"]: (r["auth_scaled"], r["hub_scaled"])
        for r in hits_fixed_point(edges, iterations=3).collect()
    }

    SCALE = 10**6
    nodes = {u for u, _ in E} | {v for _, v in E}
    h = {v: SCALE // len(nodes) for v in nodes}
    a = None
    for _ in range(3):
        a_un = {v: sum(h[u] for (u, w) in E if w == v) for v in nodes}
        sa = sum(a_un.values())
        a = {v: a_un[v] * SCALE // max(sa, 1) for v in nodes}
        h_un = {u: sum(a[w] for (uu, w) in E if uu == u) for u in nodes}
        sh = sum(h_un.values())
        h = {u: h_un[u] * SCALE // max(sh, 1) for u in nodes}
    assert got == {v: (a[v], h[v]) for v in nodes}
    # normalization law: each vector sums to ~SCALE (flooring loss < N)
    assert SCALE - len(nodes) < sum(x for x, _ in got.values()) <= SCALE
    assert SCALE - len(nodes) < sum(x for _, x in got.values()) <= SCALE
