"""Connected-components goldens: chains, merges, isolated pairs."""

from __future__ import annotations

from yamr_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_chain_collapses_to_min(spark):
    # 1-2-3-4 chain plus isolated pair 10-11
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_two_clusters_merge_via_bridge(spark):
    got = _cc(spark, [(5, 6), (8, 9), (6, 8)])
    assert got == {5: 5, 6: 5, 8: 5, 9: 5}


def test_long_chain_converges(spark):
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_adversarial_chain_logarithmic_rounds(spark):
    # A 200-node path is the worst case for plain min-label propagation
    # (O(diameter) = 200 rounds, far past max_iter). The pointer-jump step
    # must contract it in O(log n) rounds: each round the label chain depth
    # roughly halves, so 200 nodes needs ~log2(200)+slack ≈ 10 rounds.
    n = 200
    df = spark.createDataFrame([(i, i + 1) for i in range(n)], "doc_a long, doc_b long")
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, stats=stats).collect()
    }
    assert set(got.values()) == {0} and len(got) == n + 1
    assert stats["rounds"] <= 12, f"chain did not contract: {stats['rounds']} rounds"


def test_clique_converges_fast(spark):
    # near-dup clusters are cliques-ish: must still converge in ≤2 checks
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, stats=stats).collect()
    }
    assert set(got.values()) == {0}
    assert stats["rounds"] <= 2


def test_pagerank_star_and_clique(spark):
    """PageRank sanity on known topologies: in a star, the hub ranks
    strictly above every leaf and all leaves tie; in a 3-clique all
    ranks are equal (symmetry). Ranks stay positive and bounded."""
    from yamr_spark.operators.graph import pagerank

    star_pairs = [(0, i) for i in range(1, 5)]
    star = spark.createDataFrame(
        [(a, b) for a, b in star_pairs] + [(b, a) for a, b in star_pairs],
        "src long, dst long",
    )
    ranks = {r.node: r["rank"] for r in pagerank(star).collect()}
    hub, leaves = ranks[0], [ranks[i] for i in range(1, 5)]
    assert all(hub > lv for lv in leaves)
    assert len(set(leaves)) == 1
    assert all(0 < v < 1 for v in ranks.values())

    cl_pairs = [(0, 1), (0, 2), (1, 2)]
    clique = spark.createDataFrame(
        [(a, b) for a, b in cl_pairs] + [(b, a) for a, b in cl_pairs],
        "src long, dst long",
    )
    cr = {r.node: r["rank"] for r in pagerank(clique).collect()}
    assert len(set(cr.values())) == 1


def test_triangle_counts_golden(spark):
    """K4 minus one edge: nodes {1,2,3,4}, edges 1-2,1-3,2-3,2-4,3-4 →
    triangles (1,2,3) and (2,3,4); nodes 2,3 sit in two each."""
    from yamr_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "doc_a long, doc_b long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_counts_no_triangles(spark):
    from yamr_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    assert triangle_counts(edges).count() == 0


def test_triangle_counts_degree_orientation_equal(spark):
    """VERDICT r06 #8: the degree-(then id)-ordered orientation must
    produce IDENTICAL triangle counts to raw-id orientation — on the
    golden K4-minus-an-edge fixture and on a hub graph (star center +
    attached triangles), the shape whose wedge count the degree
    orientation exists to bound."""
    from yamr_spark.operators.graph import triangle_counts

    k4m = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "doc_a long, doc_b long"
    )
    # hub 0 with spokes 10..19, plus triangles (0,10,11) and (12,13,0)
    # closed through the hub, and one hub-free triangle (20,21,22)
    hub = spark.createDataFrame(
        [(0, s) for s in range(10, 20)]
        + [(10, 11), (12, 13), (20, 21), (20, 22), (21, 22)],
        "doc_a long, doc_b long",
    )
    for edges in (k4m, hub):
        plain = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
        oriented = {
            r.node: r.n_triangles
            for r in triangle_counts(edges, orient_by_degree=True).collect()
        }
        assert plain == oriented and plain
