"""PageRank — hand-checked micro-graphs, conservation, determinism."""

from __future__ import annotations

from diagnosisextraction_ml_spark.operators import graph
from diagnosisextraction_ml_spark.operators.graph import BASE_MICRO, TELEPORT_MICRO


def _ranks(df):
    return {r["node"]: r["rank_micro"] for r in df.collect()}


def _manual_pagerank(arcs, n_iter):
    """Reference integer PageRank (pure Python, same arithmetic)."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in arcs:
        deg[s] += 1
    nodes = {n for e in arcs for n in e}
    r = {n: BASE_MICRO for n in nodes}
    for _ in range(n_iter):
        inc = defaultdict(int)
        for s, d in arcs:
            inc[d] += r[s] // deg[s]
        r = {n: TELEPORT_MICRO + (85 * inc.get(n, 0)) // 100 for n in nodes}
    return r


def test_pagerank_matches_manual_on_triangle_plus_tail(spark):
    # triangle 1-2-3 (undirected) with a tail 3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    sym = graph.symmetrize(edges)
    arcs = [(r["src"], r["dst"]) for r in sym.collect()]
    got = _ranks(graph.pagerank(sym, n_iter=4))
    want = _manual_pagerank(arcs, 4)
    assert got == want
    # the hub (3) outranks the leaf (4)
    assert got[3] > got[4]


def test_pagerank_symmetric_path_bit_identical(spark):
    # symmetric=True (adjacency build, exchange-free iterations) must
    # reproduce the general edge-relation path bit-for-bit — including
    # duplicate input edges (collect_set dedups) and both orientations
    # of the caller's undirected list.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 3), (3, 1)],
        "src long, dst long",
    )
    general = _ranks(graph.pagerank(graph.symmetrize(edges), n_iter=4,
                                    assume_distinct=True))
    fast = _ranks(graph.pagerank(edges, n_iter=4, symmetric=True))
    assert fast == general
    top_g = graph.pagerank_top(graph.symmetrize(edges), n_iter=3, k=3,
                               assume_distinct=True).collect()
    top_f = graph.pagerank_top(edges, n_iter=3, k=3, symmetric=True).collect()
    assert [tuple(r) for r in top_g] == [tuple(r) for r in top_f]


def test_pagerank_sink_node_keeps_teleport_only(spark):
    # directed 1 -> 2: node 1 gets no inbound mass after iteration 1
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = _ranks(graph.pagerank(edges, n_iter=2))
    assert got[1] == TELEPORT_MICRO
    # iter 1 leaves r(1)=teleport; iter 2 forwards it damped to node 2
    assert got[2] == TELEPORT_MICRO + (85 * TELEPORT_MICRO) // 100


def test_pagerank_partitioning_invariant(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 23 + 100) for i in range(60)], "src long, dst long"
    )
    sym = graph.symmetrize(edges)
    a = _ranks(graph.pagerank(sym.repartition(1), n_iter=3))
    b = _ranks(graph.pagerank(sym.repartition(13), n_iter=3))
    assert a == b


def test_pagerank_top_total_order(spark):
    edges = graph.symmetrize(
        spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    )
    top = graph.pagerank_top(edges, n_iter=2, k=2).collect()
    assert len(top) == 2
    # rank desc, node asc
    assert (top[0]["rank_micro"], -top[0]["node"]) >= (
        top[1]["rank_micro"],
        -top[1]["node"],
    )


def test_hits_star_graph(spark):
    # star: hubs 1..4 all point at authority 100; one also at 200
    edges = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100), (4, 200)],
        "src long, dst long",
    )
    out = graph.hits_top(edges, n_iter=3, k=10).collect()
    hubs = {r["node"]: r["score_micro"] for r in out if r["role"] == "hub"}
    auth = {r["node"]: r["score_micro"] for r in out if r["role"] == "authority"}
    # node 4 links to both authorities -> top hub (max-normalized to 1e6)
    assert hubs[4] == 1_000_000 and all(hubs[i] < 1_000_000 for i in (1, 2, 3))
    # authority 100 has 4 in-links -> top authority
    assert auth[100] == 1_000_000 and auth[200] < auth[100]


def test_hits_partitioning_invariant(spark):
    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 5 + 100) for i in range(60)], "src long, dst long"
    )
    a = sorted(map(tuple, graph.hits_top(edges.repartition(1), n_iter=3).collect()))
    b = sorted(map(tuple, graph.hits_top(edges.repartition(9), n_iter=3).collect()))
    assert a == b


def test_pagerank_symmetric_random_graphs(spark):
    """Random undirected multigraphs (dupes, reversed dupes, self-loops):
    the symmetric adjacency path must be bit-identical to
    symmetrize()+general on every one."""
    import random

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        edges = [
            (rng.randint(0, 14), rng.randint(0, 14)) for _ in range(40)
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        general = _ranks(graph.pagerank(graph.symmetrize(df), n_iter=4,
                                        assume_distinct=True))
        fast = _ranks(graph.pagerank(df, n_iter=4, symmetric=True))
        assert fast == general, seed


def test_pagerank_symmetric_over_threshold_falls_back(spark):
    # Above the broadcast-state bound the symmetric fast path must
    # reroute to the general shuffle-join plan (not broadcast a state
    # it documented as unbroadcastable) — and stay bit-identical.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    general = _ranks(graph.pagerank(graph.symmetrize(edges), n_iter=3,
                                    assume_distinct=True))
    forced = _ranks(graph.pagerank(edges, n_iter=3, symmetric=True,
                                   broadcast_threshold=2))  # |V|=5 > 2
    assert forced == general
