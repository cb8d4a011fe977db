"""Connected-components / duplicate-cluster resolution on hand-built
pair graphs: chains, multiple components, self-loops, duplicate edges,
and the max_iter non-convergence edge case."""

from __future__ import annotations

import pytest

from etl_mudah_spark.operators.graph import (
    ConvergenceError,
    cluster_doc_ids,
    connected_components,
    duplicate_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_chain_and_two_components(spark):
    # 1-2-3-4 chain plus isolated pair {10, 11}
    comp = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
    assert _labels(comp) == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_self_loops_and_duplicate_edges(spark):
    comp = connected_components(
        _edges(spark, [(5, 5), (1, 2), (2, 1), (1, 2), (2, 3)])
    )
    assert _labels(comp) == {1: 1, 2: 1, 3: 1, 5: 5}


def test_reversed_edge_direction_is_irrelevant(spark):
    # undirected semantics: (b, a) must cluster like (a, b)
    comp = connected_components(_edges(spark, [(9, 2), (2, 7)]))
    assert _labels(comp) == {2: 2, 7: 2, 9: 2}


def test_duplicate_clusters_mapping_and_survivors(spark):
    clusters = duplicate_clusters(
        _edges(spark, [(1, 2), (2, 3), (10, 11)])
    ).collect()
    by_node = {r["node"]: r for r in clusters}
    assert set(by_node) == {1, 2, 3, 10, 11}
    for node, cluster_id, n_docs in ((1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)):
        assert by_node[node]["cluster_id"] == cluster_id
        assert by_node[node]["n_docs"] == n_docs
    # exactly one survivor per cluster, and it is the min member
    survivors = {r["node"] for r in clusters if r["is_survivor"]}
    assert survivors == {1, 10}


def test_cluster_doc_ids_materializes_sorted_arrays(spark):
    clusters = duplicate_clusters(_edges(spark, [(3, 1), (1, 2), (10, 11)]))
    rows = {r["cluster_id"]: r for r in cluster_doc_ids(clusters).collect()}
    assert rows[1]["doc_ids"] == [1, 2, 3]
    assert rows[10]["doc_ids"] == [10, 11]


def test_cluster_doc_ids_guards_giant_components(spark):
    clusters = duplicate_clusters(_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    with pytest.raises(ValueError, match="max_cluster_docs"):
        cluster_doc_ids(clusters, max_cluster_docs=3)


def test_nonconvergence_warns_by_default(spark):
    # a 5-hop chain cannot reach the fixpoint in 1 round
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    with pytest.warns(RuntimeWarning, match="did not converge"):
        comp = connected_components(edges, max_iter=1)
    # partial labels returned: node 6 cannot have learned label 1 yet
    assert _labels(comp)[6] != 1


def test_nonconvergence_raises_when_asked(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    with pytest.raises(ConvergenceError, match="max_iter=1"):
        connected_components(edges, max_iter=1, on_nonconverged="raise")


def test_convergence_within_diameter_rounds(spark):
    # the same chain converges (no warning) with enough rounds
    import warnings

    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        comp = connected_components(edges, max_iter=10)
    assert set(_labels(comp).values()) == {1}


def test_bad_on_nonconverged_rejected(spark):
    with pytest.raises(ValueError, match="on_nonconverged"):
        connected_components(_edges(spark, [(1, 2)]), on_nonconverged="ignore")


def test_star_matches_label_on_small_graphs(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (5, 5), (9, 2)]
    lbl = _labels(connected_components(_edges(spark, pairs)))
    star = _labels(connected_components(_edges(spark, pairs), algorithm="star"))
    assert star == lbl


def test_star_converges_on_deep_chain_past_label_budget(spark):
    # chain of 60 nodes: diameter 59 > default max_iter=25, so label
    # propagation cannot finish — the O(log n) star algorithm must.
    pairs = [(i, i + 1) for i in range(60)]
    comp = connected_components(
        _edges(spark, pairs), on_nonconverged="raise", algorithm="star"
    )
    labels = _labels(comp)
    assert set(labels) == set(range(61))
    assert set(labels.values()) == {0}


def test_star_singletons_and_random_graph(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(55)]
    lbl = _labels(connected_components(_edges(spark, pairs), max_iter=50))
    star = _labels(connected_components(_edges(spark, pairs), algorithm="star"))
    assert star == lbl


def test_bad_algorithm_rejected(spark):
    with pytest.raises(ValueError, match="algorithm"):
        connected_components(_edges(spark, [(1, 2)]), algorithm="pregel")


# ---------------------------------------------------------------------------
# PageRank (operators/graph.py:pagerank)
# ---------------------------------------------------------------------------
def _numpy_pagerank(edges, n, iterations=10, d=0.85):
    ranks = {i: 1.0 / n for i in range(n)}
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    for _ in range(iterations):
        dangling = sum(r for i, r in ranks.items() if i not in out)
        base = (1.0 - d) / n + d * dangling / n
        nxt = {i: base for i in range(n)}
        for a, b in edges:
            nxt[b] += d * ranks[a] / out[a]
        ranks = nxt
    return ranks


def test_pagerank_matches_reference_power_iteration(spark):
    from etl_mudah_spark.operators.graph import pagerank

    # 5 nodes: a hub (0) cited by everyone, a dangling node (4)
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    want = _numpy_pagerank(edges, 5, iterations=10)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # dangling mass conserved


def test_pagerank_uniform_on_cycle(spark):
    from etl_mudah_spark.operators.graph import pagerank

    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "a long, b long"
    )
    got = [r["rank"] for r in pagerank(cyc, iterations=5).collect()]
    assert all(abs(r - 1 / 6) < 1e-12 for r in got)


def test_pagerank_exact_mode_partition_invariant(spark):
    """exact_contrib_decimal + scaled mass: identical doubles whatever
    the partitioning, and within rounding noise of the plain mode."""
    from etl_mudah_spark.operators.graph import pagerank

    edges = [(i, (i * 3) % 40) for i in range(40)] + [(i, 0) for i in range(40)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    kw = dict(iterations=4, total_mass=1e9, exact_contrib_decimal="decimal(18,6)")
    one = {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}
    two = {r["node"]: r["rank"] for r in pagerank(df.repartition(13), **kw).collect()}
    assert one == two
    plain = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    for k, v in one.items():
        assert abs(v / 1e9 - plain[k]) < 1e-6


def _py_triangles(edges):
    import itertools

    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        es.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tris = {
        tuple(sorted(t))
        for u, v in es
        for t in ((u, v, w) for w in adj[u] & adj[v])
    }
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return es, wedges, tris


def test_triangles_match_python_oracle(spark):
    """Degree-oriented listing vs brute force on a graph with a hub
    (star + clique + chain + isolated edge, parallel edges and a
    self-loop thrown in)."""
    from etl_mudah_spark.operators.graph import triangle_stats, triangles

    edges = (
        [(0, i) for i in range(1, 8)]            # star hub
        + [(1, 2), (2, 3), (1, 3)]               # clique with the hub
        + [(10, 11), (11, 12), (12, 13)]         # open chain
        + [(20, 21), (21, 20), (5, 5)]           # parallel + self-loop
    )
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    es, wedges, tris = _py_triangles(edges)
    got = {
        (r["n1"], r["n2"], r["n3"]) for r in triangles(df).collect()
    }
    assert got == tris
    stats = triangle_stats(df).collect()[0]
    assert stats["n_edges"] == len(es)
    assert stats["n_wedges"] == wedges
    assert stats["n_triangles"] == len(tris)
    assert abs(stats["transitivity"] - 3.0 * len(tris) / wedges) < 1e-12


def test_triangles_complete_graph_and_empty(spark):
    from etl_mudah_spark.operators.graph import triangle_stats, triangles

    import itertools

    k6 = list(itertools.combinations(range(6), 2))
    df = spark.createDataFrame(k6, "a bigint, b bigint")
    assert triangles(df).count() == 20  # C(6,3)
    empty = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    s = triangle_stats(empty).collect()[0]
    assert (s["n_triangles"], s["n_wedges"], s["transitivity"]) == (0, 0, 0.0)


def test_pagerank_exact_mode_invariant_with_dangling(spark):
    """The ADVICE-class gap the plain-double dangling sum left open:
    with dangling nodes present, the exact mode must still be
    partition-invariant (the dangling mass re-distribution uses the
    same decimal discipline as the push sum), and total mass must be
    conserved each run."""
    from etl_mudah_spark.operators.graph import pagerank

    # nodes 50..59 are sinks: they receive edges but emit none
    edges = [(i, 50 + (i % 10)) for i in range(40)] + [
        (i, (i * 7) % 40) for i in range(40)
    ]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    kw = dict(iterations=4, total_mass=1e9, exact_contrib_decimal="decimal(18,6)")
    one = {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}
    two = {r["node"]: r["rank"] for r in pagerank(df.repartition(17), **kw).collect()}
    assert one == two
    assert abs(sum(one.values()) - 1e9) / 1e9 < 1e-6


def test_bfs_hops_min_distance_on_a_dag(spark):
    from etl_mudah_spark.operators.graph import bfs_hops

    # 0->1->2->3 chain plus a shortcut 0->2: node 2 is 1 hop, not 2.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "a bigint, b bigint"
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_hops_respects_direction_and_bound(spark):
    from etl_mudah_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (9, 0)], "a bigint, b bigint"
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    # 9 only has an edge INTO the seed; 3,4 are beyond the bound.
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_cycle_terminates_and_early_exits(spark):
    from etl_mudah_spark.operators.graph import bfs_hops

    # 3-cycle fully visited after 2 hops; checkpoint_every=1 exercises
    # the empty-frontier early exit on the later levels.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "a bigint, b bigint"
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    got = {
        r.node: r.hops
        for r in bfs_hops(
            edges, seeds, max_hops=10, checkpoint_every=1
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_multiple_seeds_take_nearest(spark):
    from etl_mudah_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 2)], "a bigint, b bigint"
    )
    seeds = spark.createDataFrame([(0,), (5,)], "node bigint")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 5: 0, 1: 1, 2: 1}


def test_personalized_pagerank_mass_and_locality(spark):
    from etl_mudah_spark.operators.graph import personalized_pagerank

    # Two disconnected cliques; seeds only in the first. All mass must
    # stay on the seed component (locality) and sum to total_mass.
    edges = [(i, j) for i in range(4) for j in range(4) if i != j] + [
        (i, j) for i in range(10, 14) for j in range(10, 14) if i != j
    ]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    seeds = spark.createDataFrame([(0,), (1,)], "node bigint")
    r = {x["node"]: x["rank"] for x in personalized_pagerank(
        df, seeds, iterations=5
    ).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert all(r[n] == 0.0 for n in range(10, 14))
    assert r[0] > r[2]  # seeds outrank non-seed clique members


def test_personalized_pagerank_exact_mode_partition_invariant(spark):
    from etl_mudah_spark.operators.graph import personalized_pagerank

    # Seed 99 has no out-edges: its mass is dangling every round and
    # must return to the seeds, not leak.
    edges = [(i, (i * 3) % 7) for i in range(7)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    seeds = spark.createDataFrame([(0,), (99,)], "node bigint")
    kw = dict(
        iterations=4, total_mass=1e9, exact_contrib_decimal="decimal(18,6)"
    )
    one = {x["node"]: x["rank"] for x in personalized_pagerank(df, seeds, **kw).collect()}
    two = {
        x["node"]: x["rank"]
        for x in personalized_pagerank(df.repartition(13), seeds, **kw).collect()
    }
    assert one == two
    assert abs(sum(one.values()) - 1e9) / 1e9 < 1e-6
    assert 99 in one and one[99] > 0  # isolated seed keeps teleport mass


def test_personalized_pagerank_empty_seeds_rejected(spark):
    import pytest as _pt

    from etl_mudah_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    empty = spark.createDataFrame([], "node bigint")
    with _pt.raises(ValueError, match="seed set is empty"):
        personalized_pagerank(df, empty)
