"""G1 connected components: known graphs + a randomized graph vs
union-find, and determinism across partitioning."""

import random

import pytest


def _cc(spark, edges, vertices, **kw):
    from mongo2neo_spark.operators.cc import connected_components

    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return {
        r.id: r.component for r in connected_components(e, v, **kw).collect()
    }


def test_chain(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)], [1, 2, 3, 4])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_star(spark):
    got = _cc(spark, [(10, 2), (10, 3), (10, 4)], [2, 3, 4, 10])
    assert set(got.values()) == {2}


def test_two_components_and_singleton(spark):
    got = _cc(spark, [(1, 2), (5, 6)], [1, 2, 5, 6, 9])
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 9: 9}


def test_no_edges(spark):
    got = _cc(spark, [], [3, 7])
    assert got == {3: 3, 7: 7}


def _cc_star(spark, edges, vertices, **kw):
    from mongo2neo_spark.operators.cc import connected_components_star

    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return {
        r.id: r.component
        for r in connected_components_star(e, v, **kw).collect()
    }


def test_star_algorithm_known_graphs(spark):
    assert _cc_star(spark, [(1, 2), (2, 3), (3, 4)], [1, 2, 3, 4]) == {
        1: 1, 2: 1, 3: 1, 4: 1,
    }
    assert _cc_star(spark, [(1, 2), (5, 6)], [1, 2, 5, 6, 9]) == {
        1: 1, 2: 1, 5: 5, 6: 5, 9: 9,
    }
    assert _cc_star(spark, [], [3, 7]) == {3: 3, 7: 7}


def test_star_algorithm_long_chain_10k(spark):
    """A 10k-node chain: hash-min needs ~10k rounds (degenerate);
    large-star/small-star converges in O(log² n) — assert it finishes
    within the default round budget and labels everything with min id."""
    n = 10_000
    got = _cc_star(spark, [(i, i + 1) for i in range(n - 1)], list(range(n)))
    assert got == {i: 0 for i in range(n)}


def test_star_algorithm_random_vs_union_find(spark):
    import random as _r

    rng = _r.Random(7)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(250)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # root -> min member (first seen while scanning ids ascending)
    comp_min = {}
    for x in range(n):
        comp_min.setdefault(find(x), x)
    ref = {x: comp_min[find(x)] for x in range(n)}
    assert _cc_star(spark, edges, list(range(n))) == ref


def test_hashmin_falls_back_to_star_on_chain(spark):
    """connected_components with star_fallback_after must hand a
    high-diameter graph to the star algorithm and still return min-id
    labels."""
    n = 200
    got = _cc(
        spark,
        [(i, i + 1) for i in range(n - 1)],
        list(range(n)),
        star_fallback_after=3,
    )
    assert got == {i: 0 for i in range(n)}


def test_random_graph_vs_union_find(spark):
    rng = random.Random(42)
    n = 500
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize union-find labels to min member per component
    comp_min = {}
    for x in range(n):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    ref = {x: comp_min[find(x)] for x in range(n)}
    got = _cc(spark, [(a, b) for a, b in edges], list(range(n)))
    assert got == ref
