"""Property-based tests over random small graphs (hypothesis).

The reference's test suite includes randomized R-MAT graphs
(benchmarks/cugraph/pytest-based/bench_algos.py:26-108); here random edge
lists probe invariants that fixed fixtures can miss: arbitrary
disconnection, self-loops, parallel edges, isolated patterns.
Pure-python oracles (union-find, BFS, peeling) keep the checks exact.
"""

from collections import deque

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from cugraph_spark import (
    Graph,
    bfs,
    core_number,
    pagerank,
    triangle_count,
    weakly_connected_components,
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=14,
)

PROP_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _build(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    g = Graph(directed=False)
    g.from_edgelist(df, "src", "dst")
    return g


def _adj(pairs):
    adj = {}
    for u, v in pairs:
        if u == v:
            adj.setdefault(u, set())
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@given(pairs=edge_lists)
@settings(**PROP_SETTINGS)
def test_wcc_matches_union_find(spark, pairs):
    adj = _adj(pairs)
    parent = {v: v for v in adj}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        if u != v:
            parent[find(u)] = find(v)
    expect = {}
    for v in adj:
        expect.setdefault(find(v), set()).add(v)
    expected_partition = {frozenset(s) for s in expect.values()}

    g = _build(spark, pairs)
    rows = weakly_connected_components(g).collect()
    got = {}
    for r in rows:
        got.setdefault(r["labels"], set()).add(r["vertex"])
    got_partition = {frozenset(s) for s in got.values()}
    assert got_partition == expected_partition
    g.edgelist.unpersist()


@given(pairs=edge_lists)
@settings(**PROP_SETTINGS)
def test_bfs_distances_match_python_bfs(spark, pairs):
    adj = _adj(pairs)
    source = min(adj)
    dist = {source: 0}
    dq = deque([source])
    while dq:
        u = dq.popleft()
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                dq.append(w)

    g = _build(spark, pairs)
    rows = bfs(g, source).collect()
    got = {r["vertex"]: r["distance"] for r in rows}
    for v in adj:
        if v in dist:
            assert got[v] == dist[v], (v, got[v], dist[v])
        else:
            assert got[v] >= 2**31 - 1 or got[v] == -1  # unreached sentinel
    g.edgelist.unpersist()


@given(pairs=edge_lists)
@settings(**PROP_SETTINGS)
def test_pagerank_is_a_distribution(spark, pairs):
    g = _build(spark, pairs)
    pr = pagerank(g, max_iter=20, tol=0.0, fail_on_nonconvergence=False)
    rows = pr.collect()
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r["pagerank"] > 0 for r in rows)
    g.edgelist.unpersist()


@given(pairs=edge_lists)
@settings(**PROP_SETTINGS)
def test_core_number_matches_peeling(spark, pairs):
    adj = _adj(pairs)
    # classic peeling oracle
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    remaining = dict(deg)
    live = {v: set(ns) for v, ns in adj.items()}
    k = 0
    while remaining:
        k_v = min(remaining, key=lambda v: (remaining[v], v))
        k = max(k, remaining[k_v])
        core[k_v] = k
        for w in live[k_v]:
            live[w].discard(k_v)
            if w in remaining:
                remaining[w] = len(live[w])
        del remaining[k_v]

    g = _build(spark, pairs)
    rows = core_number(g).collect()
    got = {r["vertex"]: r["core_number"] for r in rows}
    for v in adj:
        assert got[v] == core[v], (v, got[v], core[v])
    g.edgelist.unpersist()


@given(pairs=edge_lists)
@settings(**PROP_SETTINGS)
def test_triangle_count_matches_brute_force(spark, pairs):
    adj = _adj(pairs)
    expect = {}
    verts = sorted(adj)
    for v in verts:
        c = 0
        for a in adj[v]:
            for b in adj[v]:
                if a < b and b in adj.get(a, ()):
                    c += 1
        expect[v] = c

    g = _build(spark, pairs)
    rows = triangle_count(g).collect()
    got = {r["vertex"]: r["counts"] for r in rows}
    for v in verts:
        assert got.get(v, 0) == expect[v], (v, got.get(v), expect[v])
    g.edgelist.unpersist()
