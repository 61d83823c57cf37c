"""BFS / SSSP vs pure-python oracles (reference model:
tests/traversal/test_bfs.py, test_sssp.py with NetworkX golden results)."""

import heapq

import pytest
from pyspark.sql import functions as F

from cugraph_spark import Graph, bfs, multi_source_bfs, sssp, shortest_path_length, filter_unreachable
from cugraph_spark.traversal.bfs import INT_MAX
from tests.conftest import karate_adj


def py_bfs(adj, src):
    dist = {src: 0}
    frontier = [src]
    while frontier:
        nxt = []
        for u in frontier:
            for v in sorted(adj.get(u, ())):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def py_dijkstra(edges, src):
    adj = {}
    for (a, b), w in edges.items():
        adj.setdefault(a, []).append((b, w))
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_bfs_karate(karate):
    got = {r["vertex"]: (r["distance"], r["predecessor"]) for r in bfs(karate, 0).collect()}
    want = py_bfs(karate_adj(), 0)
    assert {v: d for v, (d, _) in got.items()} == want
    # predecessor validity: pred is a neighbor at distance-1; source/unreached = -1
    adj = karate_adj()
    for v, (d, p) in got.items():
        if d == 0:
            assert p == -1
        else:
            assert p in adj[v] and got[p][0] == d - 1
            # determinism: min qualifying predecessor
            assert p == min(u for u in adj[v] if want[u] == d - 1)


def test_bfs_unreachable_and_depth_limit(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    got = {r["vertex"]: r["distance"] for r in bfs(g, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 5: INT_MAX, 6: INT_MAX}
    got2 = {r["vertex"]: r["distance"] for r in bfs(g, 0, depth_limit=1).collect()}
    assert got2[2] == INT_MAX and got2[1] == 1


def test_bfs_string_ids(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    rows = {r["vertex"]: (r["distance"], r["predecessor"]) for r in bfs(g, "a").collect()}
    assert rows["a"][0] == 0 and rows["c"] == (2, "b")


def test_multi_source_bfs(karate):
    got = {
        (r["source"], r["vertex"]): r["distance"]
        for r in multi_source_bfs(karate, [0, 33]).collect()
    }
    adj = karate_adj()
    for s in (0, 33):
        want = py_bfs(adj, s)
        assert {v: d for (ss, v), d in got.items() if ss == s} == want


def test_sssp_line(spark):
    # path graph 0->1->...->5 with weights 1..5: distances = prefix sums
    rows = [(i, i + 1, float(i + 1)) for i in range(5)]
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst", "weight"]), "src", "dst", weight="weight")
    got = {r["vertex"]: r["distance"] for r in sssp(g, 0).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 3.0, 3: 6.0, 4: 10.0, 5: 15.0}
    assert shortest_path_length(g, 0, 5) == 15.0


def test_sssp_vs_dijkstra(spark):
    edges = {
        (0, 1): 4.0, (0, 2): 1.0, (2, 1): 2.0, (1, 3): 1.0, (2, 3): 5.0,
        (3, 4): 3.0, (0, 4): 10.0, (4, 5): 1.0, (2, 5): 8.5,
    }
    df = spark.createDataFrame([(a, b, w) for (a, b), w in edges.items()], ["src", "dst", "weight"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", weight="weight")
    got = {r["vertex"]: r["distance"] for r in sssp(g, 0).collect()}
    want = py_dijkstra(edges, 0)
    for v, d in want.items():
        assert got[v] == pytest.approx(d)
    # predecessor reconstructs optimal path cost
    preds = {r["vertex"]: r["predecessor"] for r in sssp(g, 0).collect()}
    v, cost = 5, 0.0
    while preds[v] != -1:
        cost += edges[(preds[v], v)]
        v = preds[v]
    assert cost == pytest.approx(want[5])


def test_sssp_cutoff_and_filter_unreachable(spark):
    df = spark.createDataFrame([(0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0)], ["src", "dst", "weight"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", weight="weight")
    got = sssp(g, 0, cutoff=1.5)
    d = {r["vertex"]: r["distance"] for r in got.collect()}
    assert d[2] == float("inf")  # beyond cutoff
    reach = {r["vertex"] for r in filter_unreachable(got).collect()}
    assert reach == {0, 1}
