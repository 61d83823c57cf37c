"""Induced subgraph / ego graph / k-truss tests."""

import pytest
from pyspark.sql import functions as F

from cugraph_spark import Graph, induced_subgraph, ego_graph, ktruss_subgraph
from tests.conftest import karate_adj


def test_induced_subgraph(karate):
    verts = [0, 1, 2, 3, 7]
    sub = induced_subgraph(karate, verts)
    adj = karate_adj()
    want_edges = {
        (a, b) for a in verts for b in verts if b in adj[a]
    }
    got = {(r["src"], r["dst"]) for r in sub.edges().collect()}
    assert got == want_edges
    assert sub.number_of_vertices() == len({v for e in want_edges for v in e})


def test_ego_graph(karate):
    adj = karate_adj()
    ego = ego_graph(karate, 16, radius=1)
    verts = {r["vertex"] for r in ego.nodes().collect()}
    assert verts == {16} | adj[16]
    ego2 = ego_graph(karate, 16, radius=2)
    want2 = {16} | adj[16] | {w for u in adj[16] for w in adj[u]}
    assert {r["vertex"] for r in ego2.nodes().collect()} == want2


def py_ktruss(adj, k):
    edges = {(a, b) for a in adj for b in adj[a] if a < b}
    while True:
        sup = {}
        for a, b in edges:
            common = sum(
                1
                for c in adj[a] & adj[b]
                if (min(a, c), max(a, c)) in edges and (min(b, c), max(b, c)) in edges
            )
            sup[(a, b)] = common
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return edges
        edges -= drop
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        adj = {v: ns for v, ns in adj.items()}
        for v in list(adj):
            pass
        # rebuild full adjacency incl. empty
        full = {}
        for a, b in edges:
            full.setdefault(a, set()).add(b)
            full.setdefault(b, set()).add(a)
        adj = full


def test_ktruss_karate(karate):
    for k in (4, 5):
        want = py_ktruss(karate_adj(), k)
        sub = ktruss_subgraph(karate, k)
        got = {(r["src"], r["dst"]) for r in sub.edges().filter(F.col("src") < F.col("dst")).collect()}
        assert got == want, k


def test_ktruss_validation(spark, karate):
    with pytest.raises(ValueError):
        ktruss_subgraph(karate, 2)
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame([(0, 1)], ["src", "dst"]), "src", "dst")
    with pytest.raises(ValueError):
        ktruss_subgraph(g, 3)
