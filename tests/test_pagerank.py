"""PageRank vs a pure-numpy power-method oracle (the reference compares
against NetworkX with per-vertex tolerance, tests/link_analysis/
test_pagerank.py:191-199 — NetworkX is not available here, so the oracle
is the same power method in numpy)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cugraph_spark import Graph, pagerank, pagerank_with_flag
from tests.conftest import karate_adj


def numpy_pagerank(adj, alpha=0.85, tol=1e-10, max_iter=200, personalization=None):
    verts = sorted(adj.keys())
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    p = np.full(n, 1.0 / n)
    if personalization:
        p = np.zeros(n)
        for v, val in personalization.items():
            p[idx[v]] = val
        p /= p.sum()
    rank = np.full(n, 1.0 / n)
    outdeg = np.array([len(adj[v]) for v in verts], dtype=float)
    for _ in range(max_iter):
        new = np.zeros(n)
        for v in verts:
            if adj[v]:
                share = rank[idx[v]] / outdeg[idx[v]]
                for u in adj[v]:
                    new[idx[u]] += share
        dangling = sum(rank[idx[v]] for v in verts if not adj[v])
        new = (1 - alpha) * p + alpha * (new + dangling * p)
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    return {v: rank[idx[v]] for v in verts}


def test_pagerank_karate(karate):
    got = {r["vertex"]: r["pagerank"] for r in pagerank(karate, tol=1e-10).collect()}
    want = numpy_pagerank(karate_adj())
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling(spark):
    # vertex 2 is dangling (no out-edges) in the directed graph
    df = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    got = {r["vertex"]: r["pagerank"] for r in pagerank(g, tol=1e-10).collect()}
    adj = {0: {1, 2}, 1: {2}, 2: set()}
    want = numpy_pagerank(adj)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank(spark, karate):
    pers = spark.createDataFrame([(0, 1.0)], ["vertex", "values"])
    got = {
        r["vertex"]: r["pagerank"]
        for r in pagerank(karate, personalization=pers, tol=1e-10).collect()
    }
    want = numpy_pagerank(karate_adj(), personalization={0: 1.0})
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_pagerank_nonconvergence_flag(karate):
    df, converged = pagerank_with_flag(karate, max_iter=2, tol=1e-15)
    assert not converged
    assert df.count() == 34


def test_pagerank_weighted(spark):
    df = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0)], ["src", "dst", "weight"]
    )
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", weight="weight")
    got = {r["vertex"]: r["pagerank"] for r in pagerank(g, tol=1e-12).collect()}
    # numpy oracle with weighted shares
    edges = {(0, 1): 3.0, (0, 2): 1.0, (1, 2): 1.0, (2, 0): 1.0}
    n, alpha = 3, 0.85
    rank = np.full(n, 1 / n)
    outw = {0: 4.0, 1: 1.0, 2: 1.0}
    for _ in range(500):
        new = np.full(n, (1 - alpha) / n)
        for (s, d), w in edges.items():
            new[d] += alpha * rank[s] * w / outw[s]
        if np.abs(new - rank).sum() < 1e-14:
            break
        rank = new
    for v in range(3):
        assert got[v] == pytest.approx(rank[v], abs=1e-8)
