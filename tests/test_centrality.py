"""Katz / eigenvector / hits / degree centrality + cores tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cugraph_spark import (
    Graph,
    katz_centrality,
    eigenvector_centrality,
    hits,
    degree_centrality,
    core_number,
    k_core,
)
from tests.conftest import karate_adj


def adj_matrix(adj, n):
    A = np.zeros((n, n))
    for a, ns in adj.items():
        for b in ns:
            A[a, b] = 1.0
    return A


def test_degree_centrality(karate):
    got = {r["vertex"]: r["degree_centrality"] for r in degree_centrality(karate).collect()}
    adj = karate_adj()
    for v in adj:
        assert got[v] == pytest.approx(len(adj[v]) / 33, abs=1e-9)


def test_katz_karate(karate):
    adj = karate_adj()
    n = 34
    A = adj_matrix(adj, n)
    alpha, beta = 0.005, 1.0
    c = np.zeros(n)
    for _ in range(1000):
        new = alpha * (A.T @ c) + beta
        if np.abs(new - c).sum() < 1e-12:
            break
        c = new
    c = c / np.linalg.norm(c)
    got = {
        r["vertex"]: r["katz_centrality"]
        for r in katz_centrality(karate, alpha=alpha, beta=beta, tol=1e-10).collect()
    }
    for v in range(n):
        assert got[v] == pytest.approx(c[v], abs=1e-6)


def test_eigenvector_karate(karate):
    adj = karate_adj()
    n = 34
    A = adj_matrix(adj, n) + np.eye(n)  # reference iterates on A + I
    c = np.full(n, 1.0 / n)
    for _ in range(2000):
        new = A.T @ c
        new = new / np.linalg.norm(new)
        if np.abs(new - c).sum() < 1e-13:
            break
        c = new
    got = {
        r["vertex"]: r["eigenvector_centrality"]
        for r in eigenvector_centrality(karate, tol=1e-9).collect()
    }
    for v in range(n):
        assert got[v] == pytest.approx(c[v], abs=1e-5)


def test_hits_directed(spark):
    # small web-like digraph
    rows = [(0, 2), (1, 2), (2, 3), (3, 0), (1, 3), (0, 3)]
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst"]), "src", "dst")
    out = {r["vertex"]: (r["hubs"], r["authorities"]) for r in hits(g, tol=1e-10).collect()}
    # numpy reference of the exact reference iteration (max-normalized)
    n = 4
    A = np.zeros((n, n))
    for a, b in rows:
        A[a, b] = 1.0
    h = np.full(n, 1 / n)
    for _ in range(2000):
        a_vec = A.T @ h
        h_new = A @ a_vec
        h_new /= h_new.max()
        a_vec /= a_vec.max()
        if np.abs(h_new - h).sum() < 1e-14:
            break
        h = h_new
    h_norm = h / h.sum()
    a_norm = a_vec / a_vec.sum()
    for v in range(n):
        assert out[v][0] == pytest.approx(h_norm[v], abs=1e-6)
        assert out[v][1] == pytest.approx(a_norm[v], abs=1e-6)


def py_core_numbers(adj):
    import heapq

    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed = set()
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue
        k = max(k, d)
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def test_core_number_karate(karate):
    got = {r["vertex"]: r["core_number"] for r in core_number(karate).collect()}
    assert got == py_core_numbers(karate_adj())


def test_k_core(karate):
    cores = py_core_numbers(karate_adj())
    kmax = max(cores.values())
    sub = k_core(karate)  # default k = max core
    verts = {r["vertex"] for r in sub.nodes().collect()}
    assert verts == {v for v, c in cores.items() if c >= kmax}
    # every vertex in the 4-core has degree >= 4 within it
    sub4 = k_core(karate, k=4)
    degs = {r["vertex"]: r["degree"] for r in sub4.degree().collect()}
    assert degs and all(d >= 4 for d in degs.values())


def test_core_number_directed_bidirectional(spark):
    rows = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst"]), "src", "dst")
    got = {r["vertex"]: r["core_number"] for r in core_number(g).collect()}
    adj = {0: {1, 2}, 1: {0, 2}, 2: {0, 1, 3}, 3: {2}}
    assert got == py_core_numbers(adj)
