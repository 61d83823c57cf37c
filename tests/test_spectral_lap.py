"""Spectral clustering (quality-threshold validation, like the
reference's tests) and Hungarian assignment."""

import pytest
from pyspark.sql import functions as F

from cugraph_spark import Graph
from cugraph_spark.community.spectral_clustering import spectralBalancedCutClustering
from cugraph_spark.community.clustering_scores import analyzeClustering_edge_cut
from cugraph_spark.linear_assignment.lap import hungarian, dense_hungarian


def test_spectral_two_cliques(spark):
    cl1 = [(a, b, 1.0) for a in range(6) for b in range(6) if a < b]
    cl2 = [(a, b, 1.0) for a in range(10, 16) for b in range(10, 16) if a < b]
    bridge = [(0, 10, 0.05)]
    g = Graph(directed=False)
    g.from_edgelist(
        spark.createDataFrame(cl1 + cl2 + bridge, ["src", "dst", "weight"]),
        "src", "dst", weight="weight",
    )
    out = spectralBalancedCutClustering(g, 2, num_eigen_vects=2)
    rows = {r["vertex"]: r["cluster"] for r in out.collect()}
    # quality check: the cut between found clusters must be tiny (only the
    # bridge) — exact label matching is not the contract (reference tests
    # threshold scores too)
    clustering = spark.createDataFrame(list(rows.items()), ["vertex", "cluster"])
    cut = analyzeClustering_edge_cut(g, 2, clustering)
    assert cut <= 1.0  # at most the bridge (plus nothing else)
    assert len(set(rows.values())) == 2


def test_dense_hungarian():
    # classic 3x3
    costs = [4, 1, 3, 2, 0, 5, 3, 2, 2]
    total, assign = dense_hungarian(costs, 3, 3)
    assert total == 5.0  # 1 + 2 + 2
    assert sorted(assign) == [0, 1, 2]


def test_hungarian_graph(spark):
    rows = [
        (0, 100, 4.0), (0, 101, 1.0), (0, 102, 3.0),
        (1, 100, 2.0), (1, 101, 0.0), (1, 102, 5.0),
        (2, 100, 3.0), (2, 101, 2.0), (2, 102, 2.0),
    ]
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst", "weight"]), "src", "dst", weight="weight")
    total, df = hungarian(g, [0, 1, 2])
    assert total == 5.0
    got = {r["vertex"]: r["assignment"] for r in df.collect()}
    assert sorted(got) == [0, 1, 2]
    assert len(set(got.values())) == 3


def _random_bipartite(spark, nw, nt, deg, seed):
    import random

    random.seed(seed)
    rows = []
    for w in range(nw):
        for t in random.sample(range(1000, 1000 + nt), min(deg, nt)):
            rows.append((w, t, float(random.randint(1, 50))))
    g = Graph(directed=True)
    g.from_edgelist(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        "src", "dst", weight="weight",
    )
    return g


@pytest.mark.parametrize("nw,nt,seed", [(40, 60, 7), (25, 25, 3), (30, 120, 11)])
def test_auction_matches_jv(spark, nw, nt, seed):
    """Distributed auction total equals the exact JV optimum (integer
    costs, final eps < 1/(n+1)) on symmetric and asymmetric instances,
    and the result is a perfect matching of the workers."""
    from cugraph_spark.linear_assignment.lap import hungarian_auction

    g = _random_bipartite(spark, nw, nt, 10, seed)
    tot_jv, _ = hungarian(g, list(range(nw)))
    tot_au, df = hungarian_auction(g, list(range(nw)))
    rows = df.collect()
    assert abs(tot_au - tot_jv) < 1e-6
    assert len(rows) == nw
    assert len({r["assignment"] for r in rows}) == nw


def test_auction_single_candidate_bid_clamped(spark):
    """Single-candidate workers' bids must be clamped to the current price
    (monotone prices): contested tasks plus a lone-edge worker used to be
    able to LOWER an already-high price via the constant bid floor. The
    auction must still terminate at the JV optimum."""
    from cugraph_spark.linear_assignment.lap import hungarian_auction

    # workers 0..3 all want task 100 (cheap) with task 101..103 pricey;
    # worker 4 has a single edge to the contested task 104
    rows = []
    for w in range(4):
        for t, c in [(100, 1.0), (101, 40.0), (102, 45.0), (103, 50.0), (104, 2.0)]:
            rows.append((w, t, c))
    rows.append((4, 104, 3.0))  # single-candidate worker on a contested task
    g = Graph(directed=True)
    g.from_edgelist(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        "src", "dst", weight="weight",
    )
    tot_jv, _ = hungarian(g, [0, 1, 2, 3, 4])
    tot_au, df = hungarian_auction(g, [0, 1, 2, 3, 4])
    assert abs(tot_au - tot_jv) < 1e-6
    assert df.count() == 5
    assert len({r["assignment"] for r in df.collect()}) == 5


def test_auction_candidate_less_worker_fails_fast(spark):
    """A worker with zero candidate edges raises ValueError up front
    instead of sweeping to max_sweeps (r3 ADVICE)."""
    from cugraph_spark.linear_assignment.lap import hungarian_auction

    g = _random_bipartite(spark, 5, 10, 4, 2)
    with pytest.raises(ValueError, match="no candidate"):
        hungarian_auction(g, [0, 1, 2, 3, 4, 999])  # 999 has no edges


def test_auction_hall_violation_detected(spark):
    """k workers whose joint neighborhood has < k tasks (Hall violation
    that the worker/task counting checks can't see) trips the Bertsekas
    price bound instead of livelocking for max_sweeps sweeps."""
    from cugraph_spark.linear_assignment.lap import hungarian_auction

    rows = [
        (1, 10, 5.0),
        (2, 10, 6.0),  # workers 1,2 compete for the single task 10
        (3, 10, 1.0),
        (3, 11, 2.0),
        (3, 12, 3.0),  # worker 3 keeps n_tasks >= n_workers
    ]
    g = Graph(directed=True)
    g.from_edgelist(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        "src", "dst", weight="weight",
    )
    with pytest.raises(ValueError, match="Hall"):
        hungarian_auction(g, [1, 2, 3], max_sweeps=500)


def test_hungarian_forwards_epsilon_to_auction(spark, monkeypatch):
    """hungarian(epsilon=...) reaches the auction route past the guard."""
    import cugraph_spark.linear_assignment.lap as lap

    seen = {}
    real = lap.hungarian_auction

    def spy(G, workers, epsilon=None, **kw):
        seen["epsilon"] = epsilon
        return real(G, workers, epsilon=epsilon, **kw)

    monkeypatch.setattr(lap, "hungarian_auction", spy)
    monkeypatch.setattr(lap, "_DRIVER_MAX_WORKERS", 5)
    g = _random_bipartite(spark, 10, 20, 6, 9)
    lap.hungarian(g, list(range(10)), epsilon=0.01)
    assert seen["epsilon"] == 0.01


def test_hungarian_dispatches_to_auction(spark, monkeypatch):
    """Past the dense-collect guard, hungarian() routes to the auction
    IterLoop and still returns the optimal total."""
    import cugraph_spark.linear_assignment.lap as lap

    g = _random_bipartite(spark, 30, 50, 10, 5)
    tot_jv, _ = hungarian(g, list(range(30)))
    monkeypatch.setattr(lap, "_DRIVER_MAX_WORKERS", 10)
    tot_au, df = lap.hungarian(g, list(range(30)))
    assert abs(tot_au - tot_jv) < 1e-6
    assert df.count() == 30


def test_lanczos_ritz_values_match_dense_eigh(spark):
    # exactness check: smallest-k eigenvalues of L_sym from the
    # distributed Lanczos must match a dense numpy eigendecomposition
    import numpy as np
    from cugraph_spark import Graph
    from cugraph_spark.community.spectral_clustering import _lanczos_embedding

    rng = np.random.RandomState(7)
    n = 24
    edges = []
    # two noisy blocks with a weak bridge
    for a in range(n):
        for b in range(a + 1, n):
            same = (a < n // 2) == (b < n // 2)
            p = 0.6 if same else 0.05
            if rng.rand() < p:
                edges.append((a, b))
    edges.append((0, n - 1))
    g = Graph(directed=False)
    g.from_edgelist(spark.createDataFrame(edges, ["src", "dst"]), "src", "dst")

    # dense ground truth over the vertices that actually have edges
    verts = sorted({a for a, _ in edges} | {b for _, b in edges})
    pos = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for a, b in edges:
        A[pos[a], pos[b]] = A[pos[b], pos[a]] = 1.0
    d = A.sum(axis=1)
    Dm = np.diag(1.0 / np.sqrt(d))
    L = np.eye(len(verts)) - Dm @ A @ Dm
    want = np.sort(np.linalg.eigvalsh(L))[:3]

    emb = _lanczos_embedding(g, 3, max_steps=len(verts) - 1, tol=1e-12, seed=42)
    X = (
        emb.toPandas().set_index("vertex").loc[verts][["e0", "e1", "e2"]].to_numpy()
    )
    # Rayleigh quotients of the returned Ritz vectors == eigenvalues
    got = sorted((x @ L @ x) / (x @ x) for x in X.T)
    assert np.allclose(got, want, atol=1e-6), (got, want)
    # and the Fiedler-style embedding separates the planted blocks
    from cugraph_spark.community.spectral_clustering import spectralBalancedCutClustering

    out = spectralBalancedCutClustering(g, 2, num_eigen_vects=2)
    lab = {r["vertex"]: r["cluster"] for r in out.collect()}
    left = {lab[v] for v in verts if v < n // 2}
    right = {lab[v] for v in verts if v >= n // 2}
    # blocks mostly separate: majority label differs
    from collections import Counter

    lc = Counter(lab[v] for v in verts if v < n // 2).most_common(1)[0][0]
    rc = Counter(lab[v] for v in verts if v >= n // 2).most_common(1)[0][0]
    assert lc != rc
