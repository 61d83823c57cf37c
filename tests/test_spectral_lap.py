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
