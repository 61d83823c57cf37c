"""Random walks / neighbor sampling / negative sampling tests."""

import pytest
from pyspark.sql import functions as F

from cugraph_spark import (
    Graph,
    uniform_random_walks,
    biased_random_walks,
    node2vec_random_walks,
    homogeneous_neighbor_sample,
    heterogeneous_neighbor_sample,
    negative_sampling,
)
from tests.conftest import karate_adj


def _check_paths_valid(paths, adj, max_depth):
    for r in paths:
        vp = r["vertex_path"]
        assert 1 <= len(vp) <= max_depth + 1
        for a, b in zip(vp, vp[1:]):
            assert b in adj[a], (a, b)


def test_uniform_walks(karate):
    adj = karate_adj()
    out = uniform_random_walks(karate, [0, 5, 33], 4).collect()
    assert len(out) == 3
    _check_paths_valid(out, adj, 4)
    assert all(r["max_path_length"] == 4 for r in out)
    # determinism with same seed
    out2 = uniform_random_walks(karate, [0, 5, 33], 4).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_walks_dead_end(spark):
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"]), "src", "dst")
    out = uniform_random_walks(g, [0], 5).collect()
    assert out[0]["vertex_path"] == [0, 1, 2]


def test_biased_walks(spark):
    # overwhelming weight on one edge -> always chosen
    rows = [(0, 1, 1e9), (0, 2, 1e-9), (1, 0, 1.0), (2, 0, 1.0)]
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst", "weight"]), "src", "dst", weight="weight")
    for s in range(5):
        out = biased_random_walks(g, [0], 1, random_state=s).collect()
        assert out[0]["vertex_path"] == [0, 1]


def test_node2vec_return_bias(spark):
    # p tiny -> returning to prev strongly favored
    rows = [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0)]
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst", "weight"]), "src", "dst", weight="weight")
    returns = 0
    for s in range(8):
        out = node2vec_random_walks(g, [0], 2, p=1e-9, q=1e9, random_state=s).collect()
        if out[0]["vertex_path"] == [0, 1, 0]:
            returns += 1
    assert returns >= 7


def test_homogeneous_neighbor_sample(karate):
    adj = karate_adj()
    out = homogeneous_neighbor_sample(karate, [0, 33], [2, 3]).collect()
    hops = {r["hop_id"] for r in out}
    assert hops <= {0, 1}
    for r in out:
        assert r["minors"] in adj[r["majors"]]
    # fanout respected per (batch, seed)
    from collections import Counter

    c = Counter((r["batch_id"], r["majors"], r["hop_id"]) for r in out)
    for (b, v, h), n in c.items():
        assert n <= (2 if h == 0 else 3)
    # hop0 majors are the seeds
    assert {r["majors"] for r in out if r["hop_id"] == 0} <= {0, 33}


def test_heterogeneous_neighbor_sample(spark):
    rows = [(0, i, 0) for i in range(1, 6)] + [(0, i, 1) for i in range(6, 11)]
    df = spark.createDataFrame(rows, ["src", "dst", "et"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", edge_type="et")
    out = heterogeneous_neighbor_sample(g, [0], {0: [2], 1: [3]}).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["edge_type"], []).append(r)
    assert len(by_type[0]) == 2 and len(by_type[1]) == 3


def test_negative_sampling(karate):
    adj = karate_adj()
    out = negative_sampling(karate, 30, exact_number_of_samples=True).collect()
    assert len(out) == 30
    for r in out:
        assert r["dst"] not in adj.get(r["src"], set())
        assert r["src"] != r["dst"]


def test_neighbor_sample_extended_kwargs(spark):
    from cugraph_spark import Graph, homogeneous_neighbor_sample

    # hub 0 with weighted spokes: weight 100 on edge (0,9), 0.001 elsewhere
    rows = [(0, d, 100.0 if d == 9 else 0.001) for d in range(1, 10)]
    g = Graph(directed=True)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst", "weight"]), "src", "dst", weight="weight")

    # with_biases: the heavy edge should essentially always be picked
    out = homogeneous_neighbor_sample(g, [0], [1], with_biases=True)
    assert [r["minors"] for r in out.collect()] == [9]

    # batch offsets: [0,1,2] puts seed 0 in batch 0, seed 1 in batch 1
    out2 = homogeneous_neighbor_sample(
        g, [0, 1], [2], starting_vertex_label_offsets=[0, 1, 2]
    )
    batches = {r["batch_id"] for r in out2.collect()}
    assert batches == {0}  # vertex 1 has no out-edges, so only batch 0 rows

    # renumber + retain_seeds + return_offsets: extended return shape
    out3, rmap, offs = homogeneous_neighbor_sample(
        g, [0, 1], [2], starting_vertex_label_offsets=[0, 1, 2],
        renumber=True, retain_seeds=True, return_offsets=True,
    )
    m = {(r["batch_id"], r["vertex"]): r["renumbered_id"] for r in rmap.collect()}
    assert (1, 1) in m  # seed 1 retained despite sampling nothing
    assert min(v for (b, _), v in m.items() if b == 0) == 0  # dense from 0
    assert {r["batch_id"]: r["n_rows"] for r in offs.collect()} == {0: 2}

    # return_hops=False drops hop_id
    out4 = homogeneous_neighbor_sample(g, [0], [1], return_hops=False)
    assert "hop_id" not in out4.columns

    # compression validation
    with pytest.raises(ValueError):
        homogeneous_neighbor_sample(g, [0], [1], compression="CSR")


def test_heterogeneous_flat_fanout_layout(spark):
    from cugraph_spark import Graph, heterogeneous_neighbor_sample

    rows = [(0, d, 1.0, d % 2) for d in range(1, 9)]
    g = Graph(directed=True)
    g.from_edgelist(
        spark.createDataFrame(rows, ["src", "dst", "weight", "et"]),
        "src", "dst", weight="weight", edge_id=None, edge_type="et",
    )
    # flat layout [hop0_type0, hop0_type1] with num_edge_types=2
    out = heterogeneous_neighbor_sample(g, [0], [2, 3], num_edge_types=2)
    by_type = {}
    for r in out.collect():
        by_type.setdefault(r["edge_type"], 0)
        by_type[r["edge_type"]] += 1
    assert by_type.get(0, 0) <= 2 and by_type.get(1, 0) <= 3
