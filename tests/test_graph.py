"""Graph construction, renumbering, symmetrize, degrees.

Mirrors the reference's structure tests
(python/cugraph/cugraph/tests/structure/) with hand-computed oracles.
"""

import pytest
from pyspark.sql import functions as F

from cugraph_spark import Graph, MultiGraph
from tests.conftest import karate_adj


def test_counts(karate):
    assert karate.number_of_vertices() == 34
    assert karate.number_of_edges() == 78  # undirected pairs
    assert karate.number_of_edges(directed_edges=True) == 156  # symmetrized rows


def test_degrees(karate):
    adj = karate_adj()
    got = {r["vertex"]: r["degree"] for r in karate.degree().collect()}
    assert got == {v: len(ns) for v, ns in adj.items()}
    # undirected: in == out == degree
    ind = {r["vertex"]: r["in_degree"] for r in karate.degrees().collect()}
    assert ind == got


def test_density(karate):
    assert karate.density() == pytest.approx(2 * 78 / (34 * 33))


def test_directed_graph(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (0, 2)], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    assert g.number_of_vertices() == 3
    assert g.number_of_edges() == 4
    outd = {r["vertex"]: r["degree"] for r in g.out_degree().collect()}
    assert outd == {0: 2, 1: 1, 2: 1}
    ind = {r["vertex"]: r["degree"] for r in g.in_degree().collect()}
    assert ind == {0: 1, 1: 1, 2: 2}
    # directed degree = in + out
    d = {r["vertex"]: r["degree"] for r in g.degree().collect()}
    assert d == {0: 3, 1: 2, 2: 3}


def test_string_id_renumber_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 3.0)], ["s", "d", "w"]
    )
    g = Graph(directed=True)
    g.from_edgelist(df, source="s", destination="d", weight="w")
    assert g.is_renumbered()
    assert g.number_of_vertices() == 3
    edges = {(r["src"], r["dst"]) for r in g.edges().collect()}
    assert edges == {("a", "b"), ("b", "c"), ("c", "a")}
    nodes = {r["vertex"] for r in g.nodes().collect()}
    assert nodes == {"a", "b", "c"}


def test_symmetrize_keeps_min_weight(spark):
    df = spark.createDataFrame([(0, 1, 5.0), (1, 0, 2.0)], ["src", "dst", "weight"])
    g = Graph(directed=False)
    g.from_edgelist(df, "src", "dst", weight="weight")
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edgelist.collect()}
    assert rows == {(0, 1): 2.0, (1, 0): 2.0}


def test_multigraph_keeps_parallel_edges(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0), (1, 2, 3.0)], ["src", "dst", "weight"]
    )
    g = MultiGraph(directed=True)
    g.from_edgelist(df, "src", "dst", weight="weight")
    assert g.number_of_edges() == 3
    g2 = Graph(directed=True)
    g2.from_edgelist(df, "src", "dst", weight="weight")
    assert g2.number_of_edges() == 2  # dedup keeps min weight
    w = {(r["src"], r["dst"]): r["weight"] for r in g2.edgelist.collect()}
    assert w[(0, 1)] == 1.0


def test_isolated_vertices_via_vertices_arg(spark):
    df = spark.createDataFrame([("a", "b")], ["s", "d"])
    verts = spark.createDataFrame([("a",), ("b",), ("z",)], ["v"])
    g = Graph(directed=False)
    g.from_edgelist(df, "s", "d", vertices=verts)
    assert g.number_of_vertices() == 3
    degs = {r["vertex"]: r["degree"] for r in g.degree().collect()}
    assert degs == {"a": 1, "b": 1, "z": 0}


def test_has_node_edge_neighbors(karate):
    assert karate.has_node(0)
    assert not karate.has_node(99)
    assert karate.has_edge(0, 1)
    assert not karate.has_edge(0, 9)
    nbrs = {r["vertex"] for r in karate.neighbors(0).collect()}
    assert nbrs == karate_adj()[0]


def test_edge_attr_validation(spark):
    df = spark.createDataFrame([(0, 1, 1.0, 10, 0)], ["src", "dst", "w", "eid", "et"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", edge_attr=["w", "eid", "et"])
    cols = set(g.edgelist.columns)
    assert {"src", "dst", "weight", "edge_id", "edge_type"} <= cols
    with pytest.raises(ValueError):
        Graph(directed=False).from_edgelist(df, "src", "dst", edge_attr=["w", "eid"])
    # symmetrize + edge_id rejected
    with pytest.raises(ValueError):
        Graph(directed=False).from_edgelist(df, "src", "dst", edge_attr=["w", "eid", "et"])


def test_view_adj_list(spark):
    df = spark.createDataFrame([(0, 2), (0, 1), (1, 2)], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    adj = {r["src"]: r["indices"] for r in g.view_adj_list().collect()}
    assert adj == {0: [1, 2], 1: [2]}


def test_temporal_graph_construction_and_view(spark):
    # (src, dst, start, end); parallel edge (0,1) collapses to
    # min(start)=5 / max(end)=20
    df = spark.createDataFrame(
        [
            (0, 1, 5, 10),
            (0, 1, 8, 20),
            (1, 2, 15, 30),
            (2, 3, 40, 50),
        ],
        ["src", "dst", "t0", "t1"],
    )
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", edge_start_time="t0", edge_end_time="t1")
    rows = {
        (r["src"], r["dst"]): (r["edge_start_time"], r["edge_end_time"])
        for r in g.edgelist.collect()
    }
    assert rows == {(0, 1): (5, 20), (1, 2): (15, 30), (2, 3): (40, 50)}

    # window [12, 35]: (0,1) active (end 20 >= 12), (1,2) active,
    # (2,3) not yet started (40 > 35)
    v = g.temporal_view(start_time=12, end_time=35)
    active = {(r["src"], r["dst"]) for r in v.edgelist.collect()}
    assert active == {(0, 1), (1, 2)}
    # mask semantics: vertex universe unchanged
    assert v.number_of_vertices() == g.number_of_vertices() == 4

    # half-open: everything started by 100
    assert g.temporal_view(end_time=100).edgelist.count() == 3

    with pytest.raises(ValueError, match="temporal"):
        g2 = Graph(directed=True)
        g2.from_edgelist(spark.createDataFrame([(0, 1)], ["src", "dst"]), "src", "dst")
        g2.temporal_view(end_time=1)


def test_temporal_neighbor_sample_canonical_column(spark):
    from cugraph_spark.constants import EDGE_START_TIME
    from cugraph_spark.sampling.neighbor_sample import homogeneous_neighbor_sample

    # star from 0; only edges with start < seed_time are followable
    df = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 20), (0, 3, 30)], ["src", "dst", "t0"]
    )
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", edge_start_time="t0")
    seed_times = spark.createDataFrame([(0, 25)], ["vertex", "seed_time"])
    out = homogeneous_neighbor_sample(
        g, [0], [3], time_column=EDGE_START_TIME, seed_times=seed_times
    ).collect()
    minors = {r["minors"] for r in out}
    assert minors == {1, 2}  # 3 starts at t=30 >= 25 and is excluded
