"""WCC / SCC tests (reference: tests/components/test_connectivity.py)."""

from cugraph_spark import Graph, connected_components, weakly_connected_components, strongly_connected_components


def test_wcc_two_components_and_isolated(spark):
    # two cliques + isolated vertex (FIXTURES.md two_components)
    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 13) for b in range(10, 13) if a < b]
    df = spark.createDataFrame(clique1 + clique2, ["src", "dst"])
    verts = spark.createDataFrame([(i,) for i in list(range(4)) + list(range(10, 13)) + [99]], ["v"])
    g = Graph(directed=False)
    g.from_edgelist(df, "src", "dst", vertices=verts)
    got = {r["vertex"]: r["labels"] for r in weakly_connected_components(g).collect()}
    assert {got[i] for i in range(4)} == {0}
    assert {got[i] for i in range(10, 13)} == {10}
    assert got[99] == 99
    assert len(set(got.values())) == 3


def test_wcc_directed_uses_underlying_undirected(spark):
    df = spark.createDataFrame([(0, 1), (2, 1), (3, 4)], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    got = {r["vertex"]: r["labels"] for r in weakly_connected_components(g).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3


def test_wcc_karate_single_component(karate):
    labels = {r["labels"] for r in weakly_connected_components(karate).collect()}
    assert labels == {0}


def test_wcc_long_path_converges(spark):
    # path of 40 vertices: stresses O(log d) two-hop shortcut convergence
    df = spark.createDataFrame([(i, i + 1) for i in range(39)], ["src", "dst"])
    g = Graph(directed=False)
    g.from_edgelist(df, "src", "dst")
    got = {r["labels"] for r in weakly_connected_components(g).collect()}
    assert got == {0}


def test_scc(spark):
    # cycle 0->1->2->0 (one SCC), chain to 3->4, cycle 4->5->4
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 4)], ["src", "dst"]
    )
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    got = {r["vertex"]: r["labels"] for r in strongly_connected_components(g).collect()}
    assert got[0] == got[1] == got[2]
    assert got[4] == got[5]
    assert got[3] not in (got[0], got[4])
    assert len({got[0], got[3], got[4]}) == 3


def test_connected_components_dispatch(karate):
    df = connected_components(karate, connection="weak")
    assert df.count() == 34
