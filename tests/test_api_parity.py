"""Top-level API parity: every public name the reference exports from
cugraph/__init__.py resolves on cugraph_spark (same flat namespace)."""

import ast

import pytest

REF_INIT = "/root/reference/python/cugraph/cugraph/__init__.py"


def test_top_level_names_resolve():
    import cugraph_spark as cs

    tree = ast.parse(open(REF_INIT).read())
    names = {
        a.asname or a.name
        for node in ast.walk(tree)
        if isinstance(node, ast.ImportFrom)
        for a in node.names
    }
    names.discard("__git_commit__")  # build metadata, not API
    missing = sorted(n for n in names if not hasattr(cs, n))
    assert missing == [], f"reference exports missing here: {missing}"


def test_graph_class_predicates(spark):
    from cugraph_spark import (
        Graph,
        BiPartiteGraph,
        NPartiteGraph,
        is_bipartite,
        is_directed,
        is_multigraph,
        is_multipartite,
        is_weighted,
    )

    df = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    assert is_directed(g) and not is_weighted(g) and not is_multigraph(g)
    assert not is_bipartite(g) and not is_multipartite(g)
    b = BiPartiteGraph()
    assert is_bipartite(b) and is_multipartite(b)
    n = NPartiteGraph()
    assert is_multipartite(n) and not is_bipartite(n)


def test_dask_namespace_parity():
    """Every algorithm the reference exports from cugraph.dask resolves
    on cugraph_spark.dask (to the already-distributed base impl)."""
    import cugraph_spark.dask as csd

    tree = ast.parse(
        open("/root/reference/python/cugraph/cugraph/dask/__init__.py").read()
    )
    names = {
        a.asname or a.name
        for node in ast.walk(tree)
        if isinstance(node, ast.ImportFrom)
        for a in node.names
    }
    missing = sorted(n for n in names if not hasattr(csd, n))
    assert missing == [], f"cugraph.dask exports missing: {missing}"
    import cugraph_spark

    assert csd.pagerank is cugraph_spark.pagerank


def test_concurrent_bfs_multiple_graphs(spark):
    from cugraph_spark import Graph, concurrent_bfs

    g1 = Graph(directed=True)
    g1.from_edgelist(spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"]), "src", "dst")
    g2 = Graph(directed=True)
    g2.from_edgelist(spark.createDataFrame([(5, 6)], ["src", "dst"]), "src", "dst")
    out = concurrent_bfs([g1, g2], [[0], [5]]).collect()
    d = {(r["graph_id"], r["vertex"]): r["distance"] for r in out}
    assert d[(0, 2)] == 2 and d[(1, 6)] == 1


def test_induced_subgraph_offsets(spark):
    from cugraph_spark import Graph
    from cugraph_spark.community.induced_subgraph import induced_subgraph

    g = Graph(directed=True)
    g.from_edgelist(
        spark.createDataFrame([(0, 1), (1, 2), (3, 4)], ["src", "dst"]), "src", "dst"
    )
    edges, offs = induced_subgraph(g, [0, 1, 3, 4], offsets=[0, 2, 4])
    got = {(r["batch"], r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(0, 0, 1), (1, 3, 4)}  # batch 0 = {0,1}, batch 1 = {3,4}
    assert offs == [0, 2, 4]


def test_legacy_matrix_kwargs_rejected(spark):
    from cugraph_spark import Graph, bfs, sssp, weakly_connected_components

    g = Graph(directed=False)
    g.from_edgelist(spark.createDataFrame([(0, 1)], ["src", "dst"]), "src", "dst")
    with pytest.raises(TypeError):
        bfs(g, 0, directed=True)
    with pytest.raises(TypeError):
        bfs(g)  # neither start nor i_start
    assert bfs(g, i_start=0).count() == 2
    with pytest.raises(TypeError):
        sssp(g, 0, indices=1)
    with pytest.raises(TypeError):
        weakly_connected_components(g, return_labels=True)
    with pytest.raises(TypeError):
        weakly_connected_components(g, connection="strong")


def test_graph_method_parity():
    """Every public method on the reference's Graph classes
    (graph_classes.py + simpleGraph.py) resolves on our Graph."""
    import cugraph_spark as cs

    methods = set()
    for p in (
        "/root/reference/python/cugraph/cugraph/structure/graph_classes.py",
        "/root/reference/python/cugraph/cugraph/structure/graph_implementation/simpleGraph.py",
    ):
        tree = ast.parse(open(p).read())
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef):
                for f in node.body:
                    if isinstance(f, ast.FunctionDef) and not f.name.startswith("_"):
                        methods.add(f.name)
    have = set(dir(cs.Graph)) | set(dir(cs.BiPartiteGraph))
    missing = sorted(m for m in methods if m not in have)
    assert missing == [], f"reference Graph methods missing here: {missing}"


def test_graph_method_wrappers(spark):
    from cugraph_spark import Graph

    g = Graph(directed=True)
    g.from_edgelist(
        spark.createDataFrame([(0, 1), (1, 2), (5, 5)], ["src", "dst"]), "src", "dst",
        vertices=spark.createDataFrame([(9,)], ["v"]),
    )
    assert g.has_isolated_vertices()  # vertex 9 has no edges
    assert g.vertex_column_size() == 1
    assert g.is_multi_gpu() and not g.is_remote()
    adj = {r["src"]: r["indices"] for r in g.view_adj_list().collect()}
    assert adj[0] == [1]
    tadj = {r["src"]: r["indices"] for r in g.view_transposed_adj_list().collect()}
    assert tadj[2] == [1]
    two_hop = g.get_two_hop_neighbors()
    assert {(r[0], r[1]) for r in two_hop.collect()} >= {(0, 2)}
    assert g.view_edge_list().count() == g.edges().count()
    g2 = Graph(directed=True)
    g2.from_cudf_adjlist([0, 1, 2], [1, 2])
    assert {(r["src"], r["dst"]) for r in g2.edges().select("src", "dst").collect()} == {(0, 1), (1, 2)}
    g.clear()
    assert g._edges is None
