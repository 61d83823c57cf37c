"""Top-level API parity: every public name the reference exports from
cugraph/__init__.py resolves on cugraph_spark (same flat namespace)."""

import ast

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
