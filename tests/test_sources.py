"""Sources/sinks: edge-list readers (csv/parquet/mtx) and the parquet
graph container (save_graph/load_graph round trip)."""

import pytest
from pyspark.sql import functions as F

from cugraph_spark import Graph
from cugraph_spark.sources import (
    read_edgelist,
    read_mtx,
    write_edgelist,
    save_graph,
    load_graph,
)

EDGES = [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0), (2, 3, 0.5)]


def test_read_edgelist_csv_headerless(spark, tmp_path):
    p = tmp_path / "el.csv"
    p.write_text("# comment\n" + "\n".join(f"{s},{d},{w}" for s, d, w in EDGES) + "\n")
    df = read_edgelist(spark, str(p), fmt="csv", weight="weight")
    rows = {(r["src"], r["dst"], r["weight"]) for r in df.collect()}
    assert rows == set(EDGES)
    assert df.columns == ["src", "dst", "weight"]


def test_read_edgelist_parquet_named_cols(spark, tmp_path):
    p = str(tmp_path / "el_parquet")
    spark.createDataFrame(EDGES, ["a", "b", "w"]).write.parquet(p)
    df = read_edgelist(spark, p, fmt="parquet", source="a", destination="b", weight="w")
    assert {(r["src"], r["dst"], r["weight"]) for r in df.collect()} == set(EDGES)


def test_read_mtx(spark, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "4 4 4\n"
        "1 2 1.0\n2 3 2.0\n3 1 3.0\n3 4 0.5\n"
    )
    df = read_mtx(spark, str(p))
    assert {(r["src"], r["dst"], r["weight"]) for r in df.collect()} == set(EDGES)


def test_read_mtx_pattern_no_weight(spark, tmp_path):
    p = tmp_path / "p.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n3 3 2\n1 2\n2 3\n")
    df = read_mtx(spark, str(p))
    assert df.columns == ["src", "dst"]
    assert {(r["src"], r["dst"]) for r in df.collect()} == {(0, 1), (1, 2)}


def test_write_edgelist_roundtrip(spark, tmp_path):
    p = str(tmp_path / "sink")
    df = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    write_edgelist(df, p, fmt="parquet")
    back = spark.read.parquet(p)
    assert {(r["src"], r["dst"], r["weight"]) for r in back.collect()} == set(EDGES)


def test_save_load_graph_roundtrip(spark, tmp_path):
    from cugraph_spark import pagerank

    df = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", weight="weight")
    p = str(tmp_path / "graph")
    save_graph(g, p)

    g2 = load_graph(spark, p)
    assert g2.is_directed() == g.is_directed()
    assert g2.number_of_vertices() == g.number_of_vertices()
    assert g2.number_of_edges() == g.number_of_edges()
    pr1 = {r["vertex"]: r["pagerank"] for r in pagerank(g, max_iter=60).collect()}
    pr2 = {r["vertex"]: r["pagerank"] for r in pagerank(g2, max_iter=60).collect()}
    assert pr1.keys() == pr2.keys()
    for v in pr1:
        assert pr1[v] == pytest.approx(pr2[v], abs=1e-9)


def test_save_load_graph_string_ids(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    g = Graph(directed=False)
    g.from_edgelist(df, "src", "dst")
    p = str(tmp_path / "graph_str")
    save_graph(g, p)
    g2 = load_graph(spark, p)
    assert g2.is_renumbered()
    nodes = {r[0] for r in g2.nodes().collect()}
    assert nodes == {"a", "b", "c"}
    deg = {r["vertex"]: r["degree"] for r in g2.degree().collect()}
    assert deg == {"a": 2, "b": 2, "c": 2}


def test_save_load_graph_table_bucketed(spark, tmp_path):
    from cugraph_spark import pagerank
    from cugraph_spark.sources import load_graph_table, save_graph_table
    from pyspark.sql import functions as F

    df = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", weight="weight")
    # unique name per run: saveAsTable's warehouse directory outlives the
    # in-memory catalog, so a fixed name collides across sessions
    import shutil
    import uuid

    name = f"tbl_graph_{uuid.uuid4().hex[:8]}"
    try:
        save_graph_table(g, name, num_buckets=4)
        _assert_table_roundtrip(spark, g, name)
    finally:
        for suffix in ("edges", "vertices", "vertex_map", "properties"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
            shutil.rmtree(f"spark-warehouse/{name}_{suffix}", ignore_errors=True)


def test_register_graph_table_cross_session(spark, tmp_path):
    """save_graph_table(path=...) + register_graph_table must restore the
    bucketed zero-shuffle layout in a session whose in-memory catalog has
    never seen the tables — the cross-process fixture-cache shape. A
    dropped catalog simulates the fresh session (the files persist)."""
    import uuid

    from cugraph_spark.sources import (
        load_graph_table,
        register_graph_table,
        save_graph_table,
    )

    df = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst", weight="weight")
    name = f"ext_graph_{uuid.uuid4().hex[:8]}"
    path = str(tmp_path / "extgraph")
    try:
        # no committed save yet -> register declines
        assert register_graph_table(spark, name, path) is False
        save_graph_table(g, name, num_buckets=4, path=path)
        # simulate a fresh session: drop every catalog entry, keep files
        for suffix in ("edges", "vertices", "vertex_map", "properties"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        assert not spark.catalog.tableExists(f"{name}_edges")
        assert register_graph_table(spark, name, path) is True
        _assert_table_roundtrip(spark, g, name)
    finally:
        for suffix in ("edges", "vertices", "vertex_map", "properties"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")


def test_fixture_disk_cache_hit_and_stale_rebuild(spark, tmp_path, monkeypatch):
    """queries_registry's disk fixture cache: a second build with the same
    key ADOPTS the saved bucketed tables (no rebuild); a changed key
    (stale testdata signature) drops the old entry and rebuilds."""
    import sys

    sys.path.insert(0, "/root/repo")
    import queries_registry as qr

    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_CACHE", "1")
    monkeypatch.setattr(qr, "_FIXCACHE_DIR", str(tmp_path / "fixcache"))

    calls = {"n": 0}

    def builder(spark_, sf_dir_):
        calls["n"] += 1
        df = spark_.createDataFrame(EDGES, ["src", "dst", "weight"])
        g = Graph(directed=True)
        g.from_edgelist(df, "src", "dst", weight="weight")
        return g

    builder.__name__ = "probe_fixture"
    keys = iter([("va", "k1"), ("va", "k1"), ("vb", "k9"), ("va", "k2")])
    monkeypatch.setattr(qr, "_fixture_key", lambda *a, **k: next(keys))

    g1 = qr._disk_cached_build(builder, spark, "unused", (), {})
    assert calls["n"] == 1
    import os

    base = str(tmp_path / "fixcache")
    entry1 = os.path.join(base, "fixcache_probe_fixture_va_k1")
    assert os.path.exists(os.path.join(entry1, "_catalog.json"))

    # same key -> disk hit, builder NOT called, same results
    g2 = qr._disk_cached_build(builder, spark, "unused", (), {})
    assert calls["n"] == 1
    assert g2.number_of_edges() == g1.number_of_edges()
    assert sorted(map(tuple, g2.edgelist.collect())) == sorted(
        map(tuple, g1.edgelist.collect())
    )

    # a DIFFERENT variant of the same builder must NOT evict variant va
    qr._disk_cached_build(builder, spark, "unused", (), {})
    assert calls["n"] == 2
    assert os.path.exists(entry1)

    # changed content key for variant va (stale) -> rebuild, old va entry
    # dropped, vb untouched
    qr._disk_cached_build(builder, spark, "unused", (), {})
    assert calls["n"] == 3
    assert not os.path.exists(entry1)
    assert os.path.exists(os.path.join(base, "fixcache_probe_fixture_va_k2", "_catalog.json"))
    assert os.path.exists(os.path.join(base, "fixcache_probe_fixture_vb_k9", "_catalog.json"))
    for tagkey in ("va_k1", "va_k2", "vb_k9"):
        for suffix in ("edges", "vertices", "vertex_map", "properties"):
            spark.sql(f"DROP TABLE IF EXISTS fixcache_probe_fixture_{tagkey}_{suffix}")


def _assert_table_roundtrip(spark, g, name):
    from cugraph_spark import pagerank
    from cugraph_spark.sources import load_graph_table

    g2 = load_graph_table(spark, name)
    assert g2.number_of_edges() == g.number_of_edges()
    pr1 = {r["vertex"]: r["pagerank"] for r in pagerank(g, max_iter=60).collect()}
    pr2 = {r["vertex"]: r["pagerank"] for r in pagerank(g2, max_iter=60).collect()}
    for v in pr1:
        assert pr1[v] == pytest.approx(pr2[v], abs=1e-9)
    # the bucketed scan means a src-keyed aggregation needs NO shuffle
    agg = spark.table(f"{name}_edges").groupBy("src").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
