"""Similarity family + two-hop + triangle count tests (reference:
tests/link_prediction/test_jaccard.py etc., diff < 1e-6)."""

import math

import pytest
from pyspark.sql import functions as F

from cugraph_spark import (
    Graph,
    jaccard,
    overlap,
    sorensen,
    cosine,
    all_pairs_jaccard,
    get_two_hop_neighbors,
    triangle_count,
    edge_triangle_count,
)
from tests.conftest import karate_adj


def py_two_hop(adj):
    out = set()
    for a in adj:
        for m in adj[a]:
            for b in adj[m]:
                if a != b:
                    out.add((a, b))
    return out


def test_two_hop_karate(karate):
    got = {(r["first"], r["second"]) for r in get_two_hop_neighbors(karate).collect()}
    assert got == py_two_hop(karate_adj())


def test_two_hop_start_vertices(karate):
    got = {(r["first"], r["second"]) for r in get_two_hop_neighbors(karate, [0]).collect()}
    want = {(a, b) for (a, b) in py_two_hop(karate_adj()) if a == 0}
    assert got == want


@pytest.mark.parametrize(
    "fn,formula",
    [
        (jaccard, lambda i, a, b: i / (a + b - i)),
        (overlap, lambda i, a, b: i / min(a, b)),
        (sorensen, lambda i, a, b: 2 * i / (a + b)),
        (cosine, lambda i, a, b: i / math.sqrt(a * b)),
    ],
)
def test_similarity_on_pairs(spark, karate, fn, formula):
    adj = karate_adj()
    pairs = [(0, 1), (0, 33), (5, 16), (24, 25)]
    pdf = spark.createDataFrame(pairs, ["first", "second"])
    name = fn.__name__ + "_coeff"
    got = {(r["first"], r["second"]): r[name] for r in fn(karate, pdf).collect()}
    for a, b in pairs:
        i = len(adj[a] & adj[b])
        want = formula(i, len(adj[a]), len(adj[b]))
        assert got[(a, b)] == pytest.approx(want, abs=1e-9), (a, b)


def test_jaccard_default_two_hop_pairs(karate):
    adj = karate_adj()
    rows = jaccard(karate).collect()
    assert {(r["first"], r["second"]) for r in rows} == py_two_hop(adj)
    for r in rows[:50]:
        a, b = r["first"], r["second"]
        i = len(adj[a] & adj[b])
        assert r["jaccard_coeff"] == pytest.approx(i / len(adj[a] | adj[b]), abs=1e-9)


def test_jaccard_directed_rejected(spark):
    df = spark.createDataFrame([(0, 1)], ["src", "dst"])
    g = Graph(directed=True)
    g.from_edgelist(df, "src", "dst")
    with pytest.raises(ValueError):
        jaccard(g)


def test_weighted_jaccard(spark):
    # square 0-1-2-3 with distinct weights
    rows = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0), (3, 0, 4.0)]
    g = Graph(directed=False)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst", "weight"]), "src", "dst", weight="weight")
    pdf = g.edgelist.sparkSession.createDataFrame([(0, 2)], ["first", "second"])
    got = jaccard(g, pdf, use_weight=True).collect()[0]["jaccard_coeff"]
    # N(0)={1:1,3:4}, N(2)={1:2,3:3}; i = min(1,2)+min(4,3)=4; union = 5+5-4=6
    assert got == pytest.approx(4 / 6, abs=1e-9)


def test_all_pairs_jaccard_topk(karate):
    rows = all_pairs_jaccard(karate, topk=5).collect()
    assert len(rows) == 5
    all_rows = all_pairs_jaccard(karate).collect()
    best = sorted(all_rows, key=lambda r: (-r["jaccard_coeff"], r["first"], r["second"]))[:5]
    assert [(r["first"], r["second"]) for r in rows] == [(r["first"], r["second"]) for r in best]


def py_triangles(adj):
    count = {v: 0 for v in adj}
    for a in adj:
        for b in adj[a]:
            for c in adj[b]:
                if a < b < c and c in adj[a]:
                    for v in (a, b, c):
                        count[v] += 1
    return count


def test_triangle_count_karate(karate):
    got = {r["vertex"]: r["counts"] for r in triangle_count(karate).collect()}
    assert got == py_triangles(karate_adj())
    assert sum(got.values()) == 45 * 3  # karate has 45 triangles


def test_triangle_count_start_list(karate):
    got = {r["vertex"]: r["counts"] for r in triangle_count(karate, [0, 1]).collect()}
    want = py_triangles(karate_adj())
    assert got == {0: want[0], 1: want[1]}


def test_edge_triangle_count(spark):
    # two triangles sharing edge (0,1)
    rows = [(0, 1), (1, 2), (0, 2), (1, 3), (0, 3)]
    g = Graph(directed=False)
    g.from_edgelist(spark.createDataFrame(rows, ["src", "dst"]), "src", "dst")
    got = {(r["src"], r["dst"]): r["counts"] for r in edge_triangle_count(g).collect()}
    assert sum(got.values()) == 6  # 2 triangles x 3 sides
    assert got[(min(0, 1), max(0, 1))] == 2 or got.get((1, 0)) == 2
