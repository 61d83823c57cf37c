"""Query + oracle registry backing __spark_entry__.py.

Each implemented operator from SURVEY.md §2 registers:
  QUERIES[name]  = callable(spark, sf_dir) -> DataFrame
  ORACLES[name]  = equivalent DuckDB SQL over the pre-registered views
                   (region nation customer supplier part orders lineitem
                   events documents embeddings)

Iterative algorithms (pagerank, bfs, wcc, katz, ...) get *unrolled* SQL
oracles: a fixed iteration count is expanded into chained CTEs — plain
ANSI SQL DuckDB executes directly, no recursion extensions needed. The
Spark query uses the same fixed iteration count (tol=0) so both sides
compute the identical fixpoint prefix. All floats are rounded to 6 dp on
both sides (cross-engine float-sum associativity).

Graph fixtures (FIXTURES.md §3) are derived from the star schema with SQL
that is written ONCE here as a DuckDB CTE string and mirrored in Spark.
"""

from __future__ import annotations

import os
import sys
from typing import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# Graph fixtures — Spark builders + the DuckDB CTE prelude that derives the
# *same* edge lists. Keep the two definitions textually adjacent so they
# can be audited for equivalence.
# ---------------------------------------------------------------------------

# nation_flow: c_nationkey -> s_nationkey weighted by lineitem count
# (small dense weighted digraph, <= 25 vertices — FIXTURES.md §3)
NATION_FLOW_SQL = """
nf_edges AS MATERIALIZED (
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
)
"""


def nation_flow_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    s = _read(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )


# cust_order: bipartite customer -> order; order ids offset so the two key
# spaces don't collide as integers.
ORDER_OFFSET = 10_000_000
CUST_ORDER_SQL = f"""
co_edges AS MATERIALIZED (
    SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
    FROM orders
)
"""


def cust_order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + F.lit(ORDER_OFFSET)).alias("dst"),
    )


# copurchase: customers sharing a supplier (undirected, deduped pairs
# src < dst; the Graph symmetrizes). The workhorse medium graph.
COPURCHASE_SQL = """
cp_cs AS MATERIALIZED (
    SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cp_pairs AS MATERIALIZED (
    SELECT a.cust AS src, b.cust AS dst
    FROM cp_cs a JOIN cp_cs b ON a.supp = b.supp
    WHERE a.cust < b.cust
    GROUP BY 1, 2
),
cp_edges AS MATERIALIZED (
    SELECT src, dst FROM cp_pairs
    UNION ALL
    SELECT dst AS src, src AS dst FROM cp_pairs
)
"""


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    l = _read(spark, sf_dir, "lineitem")
    cs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    a, b = cs.alias("a"), cs.alias("b")
    return (
        a.join(b, F.col("a.supp") == F.col("b.supp"))
        .filter(F.col("a.cust") < F.col("b.cust"))
        .select(F.col("a.cust").alias("src"), F.col("b.cust").alias("dst"))
        .distinct()
    )


def copurchase_graph(spark: SparkSession, sf_dir: str):
    from cugraph_spark import Graph

    g = Graph(directed=False)
    g.from_edgelist(copurchase_pairs(spark, sf_dir), "src", "dst")
    return g


def nation_flow_graph(spark: SparkSession, sf_dir: str, directed: bool = True):
    from cugraph_spark import Graph

    g = Graph(directed=directed)
    g.from_edgelist(nation_flow_edges(spark, sf_dir), "src", "dst", weight="weight")
    return g


# ---------------------------------------------------------------------------
# Structure / degree queries
# ---------------------------------------------------------------------------


@register(
    "degree_cust_order",
    oracle=f"""
WITH {CUST_ORDER_SQL.strip().rstrip()},
verts AS (
    SELECT src AS vertex FROM co_edges UNION SELECT dst FROM co_edges
),
ind AS (SELECT dst AS vertex, COUNT(*) AS c FROM co_edges GROUP BY 1),
outd AS (SELECT src AS vertex, COUNT(*) AS c FROM co_edges GROUP BY 1)
SELECT v.vertex,
       CAST(COALESCE(i.c, 0) AS BIGINT) AS in_degree,
       CAST(COALESCE(o.c, 0) AS BIGINT) AS out_degree
FROM verts v
LEFT JOIN ind i ON v.vertex = i.vertex
LEFT JOIN outd o ON v.vertex = o.vertex
""",
)
def q_degree_cust_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.degrees() on the directed bipartite customer->order graph
    (SURVEY §2.A degrees)."""
    from cugraph_spark import Graph

    g = Graph(directed=True)
    g.from_edgelist(cust_order_edges(spark, sf_dir), "src", "dst")
    return g.degrees()


@register(
    "degree_copurchase",
    oracle=f"""
WITH {COPURCHASE_SQL.strip()},
verts AS (SELECT DISTINCT src AS vertex FROM cp_edges)
SELECT v.vertex, CAST(COALESCE(d.c, 0) AS BIGINT) AS degree
FROM verts v
LEFT JOIN (SELECT src AS vertex, COUNT(*) AS c FROM cp_edges GROUP BY 1) d
  ON v.vertex = d.vertex
""",
)
def q_degree_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copurchase_graph(spark, sf_dir).degree()


# ---------------------------------------------------------------------------
# PageRank — unrolled-SQL oracle
# ---------------------------------------------------------------------------

PR_ITERS = 30


def _pagerank_unrolled_sql(
    edges_cte: str, edges_name: str, alpha: float, iters: int, weighted: bool
) -> str:
    """Generate chained-CTE SQL computing `iters` exact power-method steps
    (same update rule as cugraph_spark.link_analysis.pagerank: dangling
    mass redistributed through the uniform reset vector)."""
    # MATERIALIZED CTEs: without it DuckDB inlines every CTE reference,
    # re-opening the parquet views O(iters) times (-> EMFILE) and redoing
    # the fixture join per iteration.
    w = "weight" if weighted else "1.0"
    parts = [
        f"WITH {edges_cte.strip()},",
        f"verts AS MATERIALIZED (SELECT src AS v FROM {edges_name} UNION SELECT dst FROM {edges_name}),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),",
        f"outw AS MATERIALIZED (SELECT src, SUM({w}) AS ow FROM {edges_name} GROUP BY src),",
        f"ne AS MATERIALIZED (SELECT e.src, e.dst, {w} / o.ow AS coef FROM {edges_name} e JOIN outw o ON e.src = o.src),",
        "dangv AS MATERIALIZED (SELECT v.v FROM verts v LEFT JOIN outw o ON v.v = o.src WHERE o.src IS NULL),",
        "r0 AS MATERIALIZED (SELECT v.v, 1.0 / nv.n AS r FROM verts v CROSS JOIN nv),",
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i+1}"
        parts.append(
            f"""{cur} AS MATERIALIZED (
  SELECT vv.v,
         (1 - {alpha}) / nv.n
         + {alpha} * (COALESCE(m.s, 0)
            + (SELECT COALESCE(SUM(p.r), 0) FROM {prev} p JOIN dangv d ON p.v = d.v)
              / nv.n) AS r
  FROM verts vv CROSS JOIN nv
  LEFT JOIN (SELECT e.dst AS v, SUM(e.coef * p.r) AS s
             FROM ne e JOIN {prev} p ON e.src = p.v GROUP BY e.dst) m
    ON vv.v = m.v
),"""
        )
    body = "\n".join(parts).rstrip(",") + "\n"
    return body + f"SELECT v AS vertex, ROUND(r, 6) AS pagerank FROM r{iters}"


@register(
    "pagerank_nation_flow",
    oracle=_pagerank_unrolled_sql(NATION_FLOW_SQL, "nf_edges", 0.85, PR_ITERS, weighted=True),
)
def q_pagerank_nation_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted directed pagerank, fixed 30 iterations (SURVEY §2.C)."""
    from cugraph_spark import pagerank

    g = nation_flow_graph(spark, sf_dir, directed=True)
    pr = pagerank(g, alpha=0.85, max_iter=PR_ITERS, tol=0.0, fail_on_nonconvergence=False)
    return pr.select("vertex", F.round("pagerank", 6).alias("pagerank"))


@register(
    "pagerank_copurchase",
    oracle=_pagerank_unrolled_sql(COPURCHASE_SQL, "cp_edges", 0.85, 20, weighted=False),
)
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted undirected pagerank on the medium co-purchase graph."""
    from cugraph_spark import pagerank

    g = copurchase_graph(spark, sf_dir)
    pr = pagerank(g, alpha=0.85, max_iter=20, tol=0.0, fail_on_nonconvergence=False)
    return pr.select("vertex", F.round("pagerank", 6).alias("pagerank"))


# ---------------------------------------------------------------------------
# Traversal fixtures: customer<->supplier bipartite (supplier keys offset)
# ---------------------------------------------------------------------------

SUPP_OFFSET = 20_000_000

# full bipartite graph (both directions = symmetrized undirected)
CUST_SUPP_SQL = f"""
cs_pairs AS MATERIALIZED (
    SELECT DISTINCT o.o_custkey AS a, l.l_suppkey + {SUPP_OFFSET} AS b
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cs_edges AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM cs_pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM cs_pairs
)
"""

# sparse variant (high-quantity lineitems only) -> multiple components
CUST_SUPP_SPARSE_SQL = f"""
css_pairs AS MATERIALIZED (
    SELECT DISTINCT o.o_custkey AS a, l.l_suppkey + {SUPP_OFFSET} AS b
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity > 48
),
css_edges AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM css_pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM css_pairs
)
"""


def cust_supp_pairs(spark: SparkSession, sf_dir: str, sparse: bool = False) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    l = _read(spark, sf_dir, "lineitem")
    if sparse:
        l = l.filter(F.col("l_quantity") > 48)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("dst"),
        )
        .distinct()
    )


def cust_supp_graph(spark: SparkSession, sf_dir: str, sparse: bool = False):
    from cugraph_spark import Graph

    g = Graph(directed=False)
    g.from_edgelist(cust_supp_pairs(spark, sf_dir, sparse), "src", "dst")
    return g


# ---------------------------------------------------------------------------
# BFS — unrolled-SQL oracle (min distance per level; min predecessor)
# ---------------------------------------------------------------------------

BFS_DEPTH = 6
INT_MAX = 2147483647


def _bfs_unrolled_sql(edges_cte: str, edges_name: str, source: int, depth: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM {edges_name}),",
        f"r0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS v, 0 AS dist),",
    ]
    for i in range(depth):
        parts.append(
            f"""r{i+1} AS MATERIALIZED (
  SELECT v, MIN(dist) AS dist FROM (
    SELECT v, dist FROM r{i}
    UNION ALL
    SELECT e.dst AS v, f.dist + 1 AS dist
    FROM {edges_name} e JOIN r{i} f ON e.src = f.v
    WHERE f.dist = {i}
  ) GROUP BY v
),"""
        )
    last = f"r{depth}"
    parts.append(
        f"""preds AS MATERIALIZED (
  SELECT e.dst AS v, MIN(e.src) AS pred
  FROM {edges_name} e
  JOIN {last} du ON e.src = du.v
  JOIN {last} dv ON e.dst = dv.v
  WHERE du.dist = dv.dist - 1
  GROUP BY e.dst
)"""
    )
    body = "\n".join(parts) + "\n"
    return body + f"""
SELECT vv.v AS vertex,
       CAST(COALESCE(r.dist, {INT_MAX}) AS INTEGER) AS distance,
       CAST(CASE WHEN r.dist = 0 OR r.dist IS NULL THEN -1
                 ELSE COALESCE(p.pred, -1) END AS BIGINT) AS predecessor
FROM verts vv
LEFT JOIN {last} r ON vv.v = r.v
LEFT JOIN preds p ON vv.v = p.v
"""


@register(
    "bfs_cust_supp",
    oracle=_bfs_unrolled_sql(CUST_SUPP_SQL, "cs_edges", 1, BFS_DEPTH),
)
def q_bfs_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS from customer 1 over the customer-supplier bipartite graph,
    fixed depth limit (SURVEY §2.B bfs)."""
    from cugraph_spark import bfs

    g = cust_supp_graph(spark, sf_dir)
    return bfs(g, 1, depth_limit=BFS_DEPTH)


# ---------------------------------------------------------------------------
# SSSP — unrolled Bellman-Ford oracle
# ---------------------------------------------------------------------------

SSSP_ITERS = 26  # >= V-1 on the 25-vertex nation graph


def _sssp_unrolled_sql(edges_cte: str, edges_name: str, source: int, iters: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"verts AS MATERIALIZED (SELECT src AS v FROM {edges_name} UNION SELECT dst FROM {edges_name}),",
        f"d0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS v, CAST(0 AS DOUBLE) AS dist),",
    ]
    for i in range(iters):
        parts.append(
            f"""d{i+1} AS MATERIALIZED (
  SELECT v, MIN(dist) AS dist FROM (
    SELECT v, dist FROM d{i}
    UNION ALL
    SELECT e.dst AS v, f.dist + e.weight AS dist
    FROM {edges_name} e JOIN d{i} f ON e.src = f.v
  ) GROUP BY v
),"""
        )
    last = f"d{iters}"
    parts.append(
        f"""preds AS MATERIALIZED (
  SELECT e.dst AS v, MIN(e.src) AS pred
  FROM {edges_name} e
  JOIN {last} du ON e.src = du.v
  JOIN {last} dv ON e.dst = dv.v
  WHERE du.dist + e.weight = dv.dist
  GROUP BY e.dst
)"""
    )
    body = "\n".join(parts) + "\n"
    return body + f"""
SELECT vv.v AS vertex,
       ROUND(COALESCE(r.dist, 1e308 * 10), 6) AS distance,
       CAST(CASE WHEN r.dist = 0 OR r.dist IS NULL THEN -1
                 ELSE COALESCE(p.pred, -1) END AS BIGINT) AS predecessor
FROM verts vv
LEFT JOIN {last} r ON vv.v = r.v
LEFT JOIN preds p ON vv.v = p.v
"""


@register(
    "sssp_nation_flow",
    oracle=_sssp_unrolled_sql(NATION_FLOW_SQL, "nf_edges", 0, SSSP_ITERS),
)
def q_sssp_nation_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP from nation 0 on the nation-flow digraph (SURVEY §2.B)."""
    from cugraph_spark import sssp

    g = nation_flow_graph(spark, sf_dir, directed=True)
    out = sssp(g, 0)
    return out.select("vertex", F.round("distance", 6).alias("distance"), "predecessor")


# ---------------------------------------------------------------------------
# WCC — unrolled min-label-propagation oracle
# ---------------------------------------------------------------------------

WCC_ITERS = 30


def _wcc_unrolled_sql(edges_cte: str, edges_name: str, iters: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM {edges_name}),",
        "l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"""l{i+1} AS MATERIALIZED (
  SELECT vv.v, LEAST(lv.lab, COALESCE(m.nbr, lv.lab)) AS lab
  FROM verts vv
  JOIN l{i} lv ON vv.v = lv.v
  LEFT JOIN (SELECT e.dst AS v, MIN(f.lab) AS nbr
             FROM {edges_name} e JOIN l{i} f ON e.src = f.v
             GROUP BY e.dst) m ON vv.v = m.v
),"""
        )
    body = "\n".join(parts).rstrip(",") + "\n"
    return body + f"SELECT v AS vertex, lab AS labels FROM l{iters}"


@register(
    "wcc_cust_supp_sparse",
    oracle=_wcc_unrolled_sql(CUST_SUPP_SPARSE_SQL, "css_edges", WCC_ITERS),
)
def q_wcc_cust_supp_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WCC on the sparse customer-supplier graph (multiple components);
    labels = min vertex id per component (SURVEY §2.E)."""
    from cugraph_spark import weakly_connected_components

    g = cust_supp_graph(spark, sf_dir, sparse=True)
    return weakly_connected_components(g)


# ---------------------------------------------------------------------------
# Sparse co-purchase fixture (high-quantity lineitems): small enough for
# triangle/truss/core oracles, still has rich triangle structure.
# ---------------------------------------------------------------------------

COPURCHASE_SPARSE_SQL = """
cps_cs AS MATERIALIZED (
    SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity > 48
),
cps_pairs AS MATERIALIZED (
    SELECT a.cust AS src, b.cust AS dst
    FROM cps_cs a JOIN cps_cs b ON a.supp = b.supp
    WHERE a.cust < b.cust
    GROUP BY 1, 2
),
cps_edges AS MATERIALIZED (
    SELECT src, dst FROM cps_pairs
    UNION ALL
    SELECT dst AS src, src AS dst FROM cps_pairs
)
"""


def copurchase_sparse_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    l = _read(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    cs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    a, b = cs.alias("a"), cs.alias("b")
    return (
        a.join(b, F.col("a.supp") == F.col("b.supp"))
        .filter(F.col("a.cust") < F.col("b.cust"))
        .select(F.col("a.cust").alias("src"), F.col("b.cust").alias("dst"))
        .distinct()
    )


def copurchase_sparse_graph(spark: SparkSession, sf_dir: str):
    from cugraph_spark import Graph

    g = Graph(directed=False)
    g.from_edgelist(copurchase_sparse_pairs(spark, sf_dir), "src", "dst")
    return g


# ---------------------------------------------------------------------------
# two-hop neighbors
# ---------------------------------------------------------------------------


@register(
    "two_hop_cust_supp_sparse",
    oracle=f"""
WITH {CUST_SUPP_SPARSE_SQL.strip()}
SELECT DISTINCT e1.src AS first, e2.dst AS second
FROM css_edges e1 JOIN css_edges e2 ON e1.dst = e2.src
WHERE e1.src <> e2.dst
""",
)
def q_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_two_hop_neighbors (SURVEY §2.A)."""
    from cugraph_spark import get_two_hop_neighbors

    g = cust_supp_graph(spark, sf_dir, sparse=True)
    return get_two_hop_neighbors(g)


# ---------------------------------------------------------------------------
# similarity family (SURVEY §2.F) — all-pairs over two-hop wedges
# ---------------------------------------------------------------------------

_SIM_PRELUDE = f"""
WITH {COPURCHASE_SPARSE_SQL.strip()},
pairs AS MATERIALIZED (
    SELECT DISTINCT e1.src AS first, e2.dst AS second
    FROM cps_edges e1 JOIN cps_edges e2 ON e1.dst = e2.src
    WHERE e1.src <> e2.dst
),
deg AS MATERIALIZED (
    SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM cps_edges GROUP BY 1
),
inter AS MATERIALIZED (
    SELECT p.first, p.second, CAST(COUNT(*) AS DOUBLE) AS i
    FROM pairs p
    JOIN cps_edges ea ON ea.src = p.first
    JOIN cps_edges eb ON eb.src = p.second AND eb.dst = ea.dst
    GROUP BY 1, 2
)
"""


def _sim_oracle(metric: str, denom: str) -> str:
    return (
        _SIM_PRELUDE
        + f"""
SELECT p.first, p.second,
       ROUND(COALESCE(i.i, 0) / ({denom}), 6) AS {metric}_coeff
FROM pairs p
JOIN deg da ON da.v = p.first
JOIN deg db ON db.v = p.second
LEFT JOIN inter i ON i.first = p.first AND i.second = p.second
"""
    )


def _make_sim_query(metric: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        import cugraph_spark as cg

        g = copurchase_sparse_graph(spark, sf_dir)
        fn = getattr(cg, metric)
        out = fn(g)
        coeff = f"{metric}_coeff"
        return out.select("first", "second", F.round(coeff, 6).alias(coeff))

    q.__name__ = f"q_{metric}_copurchase_sparse"
    q.__doc__ = f"all-two-hop-pairs {metric} similarity (SURVEY §2.F)."
    return q


for _metric, _denom in [
    ("jaccard", "da.d + db.d - COALESCE(i.i, 0)"),
    ("overlap", "LEAST(da.d, db.d)"),
    ("sorensen", "(da.d + db.d) / 2"),
    ("cosine", "SQRT(da.d * db.d)"),
]:
    _d = _denom if _metric != "sorensen" else "(da.d + db.d)"
    _oracle = (
        _sim_oracle(_metric, _denom)
        if _metric != "sorensen"
        else _SIM_PRELUDE
        + """
SELECT p.first, p.second,
       ROUND(2 * COALESCE(i.i, 0) / (da.d + db.d), 6) AS sorensen_coeff
FROM pairs p
JOIN deg da ON da.v = p.first
JOIN deg db ON db.v = p.second
LEFT JOIN inter i ON i.first = p.first AND i.second = p.second
"""
    )
    register(f"{_metric}_copurchase_sparse", _oracle)(_make_sim_query(_metric))


# ---------------------------------------------------------------------------
# triangle count
# ---------------------------------------------------------------------------


@register(
    "triangle_count_copurchase_sparse",
    oracle=f"""
WITH {COPURCHASE_SPARSE_SQL.strip()},
tri AS MATERIALIZED (
    SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
    FROM cps_pairs ab
    JOIN cps_pairs bc ON ab.dst = bc.src
    JOIN cps_pairs ac ON ac.src = ab.src AND ac.dst = bc.dst
),
corners AS MATERIALIZED (
    SELECT a AS vertex FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
),
verts AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM cps_edges)
SELECT v.vertex, CAST(COALESCE(t.c, 0) AS BIGINT) AS counts
FROM verts v
LEFT JOIN (SELECT vertex, COUNT(*) AS c FROM corners GROUP BY 1) t
  ON v.vertex = t.vertex
""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts (SURVEY §2.D)."""
    from cugraph_spark import triangle_count

    g = copurchase_sparse_graph(spark, sf_dir)
    return triangle_count(g)


# ---------------------------------------------------------------------------
# core number (h-index fixpoint, unrolled) & k-core (peeling, unrolled)
# ---------------------------------------------------------------------------

CORE_ITERS = 60


def _core_number_unrolled_sql(edges_cte: str, edges_name: str, iters: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"h0 AS MATERIALIZED (SELECT src AS vertex, CAST(COUNT(*) AS INT) AS c FROM {edges_name} GROUP BY src),",
    ]
    for i in range(iters):
        parts.append(
            f"""h{i+1} AS MATERIALIZED (
  SELECT s.vertex, CAST(LEAST(s.c, COALESCE(hh.h, 0)) AS INT) AS c
  FROM h{i} s
  LEFT JOIN (
    SELECT src AS vertex, MAX(LEAST(c, rn)) AS h FROM (
      SELECT e.src, f.c,
             ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY f.c DESC) AS rn
      FROM {edges_name} e JOIN h{i} f ON e.dst = f.vertex
    ) GROUP BY src
  ) hh ON s.vertex = hh.vertex
),"""
        )
    body = "\n".join(parts).rstrip(",") + "\n"
    return body + f"SELECT vertex, CAST(c AS BIGINT) AS core_number FROM h{iters}"


@register(
    "core_number_copurchase_sparse",
    oracle=_core_number_unrolled_sql(COPURCHASE_SPARSE_SQL, "cps_edges", CORE_ITERS),
)
def q_core_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition numbers (SURVEY §2.A)."""
    from cugraph_spark import core_number

    g = copurchase_sparse_graph(spark, sf_dir)
    return core_number(g)


KCORE_K = 3
KCORE_ITERS = 40


def _k_core_unrolled_sql(edges_cte: str, edges_name: str, k: int, iters: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"a0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM {edges_name}),",
    ]
    for i in range(iters):
        parts.append(
            f"""a{i+1} AS MATERIALIZED (
  SELECT e.src AS v FROM {edges_name} e
  JOIN a{i} s ON e.src = s.v
  JOIN a{i} t ON e.dst = t.v
  GROUP BY e.src HAVING COUNT(*) >= {k}
),"""
        )
    last = f"a{iters}"
    body = "\n".join(parts).rstrip(",") + "\n"
    return body + f"""
SELECT e.src, e.dst FROM {edges_name} e
JOIN {last} s ON e.src = s.v
JOIN {last} t ON e.dst = t.v
WHERE e.src < e.dst
"""


@register(
    "k_core_copurchase_sparse",
    oracle=_k_core_unrolled_sql(COPURCHASE_SPARSE_SQL, "cps_edges", KCORE_K, KCORE_ITERS),
)
def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core subgraph edge list, k=3 (SURVEY §2.A)."""
    from cugraph_spark.cores.k_core import k_core_edges

    g = copurchase_sparse_graph(spark, sf_dir)
    return k_core_edges(g, KCORE_K)


# ---------------------------------------------------------------------------
# katz / eigenvector / hits / degree centrality
# ---------------------------------------------------------------------------

KATZ_ALPHA = 0.001
KATZ_BETA = 1.0
KATZ_ITERS = 25


def _katz_unrolled_sql(edges_cte: str, edges_name: str, alpha: float, beta: float, iters: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"verts AS MATERIALIZED (SELECT src AS v FROM {edges_name} UNION SELECT dst FROM {edges_name}),",
        "c0 AS MATERIALIZED (SELECT v, CAST(0 AS DOUBLE) AS c FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"""c{i+1} AS MATERIALIZED (
  SELECT vv.v, {alpha} * COALESCE(m.s, 0) + {beta} AS c
  FROM verts vv
  LEFT JOIN (SELECT e.dst AS v, SUM(f.c * e.weight) AS s
             FROM {edges_name} e JOIN c{i} f ON e.src = f.v GROUP BY e.dst) m
    ON vv.v = m.v
),"""
        )
    last = f"c{iters}"
    parts.append(f"l2 AS MATERIALIZED (SELECT SQRT(SUM(c * c)) AS n FROM {last})")
    body = "\n".join(parts) + "\n"
    return body + f"SELECT v AS vertex, ROUND(c / l2.n, 6) AS katz_centrality FROM {last} CROSS JOIN l2"


@register(
    "katz_nation_flow",
    oracle=_katz_unrolled_sql(NATION_FLOW_SQL, "nf_edges", KATZ_ALPHA, KATZ_BETA, KATZ_ITERS),
)
def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Katz centrality, fixed iterations, L2-normalized (SURVEY §2.C)."""
    from cugraph_spark import katz_centrality

    g = nation_flow_graph(spark, sf_dir, directed=True)
    out = katz_centrality(
        g, alpha=KATZ_ALPHA, beta=KATZ_BETA, max_iter=KATZ_ITERS, tol=0.0,
        normalized=True, fail_on_nonconvergence=False,
    )
    return out.select("vertex", F.round("katz_centrality", 6).alias("katz_centrality"))


EIG_ITERS = 20


def _eigenvector_unrolled_sql(edges_cte: str, edges_name: str, iters: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"verts AS MATERIALIZED (SELECT src AS v FROM {edges_name} UNION SELECT dst FROM {edges_name}),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),",
        "c0 AS MATERIALIZED (SELECT v.v, 1.0 / nv.n AS c FROM verts v CROSS JOIN nv),",
    ]
    for i in range(iters):
        parts.append(
            f"""raw{i+1} AS MATERIALIZED (
  SELECT vv.v, COALESCE(m.s, 0) + f0.c AS c
  FROM verts vv
  JOIN c{i} f0 ON vv.v = f0.v
  LEFT JOIN (SELECT e.dst AS v, SUM(f.c * e.weight) AS s
             FROM {edges_name} e JOIN c{i} f ON e.src = f.v GROUP BY e.dst) m
    ON vv.v = m.v
),
c{i+1} AS MATERIALIZED (
  SELECT r.v, r.c / l.n AS c
  FROM raw{i+1} r CROSS JOIN (SELECT SQRT(SUM(c * c)) AS n FROM raw{i+1}) l
),"""
        )
    body = "\n".join(parts).rstrip(",") + "\n"
    return body + f"SELECT v AS vertex, ROUND(c, 6) AS eigenvector_centrality FROM c{iters}"


@register(
    "eigenvector_nation_flow",
    oracle=_eigenvector_unrolled_sql(NATION_FLOW_SQL, "nf_edges", EIG_ITERS),
)
def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted eigenvector centrality on (A+I), fixed iterations (SURVEY §2.C)."""
    from cugraph_spark import eigenvector_centrality

    g = nation_flow_graph(spark, sf_dir, directed=True)
    out = eigenvector_centrality(g, max_iter=EIG_ITERS, tol=0.0, fail_on_nonconvergence=False)
    return out.select(
        "vertex", F.round("eigenvector_centrality", 6).alias("eigenvector_centrality")
    )


HITS_ITERS = 20

CUST_SUPP_DIRECTED_SQL = f"""
csd_edges AS MATERIALIZED (
    SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {SUPP_OFFSET} AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
"""


def _hits_unrolled_sql(edges_cte: str, edges_name: str, iters: int) -> str:
    parts = [
        f"WITH {edges_cte.strip()},",
        f"verts AS MATERIALIZED (SELECT src AS v FROM {edges_name} UNION SELECT dst FROM {edges_name}),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),",
        "h0 AS MATERIALIZED (SELECT v.v, 1.0 / nv.n AS h FROM verts v CROSS JOIN nv),",
    ]
    for i in range(iters):
        parts.append(
            f"""ar{i+1} AS MATERIALIZED (
  SELECT vv.v, COALESCE(m.s, 0) AS a
  FROM verts vv
  LEFT JOIN (SELECT e.dst AS v, SUM(f.h) AS s
             FROM {edges_name} e JOIN h{i} f ON e.src = f.v GROUP BY e.dst) m
    ON vv.v = m.v
),
hr{i+1} AS MATERIALIZED (
  SELECT vv.v, COALESCE(m.s, 0) AS h
  FROM verts vv
  LEFT JOIN (SELECT e.src AS v, SUM(f.a) AS s
             FROM {edges_name} e JOIN ar{i+1} f ON e.dst = f.v GROUP BY e.src) m
    ON vv.v = m.v
),
a{i+1} AS MATERIALIZED (
  SELECT r.v, r.a / l.m AS a FROM ar{i+1} r CROSS JOIN (SELECT MAX(a) AS m FROM ar{i+1}) l
),
h{i+1} AS MATERIALIZED (
  SELECT r.v, r.h / l.m AS h FROM hr{i+1} r CROSS JOIN (SELECT MAX(h) AS m FROM hr{i+1}) l
),"""
        )
    body = "\n".join(parts).rstrip(",") + "\n"
    return body + f"""
SELECT hh.v AS vertex,
       ROUND(hh.h / hs.s, 6) AS hubs,
       ROUND(aa.a / bs.s, 6) AS authorities
FROM h{iters} hh
JOIN a{iters} aa ON hh.v = aa.v
CROSS JOIN (SELECT SUM(h) AS s FROM h{iters}) hs
CROSS JOIN (SELECT SUM(a) AS s FROM a{iters}) bs
"""


@register(
    "hits_cust_supp",
    oracle=_hits_unrolled_sql(CUST_SUPP_DIRECTED_SQL, "csd_edges", HITS_ITERS),
)
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS on the directed customer->supplier graph (SURVEY §2.C)."""
    from cugraph_spark import Graph, hits

    g = Graph(directed=True)
    g.from_edgelist(cust_supp_pairs(spark, sf_dir), "src", "dst")
    out = hits(g, max_iter=HITS_ITERS, tol=0.0, normalized=True)
    return out.select(
        "vertex", F.round("hubs", 6).alias("hubs"), F.round("authorities", 6).alias("authorities")
    )


@register(
    "degree_centrality_copurchase_sparse",
    oracle=f"""
WITH {COPURCHASE_SPARSE_SQL.strip()},
verts AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM cps_edges),
nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)
SELECT v.vertex, ROUND(COALESCE(d.c, 0) / (nv.n - 1), 6) AS degree_centrality
FROM verts v CROSS JOIN nv
LEFT JOIN (SELECT src AS vertex, COUNT(*) AS c FROM cps_edges GROUP BY 1) d
  ON v.vertex = d.vertex
""",
)
def q_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cugraph_spark import degree_centrality

    g = copurchase_sparse_graph(spark, sf_dir)
    out = degree_centrality(g)
    return out.select("vertex", F.round("degree_centrality", 6).alias("degree_centrality"))


# ---------------------------------------------------------------------------
# induced subgraph & ego graph
# ---------------------------------------------------------------------------


@register(
    "induced_subgraph_copurchase_sparse",
    oracle=f"""
WITH {COPURCHASE_SPARSE_SQL.strip()}
SELECT e.src, e.dst FROM cps_pairs e
WHERE e.src % 10 = 0 AND e.dst % 10 = 0
""",
)
def q_induced_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Induced subgraph on customers with key % 10 == 0 (SURVEY §2.A)."""
    from cugraph_spark import induced_subgraph

    g = copurchase_sparse_graph(spark, sf_dir)
    verts = g.nodes().filter(F.col("vertex") % 10 == 0)
    sub = induced_subgraph(g, verts)
    return sub.edges().filter(F.col("src") < F.col("dst")).select("src", "dst")


@register(
    "ego_graph_cust_supp_sparse",
    oracle=f"""
WITH {CUST_SUPP_SPARSE_SQL.strip()},
seed AS MATERIALIZED (
  SELECT MIN(src) AS v FROM css_edges WHERE src < 20000000
),
h1 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS v FROM css_edges e JOIN seed s ON e.src = s.v
),
reach AS MATERIALIZED (
  SELECT v FROM seed
  UNION SELECT v FROM h1
  UNION SELECT DISTINCT e.dst FROM css_edges e JOIN h1 ON e.src = h1.v
)
SELECT e.src, e.dst FROM css_edges e
JOIN reach a ON e.src = a.v
JOIN reach b ON e.dst = b.v
WHERE e.src < e.dst
""",
)
def q_ego_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-2 ego net of customer 1 (SURVEY §2.A)."""
    from cugraph_spark import ego_graph

    g = cust_supp_graph(spark, sf_dir, sparse=True)
    seed = (
        g.nodes().filter(F.col("vertex") < 20_000_000).agg(F.min("vertex")).collect()[0][0]
    )
    sub = ego_graph(g, seed, radius=2)
    return sub.edges().filter(F.col("src") < F.col("dst")).select("src", "dst")
