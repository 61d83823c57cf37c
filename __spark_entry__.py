"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``cugraph_spark`` (this repo) — see SURVEY.md.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F


SF0001 = "/root/testdata/sf0.001"


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer co-purchase graph: customers linked when they bought from
    the same supplier (FIXTURES.md §3 `cust_cust_copurchase`)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the sf0.001 co-purchase graph and return the top-20
    customers by PageRank."""
    from cugraph_spark import Graph, pagerank

    edges = _copurchase_edges(spark, SF0001)
    g = Graph(directed=False)
    g.from_edgelist(edges, source="src", destination="dst")
    pr = pagerank(g, alpha=0.85, max_iter=50, tol=1e-8, fail_on_nonconvergence=False)
    return (
        pr.select(F.col("vertex").cast("long").alias("vertex"),
                  F.round(F.col("pagerank"), 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("vertex"))
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from queries_registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (unrolled-iteration SQL for
    iterative algorithms)."""
    from queries_registry import ORACLES

    return dict(ORACLES)
