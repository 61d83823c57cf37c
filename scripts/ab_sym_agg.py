"""Interleaved A/B for the symmetric aligned-aggregation flip
(iterloop.sym_aligned_agg): same session, arms alternate via
SPARK_GRAFT_SYM_AGG, one warm-up per arm first.

Usage: python scripts/ab_sym_agg.py [op ...] (default: pagerank)
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_AB_REPS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
SUPP_OFFSET = 20_000_000


def main() -> None:
    ops = sys.argv[1:] or ["pagerank"]
    from cugraph_spark.session import get_spark
    from cugraph_spark import Graph, pagerank, bfs, sssp, weakly_connected_components

    spark = get_spark("ab_sym_agg")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cs = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("dst"),
    )
    g = Graph(directed=False)
    g.from_edgelist(cs, "src", "dst")
    g.number_of_edges(directed_edges=True)

    ps = lineitem.groupBy(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("dst"),
    ).agg(F.sum("l_quantity").alias("weight"))
    g2 = Graph(directed=False)
    g2.from_edgelist(ps, "src", "dst", weight="weight")
    g2.number_of_vertices()

    fns = {
        "pagerank": lambda: pagerank(
            g, max_iter=30, tol=0.0, fail_on_nonconvergence=False
        ).agg(F.sum("pagerank")).collect(),
        "bfs": lambda: bfs(g, 1).agg(F.sum(F.col("distance").cast("double"))).collect(),
        "wcc": lambda: weakly_connected_components(g).agg(
            F.countDistinct("labels")
        ).collect(),
        "sssp": lambda: sssp(g2, 1).agg(
            F.sum(F.when(F.col("distance") != float("inf"), F.col("distance")))
        ).collect(),
    }

    for op in ops:
        fn = fns[op]
        res = {"0": [], "1": []}
        vals = {}
        for arm in ("0", "1"):  # warm-ups
            os.environ["SPARK_GRAFT_SYM_AGG"] = arm
            fn()
        for r in range(REPS):
            for arm in ("0", "1"):
                os.environ["SPARK_GRAFT_SYM_AGG"] = arm
                spark.sparkContext.setJobDescription(f"{op} arm={arm} rep={r}")
                t0 = time.time()
                v = fn()
                res[arm].append(time.time() - t0)
                vals[arm] = v[0][0]
        os.environ.pop("SPARK_GRAFT_SYM_AGG", None)
        for arm in ("0", "1"):
            s = sorted(res[arm])
            print(
                f"{op} arm={'flip' if arm == '1' else 'base'}: "
                f"min {s[0]:.2f}s samples {[round(x, 2) for x in res[arm]]} "
                f"agg={vals[arm]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
