"""Per-phase profile of the headline bench ops (guide §1: measure first).

Instruments iterloop.materialize / collect_scalars / localCheckpoint and
DataFrame.count with wall-clock accumulators, runs each headline op once
(after the same warm-up bench.py uses), and prints a per-op breakdown:
how much of the wall is the checkpoint job, the scalar/convergence job,
and the remainder (plan construction + the fused compute inside those
jobs). This tells us whether the fixed-cost-per-job term or the data
term dominates at the bench scale, i.e. which guide-§2 lever applies.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_bench_ops.py [op ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUPP_OFFSET = 20_000_000

STATS: dict[str, list] = defaultdict(lambda: [0, 0.0])  # name -> [count, secs]


def _wrap(obj, name, label):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.time()
        out = orig(*a, **k)
        st = STATS[label]
        st[0] += 1
        st[1] += time.time() - t0
        return out

    setattr(obj, name, timed)
    return orig


def reset():
    STATS.clear()


def report(op, wall):
    tracked = sum(v[1] for v in STATS.values())
    parts = ", ".join(
        f"{k}: {v[0]}x {v[1]:.2f}s" for k, v in sorted(STATS.items(), key=lambda kv: -kv[1][1])
    )
    print(f"{op}: wall {wall:.2f}s | {parts} | untracked {wall - tracked:.2f}s", flush=True)


def main():
    ops = sys.argv[1:] or ["pagerank", "bfs", "wcc", "sssp", "build"]
    from cugraph_spark.session import get_spark
    from cugraph_spark import Graph, pagerank, bfs, sssp, weakly_connected_components
    from cugraph_spark.plans import iterloop

    spark = get_spark("profile_bench_ops")

    _wrap(iterloop, "materialize", "materialize")
    _wrap(iterloop, "collect_scalars", "collect_scalars")
    _wrap(iterloop, "truncate_lineage", "truncate_lineage")
    _wrap(DataFrame, "count", "df.count")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    def _build_cs():
        cs = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .select(
                F.col("o_custkey").alias("src"),
                (F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("dst"),
            )
            .distinct()
        )
        g = Graph(directed=False)
        g.from_edgelist(cs, "src", "dst")
        g.number_of_edges(directed_edges=True)
        return g

    def _build_ps():
        ps = lineitem.groupBy(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("dst"),
        ).agg(F.sum("l_quantity").alias("weight"))
        g2 = Graph(directed=False)
        g2.from_edgelist(ps, "src", "dst", weight="weight")
        g2.number_of_vertices()
        return g2

    # warm-up: same shape as bench.py's
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select("s_suppkey")
    tiny = supp.limit(200).select(
        F.col("s_suppkey").alias("src"),
        ((F.col("s_suppkey") * 7 % 200) + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    gw = Graph(directed=False)
    gw.from_edgelist(tiny, "src", "dst", weight="weight")
    pagerank(gw, max_iter=2, tol=0.0, fail_on_nonconvergence=False).count()
    bfs(gw, gw.nodes().first()[0]).count()
    weakly_connected_components(gw).count()
    sssp(gw, gw.nodes().first()[0]).count()

    g = _build_cs()
    g.number_of_vertices()
    g2 = _build_ps()

    reset()
    if "build" in ops:
        t0 = time.time()
        gb = _build_cs()
        report("graph_build(warm)", time.time() - t0)
        gb._edges.unpersist(blocking=True)
        gb._vertices.unpersist(blocking=True)
        reset()

    for name, fn in [
        ("pagerank", lambda: pagerank(g, max_iter=30, tol=0.0, fail_on_nonconvergence=False)
            .agg(F.sum("pagerank")).collect()),
        ("bfs", lambda: bfs(g, 1).agg(F.sum(F.col("distance").cast("double"))).collect()),
        ("wcc", lambda: weakly_connected_components(g).agg(F.countDistinct("labels")).collect()),
        ("sssp", lambda: sssp(g2, 1)
            .agg(F.sum(F.when(F.col("distance") != float("inf"), F.col("distance")))).collect()),
    ]:
        if name not in ops:
            continue
        fn()  # throwaway: steady state
        for rep in range(2):
            reset()
            t0 = time.time()
            fn()
            report(name, time.time() - t0)

    spark.stop()


if __name__ == "__main__":
    main()
