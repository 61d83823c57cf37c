"""R-MAT scaling probe: the measured evidence behind the 100-TB story.

Generates R-MAT graphs (16 edges/vertex, the reference benchmark's
edgefactor) at increasing scales and times the headline algorithms on
each; near-linear growth in |E| across two orders of magnitude is the
strongest local signal the plans survive a cluster-scale blow-up. The
reference's published anchor is R-MAT scale-23 (134M edges) on 2 GPUs:
BFS 0.569s, SSSP 1.481s (benchmarks/cugraph/standalone).

Usage: python scripts/bench_scale.py [scale ...]   (default: 18 20 22)
Set SPARK_GRAFT_DRIVER_MEM=48g for scale >= 22 (134M symmetrized rows).
SPARK_GRAFT_SCALE_OPS selects ops (comma list, default
"pagerank,bfs,wcc,sssp"; also available: "jaccard" (the reference's own two-hop-pairs-of-10-random-vertices jaccard bench shape), "triangles" — the reference's
own pytest-bench counts triangles at scale-20
(benchmarks/cugraph/pytest-based/bench_algos.py), "betweenness" (k=10
sampled sources, the reference pytest-bench's own scale-20 shape),
"ktruss", "neighbor_sample" (2-hop fanout [10,25] over 1024 batched
seeds, the reference bulk-sampler shape), "louvain3", three
synchronous local-move passes of the level-0 louvain loop, the
shuffle-heaviest non-traversal pattern: per-pass edge-sized
groupBy(vertex, community), and "scc" (multi-pivot coloring over the
directed R-MAT edges — the reference's hardest component)).
Prints one JSON line per scale.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from cugraph_spark.session import get_spark
from cugraph_spark import Graph, pagerank, bfs, weakly_connected_components, sssp, rmat

scales = [int(a) for a in sys.argv[1:]] or [18, 20, 22]
ops = os.environ.get("SPARK_GRAFT_SCALE_OPS", "pagerank,bfs,wcc,sssp").split(",")

spark = get_spark("scale_probe")
spark.sparkContext.setLogLevel("ERROR")

for scale in scales:
    ne = (1 << scale) * 16
    res = {"metric": "rmat_scale_probe", "scale": scale, "unit": "sec"}
    t0 = time.time()
    edges = rmat(scale, ne, seed=42, include_edge_weights=True,
                 minimum_weight=0.1, maximum_weight=1.0, spark=spark)
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst", weight="weight")
    res["edges"] = g.number_of_edges(directed_edges=True)
    res["vertices"] = g.number_of_vertices()
    res["build"] = round(time.time() - t0, 1)

    if "pagerank" in ops:
        t0 = time.time()
        pagerank(g, max_iter=10, tol=0.0, fail_on_nonconvergence=False).agg(
            F.sum("pagerank")
        ).collect()
        res["pagerank_10iter"] = round(time.time() - t0, 1)

    if "bfs" in ops:
        t0 = time.time()
        bfs(g, 0).agg(F.max("distance")).collect()
        res["bfs"] = round(time.time() - t0, 1)

    if "wcc" in ops:
        t0 = time.time()
        weakly_connected_components(g).agg(F.countDistinct("labels")).collect()
        res["wcc"] = round(time.time() - t0, 1)

    if "sssp" in ops:
        t0 = time.time()
        sssp(g, 0).agg(
            F.sum(F.when(F.col("distance") != float("inf"), F.col("distance")))
        ).collect()
        res["sssp"] = round(time.time() - t0, 1)

    if "triangles" in ops:
        from cugraph_spark import triangle_count

        t0 = time.time()
        res["triangles_total"] = triangle_count(g).agg(
            (F.sum("counts") / 3).cast("long")
        ).collect()[0][0]
        res["triangle_count"] = round(time.time() - t0, 1)

    if "jaccard" in ops:
        # Mirrors the reference's own jaccard benchmark shape
        # (benchmarks/cugraph/pytest-based/bench_algos.py:311 +
        # get_vertex_pairs:235): two-hop pairs of 10 random start
        # vertices — full all-pairs OOMs even on the reference's GPUs,
        # so the honest comparable is the seeded-subset wedge load. On
        # R-MAT the draw usually lands hub-adjacent vertices, so the
        # intersection join still sees million-row wedge fan-outs.
        from cugraph_spark import all_pairs_jaccard

        t0 = time.time()
        verts = [
            r["vertex"]
            for r in g.select_random_vertices(
                random_state=42, num_vertices=10
            ).collect()
        ]
        sim = all_pairs_jaccard(g, vertices=verts)
        row = sim.agg(
            F.count("*").alias("p"), F.sum("jaccard_coeff").alias("s")
        ).collect()[0]
        res["jaccard_pairs"] = row["p"]
        res["jaccard"] = round(time.time() - t0, 1)

    if "ktruss" in ops:
        # Iterative support-prune: triangle_count's intersection plan
        # re-run on each round's survivor set until fixpoint. k=10 on
        # R-MAT keeps a dense-core truss alive for several rounds.
        from cugraph_spark import ktruss_subgraph

        t0 = time.time()
        sub = ktruss_subgraph(g, k=10)
        res["ktruss_edges"] = sub.edges().filter(F.col("src") < F.col("dst")).count()
        res["ktruss"] = round(time.time() - t0, 1)

    if "scc" in ops:
        # The reference marks SCC as its hardest component
        # (cpp/src/components/strongly_connected_components_impl.cuh,
        # 2386 LoC); ours is the multi-pivot coloring loop — the last
        # doubly-iterative op to get scale rows (r5 verdict #3). R-MAT
        # edges interpreted as DIRECTED: one giant SCC core plus a long
        # tail of singleton/small components, so both the coloring inner
        # loop and the shatter-and-shrink outer loop do real rounds.
        from cugraph_spark import strongly_connected_components
        from cugraph_spark.components import connectivity as _conn

        gd = Graph(directed=True)
        gd.from_edgelist(edges, "src", "dst", weight="weight")
        t0 = time.time()
        res["scc_components"] = strongly_connected_components(gd).agg(
            F.countDistinct("labels")
        ).collect()[0][0]
        res["scc"] = round(time.time() - t0, 1)
        res["scc_rounds"] = getattr(_conn, "_last_scc_stats", None)
        gd.edgelist.unpersist()
        gd.vertices_internal.unpersist()

    if "core_number" in ops:
        # h-index fixpoint (cores/core_number.py) — r6 sweep evidence:
        # per-round state update is a hinted broadcast join below the
        # state threshold; the E-side h-index agg keys on the cached
        # src partitioning (already aligned).
        from cugraph_spark import core_number

        t0 = time.time()
        row = core_number(g).agg(
            F.max("core_number").alias("m"), F.count("*").alias("n")
        ).collect()[0]
        res["core_number_max"] = int(row["m"])
        res["core_number"] = round(time.time() - t0, 1)

    if "mis" in ops:
        # Luby MIS (components/mis.py) — r6 sweep evidence: both
        # per-round aggs flipped onto the cached src partitioning and
        # every V-bounded join side hinted.
        from cugraph_spark import maximal_independent_set

        t0 = time.time()
        res["mis_size"] = maximal_independent_set(g, seed=42).count()
        res["mis"] = round(time.time() - t0, 1)

    if "coloring" in ops:
        # Speculative rank-based coloring (components/vertex_coloring.py)
        # — r6 sweep evidence for the hinted V-joins + the deliberately
        # dst-keyed (ReusedExchange) compaction aggs.
        from cugraph_spark import vertex_coloring

        t0 = time.time()
        row = vertex_coloring(g, seed=42).agg(
            F.countDistinct("color").alias("c")
        ).collect()[0]
        res["coloring_colors"] = int(row["c"])
        res["coloring"] = round(time.time() - t0, 1)

    if "betweenness" in ops:
        # The reference's own pytest-bench runs betweenness_centrality
        # with k=10 sampled sources at R-MAT scale-20
        # (benchmarks/cugraph/pytest-based/bench_algos.py) — the
        # per-source Brandes forward/backward sweeps are the
        # shuffle-heaviest traversal pattern we ship.
        from cugraph_spark import betweenness_centrality

        t0 = time.time()
        row = betweenness_centrality(g, k=10, seed=42).agg(
            F.sum("betweenness_centrality").alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        res["betweenness_sum"] = round(float(row["s"]), 3)
        res["betweenness_k10"] = round(time.time() - t0, 1)

    if "neighbor_sample" in ops:
        # GNN minibatch shape: the reference's bulk sampler benchmarks
        # (benchmarks/cugraph/standalone/bulk_sampling) run 2-hop
        # uniform neighbor sampling with fanout [10, 25] over batched
        # seed lists. 1024 seeds x 16 batches; hop-1 frontier fans to
        # ~10k sources, hop-2 scores E-sized candidate joins twice.
        from cugraph_spark import homogeneous_neighbor_sample

        t0 = time.time()
        seeds = [
            r["vertex"]
            for r in g.select_random_vertices(
                random_state=7, num_vertices=1024
            ).collect()
        ]
        samp = homogeneous_neighbor_sample(
            g, seeds, [10, 25], random_state=42,
            starting_vertex_label_offsets=list(range(0, 1025, 64)),
        )
        row = samp.agg(F.count("*").alias("n"),
                       F.countDistinct("minors").alias("d")).collect()[0]
        res["neighbor_sample_rows"] = row["n"]
        res["neighbor_sample"] = round(time.time() - t0, 1)

    if "lap" in ops:
        # Distributed auction LAP above the dense-driver guard: n
        # workers, 16 integer-cost candidates per worker (identity
        # offset keeps it feasible), n = 2^(scale-4) so scale
        # 16/18/20 -> 4k/16k/64k workers — all on the auction IterLoop
        # path (dense JV handles <= 2000). SPARK_GRAFT_LAP_SLACK
        # (default 0.25) sizes the task space to n*(1+slack): slack
        # tasks absorb the price wars (the docstring-documented 7-vs-251
        # sweep effect), which is the shape a real at-scale matching
        # carries; slack=0 gives the symmetric eps-scaled stress case.
        from cugraph_spark import Graph as _G
        from cugraph_spark.linear_assignment.lap import hungarian_auction

        n_lap = 1 << (scale - 4)
        slack = float(os.environ.get("SPARK_GRAFT_LAP_SLACK", "0.25"))
        n_tasks = int(n_lap * (1.0 + slack))
        off = F.when(F.col("d") == 0, F.lit(0)).otherwise(
            F.abs(F.xxhash64("src", "d")) % F.lit(n_tasks)
        )  # d=0 keeps the identity candidate -> perfect matching exists
        cand = spark.range(n_lap).select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("d"),
        ).select(
            "src",
            (F.lit(n_lap) + (F.col("src") + off) % F.lit(n_tasks)).alias("dst"),
            (F.abs(F.xxhash64("src", "d", F.lit(1))) % 10000
             ).cast("double").alias("weight"),
        ).dropDuplicates(["src", "dst"])
        glap = _G(directed=True)
        glap.from_edgelist(cand, "src", "dst", weight="weight")
        t0 = time.time()
        total, assign = hungarian_auction(glap, list(range(n_lap)))
        res["lap_total"] = int(total)
        res["lap_workers"] = n_lap
        res["lap_tasks"] = n_tasks
        res["lap_auction"] = round(time.time() - t0, 1)
        glap.edgelist.unpersist()

    if "louvain3" in ops:
        from cugraph_spark.community.louvain import _one_level
        from cugraph_spark.plans import iterloop

        e = iterloop.materialize(
            g.edgelist.select("src", "dst", F.col("weight").alias("_w"))
        )
        with iterloop.small_plan(
            spark, res["vertices"], shuffled_rows=res["edges"]
        ):
            t0 = time.time()
            assign, _ = _one_level(
                e, 1.0, 3, 1e-7, compute_q=False, n_edges=res["edges"]
            )
            res["louvain3_comms"] = assign.agg(
                F.countDistinct("community")
            ).collect()[0][0]
            res["louvain3"] = round(time.time() - t0, 1)

    print(json.dumps(res), flush=True)
    g.edgelist.unpersist()
    g.vertices_internal.unpersist()
spark.stop()
