"""Re-validate the single-JVM tuning constants under multi-process Spark
(r5 verdict next-round #2).

`BROADCAST_STATE_MAX_ROWS` and the AQE-off/8-partition `small_plan`
regime were A/B'd inside one `local[32]` JVM, where a broadcast is a
memcpy and scheduler latency is microseconds. This probe re-runs the
headline ops at R-MAT scale (default 20) on `local-cluster[4,8,3072]` —
four real executor JVMs, so per-iteration broadcasts serialize over
loopback sockets and reduce tasks land in separate processes — across
three arms:

  tuned       as shipped: broadcast-hinted state joins + AQE-off/8-part
              loop regime
  bcast_only  broadcast hints kept, small_plan disabled (AQE on, session
              shuffle partitions) — isolates the 8-partition floor
  untuned     threshold forced to 0: sort-merge state joins, AQE on —
              isolates the broadcast hint

Run:  python scripts/local_cluster_ab.py [scale] [reps]
Writes scripts/local_cluster_ab.json; ARCHITECTURE.md cites the table.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
MASTER = "local-cluster[4,8,3072]"


def new_session(name: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(MASTER)
        .appName(name)
        .config("spark.executor.memory", "3072m")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_ops(spark, edges_path: str) -> dict:
    from pyspark.sql import functions as F

    from cugraph_spark import Graph, bfs, pagerank, sssp, weakly_connected_components

    out = {}
    t0 = time.time()
    edges = spark.read.parquet(edges_path)
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst", weight="weight")
    out["edges"] = g.number_of_edges(directed_edges=True)
    out["vertices"] = g.number_of_vertices()
    out["build_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    pagerank(g, max_iter=10, tol=0.0, fail_on_nonconvergence=False).agg(
        F.sum("pagerank")
    ).collect()
    out["pagerank_10iter_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    bfs(g, 0).agg(F.max("distance")).collect()
    out["bfs_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    weakly_connected_components(g).agg(F.countDistinct("labels")).collect()
    out["wcc_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    sssp(g, 0).agg(F.sum(F.when(F.col("distance") < float("inf"), 1))).collect()
    out["sssp_s"] = round(time.time() - t0, 1)
    return out


def apply_arm(arm: str):
    """Patch iterloop for the arm; return an undo callable."""
    from cugraph_spark.plans import iterloop

    orig_thresh = iterloop.BROADCAST_STATE_MAX_ROWS
    orig_small = iterloop.small_plan
    if arm == "bcast_only":
        @contextlib.contextmanager
        def no_small_plan(spark, n_rows, shuffled_rows=None):
            yield False

        iterloop.small_plan = no_small_plan
    elif arm == "untuned":
        iterloop.BROADCAST_STATE_MAX_ROWS = 0

    def undo():
        iterloop.BROADCAST_STATE_MAX_ROWS = orig_thresh
        iterloop.small_plan = orig_small

    return undo


def main():
    from cugraph_spark import rmat
    from cugraph_spark.session import get_spark

    os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
    work = tempfile.mkdtemp(prefix="lc_ab_")
    edges_path = os.path.join(work, "edges.parquet")
    spark = get_spark("lc_ab_gen", master="local[32]")
    ne = (1 << SCALE) * 16
    rmat(SCALE, ne, seed=42, include_edge_weights=True, minimum_weight=0.1,
         maximum_weight=1.0, spark=spark).write.mode("overwrite").parquet(edges_path)
    spark.stop()
    time.sleep(2)

    results = {"master": MASTER, "scale": SCALE, "reps": REPS, "arms": {}}
    for arm in ("tuned", "bcast_only", "untuned"):
        runs = []
        for rep in range(REPS):
            undo = apply_arm(arm)
            spark = new_session(f"lc_ab_{arm}_{rep}")
            try:
                runs.append(run_ops(spark, edges_path))
            finally:
                undo()
                spark.stop()
                time.sleep(2)
        agg = {}
        for k in runs[0]:
            vals = [r[k] for r in runs]
            agg[k] = min(vals) if k.endswith("_s") else vals[0]
        agg["all_runs"] = runs
        results["arms"][arm] = agg
        print(json.dumps({arm: {k: v for k, v in agg.items() if k != "all_runs"}}))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "local_cluster_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["arms"]["tuned"], default=str)[:200])


if __name__ == "__main__":
    main()
