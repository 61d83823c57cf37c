"""Kill a REAL executor JVM mid-pagerank and prove the reliable-checkpoint
mode recovers — the experiment the r5 verdict asked for (next-round #1).

``local[32]`` cannot lose an executor by construction, so this probe runs
on ``local-cluster[2,4,2048]``: a standalone master + 2 worker JVMs on
this box, each running a real CoarseGrainedExecutorBackend process that
can be SIGKILLed. Three phases, fresh session each:

  A baseline   knob set (SPARK_GRAFT_CHECKPOINT_DIR, EVERY=1), no kill —
               the expected ranks.
  B recovery   same knob; a watcher thread SIGKILLs one executor JVM as
               soon as the checkpoint dir shows >= KILL_AFTER_CKPTS
               reliable rdd-* checkpoints (i.e. provably mid-loop). The
               job must finish and match A.
  C control    NO knob (plain localCheckpoint state), same-timed kill —
               expected to FAIL: local checkpoints truncate lineage, so
               the lost executor's blocks are unrecoverable by design.

Run:  python scripts/kill_recovery_probe.py [scale] [max_iter] [op]
``op`` is ``pagerank`` (default; materialize/truncate_lineage loop) or
``louvain`` (the FusedSwap primitive + multi-level dendrogram — proves
recovery is a property of the swap discipline, not of one algorithm).
Writes scripts/kill_recovery_results{_<op>}.json and prints a summary.

Uses a directed R-MAT graph (integral ids -> identity NumberMap) read
from PARQUET, so the edge lineage is reliable by construction — the same
shape as a real cluster job whose inputs live on HDFS/S3. The iteration
STATE is the only thing whose recoverability is under test.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 15
MAX_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 25
OP = sys.argv[3] if len(sys.argv) > 3 else "pagerank"
KILL_AFTER_CKPTS = 6
MASTER = "local-cluster[2,4,2048]"


def executor_pids() -> set[int]:
    out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True, text=True).stdout
    pids = set()
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line:
            pids.add(int(line.strip().split()[0]))
    return pids


def new_session(name: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(MASTER)
        .appName(name)
        .config("spark.executor.memory", "2048m")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # default task/stage retry budgets — recovery must work within them
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_pagerank(spark, edges_path: str):
    from pyspark.sql import functions as F

    from cugraph_spark import Graph, pagerank

    edges = spark.read.parquet(edges_path)
    g = Graph(directed=True)
    g.from_edgelist(edges, "src", "dst", weight="weight")
    # tol>0 + dangling vertices -> the per-pass-materialize sync path, so
    # EVERY=1 makes every iteration's state swap a reliable checkpoint
    df = pagerank(g, max_iter=MAX_ITER, tol=1e-12, fail_on_nonconvergence=False)
    rows = df.select("vertex", F.col("pagerank")).collect()
    return {r["vertex"]: r["pagerank"] for r in rows}


def run_louvain(spark, edges_path: str):
    """FusedSwap user: every swap of the local-move loop goes through the
    reliable cadence under the knob. Returns {vertex: partition} plus the
    modularity under a sentinel key."""
    from cugraph_spark import Graph, louvain

    edges = spark.read.parquet(edges_path)
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst", weight="weight")
    parts, q = louvain(g, max_level=2, max_iter=max(4, MAX_ITER // 4))
    out = {r["vertex"]: r["partition"] for r in parts.collect()}
    out["__modularity__"] = q
    return out


RUNNERS = {"pagerank": run_pagerank, "louvain": run_louvain}


def count_ckpts(ckdir: str) -> int:
    return len(glob.glob(os.path.join(ckdir, "*", "rdd-*")))


def main():
    run_op = RUNNERS[OP]
    results = {"master": MASTER, "scale": SCALE, "max_iter": MAX_ITER, "op": OP}

    # ---- phase 0: edges to parquet (reliable input, like HDFS/S3) ----
    from cugraph_spark import rmat
    from cugraph_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="kill_probe_")
    edges_path = os.path.join(work, "edges.parquet")
    os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
    spark = get_spark("kill_probe_gen", master="local[8]")
    ne = (1 << SCALE) * 8
    rmat(SCALE, ne, seed=42, include_edge_weights=True, minimum_weight=0.1,
         maximum_weight=1.0, spark=spark).write.mode("overwrite").parquet(edges_path)
    spark.stop()
    time.sleep(2)

    # ---- phase A: baseline on local-cluster, knob set, no kill ----
    ckdir_a = os.path.join(work, "ck_a")
    os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = ckdir_a
    os.environ["SPARK_GRAFT_RELIABLE_EVERY"] = "1"
    spark = new_session("kill_probe_baseline")
    t0 = time.time()
    baseline = run_op(spark, edges_path)
    results["baseline_wall_s"] = round(time.time() - t0, 1)
    results["baseline_ckpts"] = count_ckpts(ckdir_a)
    spark.stop()
    time.sleep(2)

    # ---- phase B: recovery — kill one executor mid-loop ----
    ckdir_b = os.path.join(work, "ck_b")
    os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = ckdir_b
    spark = new_session("kill_probe_recovery")
    kill_info = {}

    def killer():
        while count_ckpts(ckdir_b) < KILL_AFTER_CKPTS:
            time.sleep(0.25)
        pids = executor_pids()
        if not pids:
            kill_info["error"] = "no executor pids found"
            return
        victim = sorted(pids)[0]
        os.kill(victim, signal.SIGKILL)
        kill_info["victim_pid"] = victim
        kill_info["pre_kill_pids"] = sorted(pids)
        kill_info["ckpts_at_kill"] = count_ckpts(ckdir_b)
        kill_info["t_kill_rel"] = round(time.time() - t0, 1)

    t0 = time.time()
    th = threading.Thread(target=killer, daemon=True)
    th.start()
    recovered = run_op(spark, edges_path)
    results["recovery_wall_s"] = round(time.time() - t0, 1)
    th.join(timeout=5)
    post_pids = executor_pids()
    kill_info["post_job_pids"] = sorted(post_pids)
    kill_info["replacement_spawned"] = bool(
        post_pids - set(kill_info.get("pre_kill_pids", []))
    )
    results["kill"] = kill_info
    spark.stop()
    time.sleep(2)

    assert "victim_pid" in kill_info, f"killer never fired: {kill_info}"
    assert kill_info["ckpts_at_kill"] < results["baseline_ckpts"], (
        "kill landed after the loop finished — raise MAX_ITER or lower "
        f"KILL_AFTER_CKPTS ({kill_info})"
    )

    # value comparison: checkpointed state is exact; retried reduce tasks
    # may re-fetch shuffle blocks in a different order, so float sums can
    # differ in the last ulps — record both exactness and the max delta
    assert set(recovered) == set(baseline), "vertex sets differ after recovery"
    max_delta = max(abs(recovered[v] - baseline[v]) for v in baseline)
    results["recovered_rows"] = len(recovered)
    results["max_abs_delta_vs_baseline"] = max_delta
    results["bit_identical"] = max_delta == 0.0
    assert max_delta < 1e-9, f"recovered ranks diverged: max delta {max_delta}"

    # ---- phase C: negative control — same kill without the knob ----
    os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
    spark = new_session("kill_probe_control")
    t_kill = kill_info["t_kill_rel"]
    ctrl = {}

    def killer_ctrl():
        time.sleep(t_kill)
        pids = executor_pids()
        if pids:
            victim = sorted(pids)[0]
            os.kill(victim, signal.SIGKILL)
            ctrl["victim_pid"] = victim
            ctrl["t_kill_rel"] = t_kill

    t0 = time.time()
    th = threading.Thread(target=killer_ctrl, daemon=True)
    th.start()
    try:
        control = run_op(spark, edges_path)
        # a lucky run can finish if no lost localCheckpoint block is ever
        # re-read; record it honestly rather than forcing a pass
        cmax = max(abs(control[v] - baseline[v]) for v in baseline)
        ctrl["outcome"] = f"completed (max delta {cmax:.2e})"
    except Exception as e:  # expected: lost local-checkpoint blocks
        full = str(e)
        # surface the root cause, not py4j's wrapper line
        informative = [
            l.strip() for l in full.splitlines()
            if any(k in l for k in ("Checkpoint block", "SparkException",
                                    "failed 4 times", "ExecutorLostFailure"))
        ]
        ctrl["outcome"] = "FAILED (expected)"
        ctrl["error_head"] = (informative[0] if informative else full.splitlines()[0])[:400]
    results["control"] = ctrl
    results["control_wall_s"] = round(time.time() - t0, 1)
    spark.stop()

    suffix = "" if OP == "pagerank" else f"_{OP}"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"kill_recovery_results{suffix}.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
