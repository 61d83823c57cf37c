"""Physical-plan assertions — the scale contract, machine-checked.

Correctness tests prove the operators compute the right answer at test
scale; these prove the *plans* stay viable at 100 TB: filters and column
pruning reach the parquet scan, small vertex state broadcasts instead of
shuffling the edge table, and whole-stage codegen covers the hot path.
A regression here is invisible to value-based tests but catastrophic at
scale.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not glob.glob(f"{SF_DIR}/*.parquet"), reason="driver testdata not present"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@needs_testdata
def test_filter_and_projection_pushed_to_scan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("doc_id") < 100).select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan, plan
    # column pruning: the scan must read only the projected columns
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in rs and "lang" in rs
    assert "text" not in rs, f"text column not pruned from scan: {rs}"


@needs_testdata
def test_graph_build_prunes_unused_columns(spark):
    from cugraph_spark import Graph

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = lineitem.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst")
    # the cached edge list was computed from a scan of exactly 2 columns
    plan = _plan(edges)
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" in rs and "l_suppkey" in rs
    assert "l_quantity" not in rs and "l_comment" not in rs, rs
    g.edgelist.unpersist()


@needs_testdata
def test_iterative_join_broadcasts_vertex_state(spark):
    """One pagerank pass must broadcast the V-sized rank table, never
    shuffle the E-sized edge table (the 100 TB contract)."""
    from cugraph_spark import Graph
    from cugraph_spark.plans import iterloop

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = lineitem.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst")
    ranks = iterloop.materialize(
        g.vertices_internal.select("vertex", F.lit(1.0).alias("_rank"))
    )
    msgs = (
        g.edgelist.join(
            iterloop.hint_state_join(
                ranks.select(F.col("vertex").alias("src"), "_rank"),
                g.number_of_vertices(),
            ),
            "src",
        )
        .groupBy(F.col("dst").alias("vertex"))
        .agg(F.sum("_rank").alias("_in"))
    )
    plan = _plan(msgs)
    assert "BroadcastHashJoin" in plan, plan
    # the edge side must come straight from the cache, not via an exchange
    join_part = plan.split("BroadcastHashJoin")[1]
    assert "InMemoryTableScan" in plan
    g.edgelist.unpersist()


@needs_testdata
def test_sortmerge_state_join_reuses_cached_edge_partitioning(spark, monkeypatch):
    """Above BROADCAST_STATE_MAX_ROWS the per-iteration state join falls
    back to sort-merge — and the cached edge side (hash-partitioned on
    src, sorted within partitions at build) must feed it with NO fresh
    Exchange and NO fresh Sort. Only the V-sized state side may shuffle.
    This is the scale-23 regime the round-3 A/B landed (pagerank 199s ->
    138s, sssp 114s -> 49s); a re-exchange of the edge table per
    iteration silently doubles the dominant cost."""
    from cugraph_spark import Graph
    from cugraph_spark.plans import iterloop
    from cugraph_spark.structure import graph as graph_mod

    monkeypatch.setattr(iterloop, "BROADCAST_STATE_MAX_ROWS", 0)
    # at test SF the partition right-sizing packs the cache into ONE
    # partition (SinglePartition can't satisfy a hash requirement, both
    # sides would exchange); shrink the byte target so the cache gets a
    # genuine hashpartitioning(src, N>1) like any at-scale build
    monkeypatch.setattr(graph_mod, "_EDGE_PARTITION_TARGET_BYTES", 64 * 1024)
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = lineitem.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst")
    ranks = iterloop.materialize(
        g.vertices_internal.select("vertex", F.lit(1.0).alias("_rank"))
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_abj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # at test SF the cached edge table is tiny and Spark would broadcast
    # IT; at scale it never would — disable auto-broadcast to reproduce
    # the at-scale join shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        msgs = (
            g.edgelist.join(
                iterloop.hint_state_join(
                    ranks.select(F.col("vertex").alias("src"), "_rank"),
                    g.number_of_vertices(),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("_rank").alias("_in"))
        )
        plan = _plan(msgs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_abj)
    assert "SortMergeJoin" in plan, plan
    # The edge child (printed first under the join) must be exchange-free
    # AND sort-free down to its InMemoryTableScan: the cached
    # hashpartitioning(src, N) + sortWithinPartitions(src, dst) satisfy
    # the join requirement directly. The state side (printed after the
    # full edge subtree) legitimately exchanges.
    edge_child = plan.split("SortMergeJoin", 1)[1].split("InMemoryTableScan", 1)[0]
    assert "Exchange" not in edge_child, plan
    assert "Sort " not in edge_child, plan
    g.edgelist.unpersist()


@needs_testdata
def test_sym_aligned_agg_removes_iteration_exchange(spark, monkeypatch):
    """r6 aligned-aggregation flip: on a symmetrized graph in the
    broadcast regime the loop joins the V-sized state on DST and keys
    the message aggregation on SRC, so the aggregate runs inside the
    cached edge partitioning — the per-iteration plan above the cache
    scan must contain NO Exchange (the only exchange left is the
    broadcast of the state itself). Also proves the flipped orientation
    computes the same result as the base one for all four headline
    loops (same addend multisets per vertex on a symmetric edge list)."""
    from cugraph_spark import (
        Graph, pagerank, bfs, sssp, weakly_connected_components,
    )
    from cugraph_spark.components.mis import maximal_independent_set
    from cugraph_spark.plans import iterloop

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = lineitem.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").alias("w"),
    )
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst", weight="w")
    n = g.number_of_vertices()
    assert iterloop.sym_aligned_agg(g, n)

    # plan shape: flipped loop body is exchange-free above the cache scan
    ranks = iterloop.materialize(
        g.vertices_internal.select("vertex", F.lit(1.0).alias("_rank"))
    )
    body = (
        g.edgelist.join(
            iterloop.hint_state_join(
                ranks.select(F.col("vertex").alias("dst"), "_rank"), n
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sum("_rank").alias("_in"))
    )
    plan = _plan(body)
    head = plan.split("InMemoryRelation")[0]
    assert "BroadcastHashJoin" in head, plan
    assert "Exchange" not in head.replace("BroadcastExchange", ""), plan

    # equivalence: base orientation vs flip, all four loops
    def run_all():
        pr = {
            r[0]: r[1]
            for r in pagerank(
                g, max_iter=8, tol=0.0, fail_on_nonconvergence=False
            ).collect()
        }
        bf = {r[0]: (r[1], r[2]) for r in bfs(g, 1).collect()}
        wc = {r[0]: r[1] for r in weakly_connected_components(g).collect()}
        ss = {r[0]: (r[1], r[2]) for r in sssp(g, 1).collect()}
        mi = {r[0] for r in maximal_independent_set(g).collect()}
        return pr, bf, wc, ss, mi

    monkeypatch.setenv("SPARK_GRAFT_SYM_AGG", "0")
    base_pr, base_bf, base_wc, base_ss, base_mi = run_all()
    monkeypatch.setenv("SPARK_GRAFT_SYM_AGG", "1")
    flip_pr, flip_bf, flip_wc, flip_ss, flip_mi = run_all()
    # bfs/wcc are integer-valued and tie-broken by min: exactly equal
    assert base_bf == flip_bf
    assert base_wc == flip_wc
    # mis compares integer xxhash64 priorities over the same neighbor
    # sets: the flipped aggregation orientation (r6 sweep) is exact
    assert base_mi == flip_mi
    # sssp minimizes over identical (distance, predecessor) candidate
    # structs: exactly equal
    assert base_ss == flip_ss
    # pagerank sums the same addends in a different order: ulp tolerance
    assert base_pr.keys() == flip_pr.keys()
    assert all(abs(base_pr[k] - flip_pr[k]) < 1e-12 for k in base_pr)
    g.edgelist.unpersist()


@needs_testdata
def test_hot_path_stays_in_wholestage_codegen(spark):
    """Degree counting (the canonical edge aggregation) must run inside
    whole-stage codegen — no row-at-a-time Python in the hot path."""
    from cugraph_spark import Graph

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = lineitem.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst")
    deg = g.degrees()
    deg.collect()  # AQE finalizes the plan only on execution
    plan = _plan(deg)
    # codegen'd operators render as "*(n) Op" in the finalized AQE plan
    assert "WholeStageCodegen" in plan or "*(" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    g.edgelist.unpersist()


@needs_testdata
def test_text_pipeline_stays_shuffle_free(spark):
    """repetition_scores / redact_pii / stratified_sample are pure map
    work: NO Exchange may appear — at 100 TB these run as a single scan."""
    from cugraph_spark.pipelines.mixing import stratified_sample
    from cugraph_spark.pipelines.text import redact_pii, repetition_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text", "lang")
    for q in (
        repetition_scores(docs),
        redact_pii(docs),
        stratified_sample(docs, "lang", {"en": 0.5}, default_fraction=0.1),
    ):
        plan = _plan(q)
        assert "Exchange" not in plan, plan


@needs_testdata
def test_swept_loop_bodies_stay_sortmerge_free(spark):
    """r6 hint-sweep pins (r6 verdict #9): the V-bounded join sides the
    r6 sweep broadcast-hinted (core_number's h-index state update,
    louvain/leiden's contraction) must keep planning as
    BroadcastHashJoin inside the small-plan regime — losing a hint in a
    refactor silently re-introduces a per-round SortMergeJoin that
    shuffles+sorts stats-less checkpoint leaves every iteration."""
    from cugraph_spark import Graph
    from cugraph_spark.plans import iterloop

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    e = lineitem.select(F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
    g = Graph(directed=False)
    g.from_edgelist(e, "src", "dst")
    n = g.number_of_vertices()
    edges = g.edgelist.select("src", "dst")
    state = iterloop.materialize(
        g.vertices_internal.select("vertex", F.col("vertex").cast("int").alias("c"))
    )
    with iterloop.small_plan(spark, n):
        # core_number round: message agg + V ⨝ V h-index state update
        nbr = (
            edges.join(
                iterloop.hint_state_join(
                    state.select(F.col("vertex").alias("dst"), F.col("c").alias("_nc")), n
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.max("_nc").alias("_h"))
        )
        upd = state.join(iterloop.hint_state_join(nbr, n), "vertex", "left")
        # louvain/leiden contraction: edges ⨝ assign(src) ⨝ assign(dst)
        assign_s = state.select(F.col("vertex").alias("src"), F.col("c").alias("_cs"))
        assign_d = state.select(F.col("vertex").alias("dst"), F.col("c").alias("_cd"))
        contracted = (
            edges.join(iterloop.hint_state_join(assign_s, n), "src")
            .join(iterloop.hint_state_join(assign_d, n), "dst")
            .groupBy(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
            .agg(F.count(F.lit(1)).alias("_w"))
        )
        for name, df in (("core_number_update", upd), ("contraction", contracted)):
            plan = _plan(df)
            assert "SortMergeJoin" not in plan, (name, plan)
            assert "BroadcastHashJoin" in plan, (name, plan)
    g.edgelist.unpersist()


@needs_testdata
def test_path_retrieval_pred_cache_feeds_join_exchange_free(spark):
    """r6 path_retrieval pin: the loop-invariant predecessor table is
    repartitioned+sorted on the join key ONCE and persisted — each hop's
    join must read it from the cache with no fresh Exchange (only the
    tiny destinations-state side may shuffle)."""
    from cugraph_spark import Graph
    from cugraph_spark.plans import iterloop

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    e = lineitem.select(F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
    g = Graph(directed=False)
    g.from_edgelist(e, "src", "dst")
    bfs_like = iterloop.materialize(
        g.vertices_internal.select(
            "vertex", F.lit(0).alias("distance"), F.lit(-1).alias("predecessor")
        )
    )
    preds = iterloop.persist(
        bfs_like.select(F.col("vertex").alias("_cur"), "predecessor")
        .repartition("_cur")
        .sortWithinPartitions("_cur")
    )
    preds.count()
    state = iterloop.materialize(
        g.vertices_internal.limit(3).select(
            F.col("vertex").alias("destination"),
            F.array("vertex").alias("path"),
            F.col("vertex").alias("_cur"),
            F.lit(False).alias("_done"),
        )
    )
    prev_abj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    # at test SF the planner would broadcast the tiny preds cache; at
    # scale it is V-sized and never broadcast — reproduce the at-scale
    # sort-merge shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        step = state.join(preds, "_cur", "left")
        plan = _plan(step)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_abj)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    assert "SortMergeJoin" in plan, plan
    # exactly one Exchange in the EXECUTION section: the state side's.
    # The preds side satisfies distribution AND order straight from the
    # cache (everything after "InMemoryRelation" is the one-time cache
    # BUILD plan, not per-hop work).
    head = plan.split("InMemoryRelation")[0]
    assert head.count("Exchange") == 1, plan
    assert "InMemoryTableScan" in plan, plan
    g.edgelist.unpersist()
    preds.unpersist()


@needs_testdata
def test_ivf_assignment_stays_projection_shaped(spark):
    """r7 IVF pin: the corpus->list assignment must stay a single
    shuffle-free projection (vectorized Arrow argmax) and the probe
    join must broadcast the tiny probe table — a refactor back to the
    crossJoin+groupBy assignment or a shuffled list_id join (n_lists
    distinct values = guaranteed skew) re-creates the 4x-slower-than-
    brute-force plan this round removed."""
    from pyspark.sql import functions as F

    from cugraph_spark.pipelines.similarity_search import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=3, n_lists=4, n_probe=2, kmeans_iters=1)
    plan = _plan(out)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the assignment is an Arrow-batch projection, not a join+aggregate
    assert "ArrowEvalPython" in plan, plan
    # no exchange may touch the corpus: the only hash exchanges left are
    # query_id-keyed (the |Q| x n_lists probe window and the final top-k
    # window). A list_id- or vec_id-keyed exchange means the corpus is
    # being shuffled again.
    hash_exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert hash_exchanges and all("query_id" in ln for ln in hash_exchanges), plan


@needs_testdata
def test_read_edgelist_prunes_columns(spark):
    from cugraph_spark.sources import read_edgelist

    path = f"{SF_DIR}/lineitem.parquet"
    df = read_edgelist(
        spark, path, fmt="parquet", source="l_orderkey",
        destination="l_partkey", weight="l_quantity",
    )
    plan = _plan(df)
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_partkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs, f"unused columns not pruned: {rs}"
