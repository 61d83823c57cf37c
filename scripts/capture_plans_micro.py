"""Capture .explain("formatted") for the per-round loop bodies of the
micro-loop operators touched in r6's hint sweep (mis, vertex_coloring,
core_number) into plans/r06/<op>_round_body_<tag>.txt.

Mirrors scripts/capture_plans.py: the operators' returned DataFrames are
checkpointed leaves, so the meaningful plan is ONE loop-round body built
exactly as the implementation builds it (round 1, before any swap).

Usage: python scripts/capture_plans_micro.py <tag>   # tag = before | after
Env: SPARK_GRAFT_SF_DIR (default sf0.01 — the driver's correctness scale,
where these fixture-bound queries run).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def save(name: str, tag: str, *sections: tuple[str, str]) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        for title, body in sections:
            f.write(f"=== {title} ===\n{body}\n")
    print(f"wrote {path}", flush=True)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from cugraph_spark.session import get_spark
    from cugraph_spark.constants import SRC, DST
    from cugraph_spark.plans import iterloop
    import queries_registry as reg

    spark = get_spark("capture_plans_micro", shuffle_partitions=8)
    G = reg.copurchase_sparse_graph(spark, SF_DIR)
    n_v = G.number_of_vertices()
    # tag=before reproduces the pre-sweep shape: the sites the sweep
    # hinted are left bare and the MIS aggregations keep the SRC->DST
    # orientation. tag=after mirrors HEAD.
    after = tag != "before"
    sym = iterloop.sym_aligned_agg(G, n_v) if after else False
    swept = (
        (lambda df: iterloop.hint_state_join(df, n_v))
        if after
        else (lambda df: df)
    )

    with iterloop.small_plan(spark, n_v):
        # ---- MIS round-1 body (components/mis.py) -------------------
        edges = G.edgelist.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
        active = iterloop.materialize(G.vertices_internal.select("vertex"))
        m_pri, m_agg = (DST, SRC) if sym else (SRC, DST)
        pri = active.select("vertex", F.xxhash64("vertex", F.lit(42)).alias("_p"))
        nbr_min = (
            edges.join(
                iterloop.hint_state_join(
                    pri.select(F.col("vertex").alias(m_pri), "_p"), n_v
                ),
                m_pri,
            )
            .join(
                iterloop.hint_state_join(
                    active.withColumnRenamed("vertex", m_agg), n_v
                ),
                m_agg,
                "left_semi",
            )
            .groupBy(F.col(m_agg).alias("vertex"))
            .agg(F.min("_p").alias("_np"))
        )
        winners = (
            pri.join(swept(nbr_min), "vertex", "left")
            .filter(F.col("_np").isNull() | (F.col("_p") < F.col("_np")))
            .select("vertex")
        )
        nbrs = (
            edges.join(
                swept(winners.withColumnRenamed("vertex", m_pri)),
                m_pri,
                "left_semi",
            )
            .select(F.col(m_agg).alias("vertex"))
            .distinct()
        )
        new_active = active.join(
            swept(winners), "vertex", "left_anti"
        ).join(swept(nbrs), "vertex", "left_anti")
        save(
            "mis_round_body",
            tag,
            (f"mis round-1 active update (sym_aligned={sym})", explain_str(new_active)),
        )

        # ---- core_number round-1 body (cores/core_number.py) --------
        deg = edges.groupBy(F.col(SRC).alias("vertex")).agg(
            F.count("*").cast("int").alias("c")
        )
        state = iterloop.materialize(deg)
        h_expr = F.expr(
            "size(filter(transform(sort_array(collect_list(_nc), false),"
            " (x, i) -> x >= i + 1), b -> b))"
        ).cast("int")
        nbr = (
            edges.join(
                iterloop.hint_state_join(
                    state.select(F.col("vertex").alias(DST), F.col("c").alias("_nc")),
                    n_v,
                ),
                DST,
            )
            .groupBy(F.col(SRC).alias("vertex"))
            .agg(h_expr.alias("_h"))
        )
        new_state = state.join(swept(nbr), "vertex", "left").select(
            "vertex",
            F.least(F.col("c"), F.coalesce("_h", F.lit(0))).alias("c"),
            F.col("c").alias("_old"),
        )
        save(
            "core_number_round_body",
            tag,
            ("core_number h-index round-1 state update", explain_str(new_state)),
        )

        # ---- vertex_coloring round-1 body (components/vertex_coloring.py)
        hint = lambda df: iterloop.hint_state_join(df, n_v)
        uncolored = iterloop.materialize(
            G.vertices_internal.select(
                "vertex", F.xxhash64("vertex", F.lit(42)).alias("_p")
            )
        )
        u_src = uncolored.select(F.col("vertex").alias(SRC), F.col("_p").alias("_ps"))
        u_dst = uncolored.select(F.col("vertex").alias(DST), F.col("_p").alias("_pd"))
        rank = (
            edges.join(hint(u_src), SRC)
            .join(hint(u_dst), DST)
            .filter(
                (F.col("_ps") > F.col("_pd"))
                | ((F.col("_ps") == F.col("_pd")) & (F.col(SRC) > F.col(DST)))
            )
            .groupBy(F.col(DST).alias("vertex"))
            .agg(F.count("*").alias("_rank"))
        )
        cand = uncolored.join(swept(rank), "vertex", "left").withColumn(
            "_rank", F.coalesce("_rank", F.lit(0))
        )
        cand = cand.withColumn("_used", F.expr("array()")).select(
            "vertex",
            "_p",
            F.expr(
                "filter(sequence(0, size(_used) + _rank),"
                " x -> NOT array_contains(_used, x))[_rank]"
            )
            .cast("int")
            .alias("color"),
        )
        c_src = cand.select(
            F.col("vertex").alias(SRC), F.col("_p").alias("_ps"),
            F.col("color").alias("_cs"),
        )
        c_dst = cand.select(
            F.col("vertex").alias(DST), F.col("_p").alias("_pd"),
            F.col("color").alias("_cd"),
        )
        losers = (
            edges.join(hint(c_src), SRC)
            .join(hint(c_dst), DST)
            .filter(
                (F.col("_cs") == F.col("_cd"))
                & (
                    (F.col("_ps") > F.col("_pd"))
                    | ((F.col("_ps") == F.col("_pd")) & (F.col(SRC) > F.col(DST)))
                )
            )
            .select(F.col(DST).alias("vertex"))
            .distinct()
        )
        newly = cand.join(swept(losers), "vertex", "left_anti").select("vertex", "color")
        new_uncolored = uncolored.join(
            swept(newly.select("vertex")), "vertex", "left_anti"
        )
        save(
            "vertex_coloring_round_body",
            tag,
            ("coloring round-1 uncolored update", explain_str(new_uncolored)),
        )

    spark.stop()


if __name__ == "__main__":
    main()
