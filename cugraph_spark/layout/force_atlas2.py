"""ForceAtlas2 graph layout.

Reference: layout/force_atlas2.py:51 (API: ``force_atlas2(input_graph,
max_iter=500, pos_list=None, outbound_attraction_distribution=True,
lin_log_mode=False, edge_weight_influence=1.0, jitter_tolerance=1.0,
barnes_hut_optimize=True, barnes_hut_theta=0.5, scaling_ratio=2.0,
strong_gravity_mode=False, gravity=1.0, vertex_mass=None, ...)`` →
``(vertex, x, y)``); C++ legacy ``layout/legacy/barnes_hut.cuh`` /
``exact_fa2.cuh``.

Spark mapping (SURVEY §2.H): one IterLoop step =

- **attraction** along edges: join the edge list with both endpoint
  positions, per-vertex vector sum (``groupBy(src)``) — identical shape to
  every other message-aggregation in the engine;
- **repulsion** via a grid-cell approximation of Barnes-Hut: vertices are
  bucketed into square cells of the current bounding box (cell count ~
  ``1/theta²``); cell centroids+masses form a tiny DataFrame that is
  **broadcast** against all vertices (far-field term), while the exact
  pairwise term is computed only *within* each cell via a self-join on the
  cell key (near-field term, bounded by the cell occupancy). theta keeps
  its reference meaning — speed (1) vs accuracy (0) — by scaling the grid
  resolution;
- **gravity** and FA2's adaptive global speed (swing/traction scalar
  aggregates, Jacomy et al. 2014 eqns 16-18) close the step; both are one
  ``collect_scalars`` on the positions DataFrame.

Determinism: initial positions default to a hash of the vertex id on a
unit disk, so layouts are reproducible without a seed (``random_state``
only matters when ``pos_list`` is None; it perturbs the hash).

Scale: every step shuffles only the V-sized position table (edges stay
partitioned by ``src``); the far-field join is a broadcast; the
near-field self-join is quadratic only in per-cell occupancy, which the
grid keeps bounded as the layout spreads.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph

_EPS = 1e-9


def _pair_repulsion(nd2, prevent_overlapping, scaling_ratio, overlap_scaling_ratio):
    """Per-pair repulsion factor (force = factor * (dx, dy)).

    Standard FA2: k*m1*m2/d^2. With prevent_overlapping (reference
    exact_repulsion.cuh:33-44): while borders overlap (d <= r1+r2) the
    force is overlap_scaling_ratio*m1*m2/d — constant-magnitude push
    apart — else k*m1*m2/(d*d') with border distance d' = d - r1 - r2.
    Expects columns _mass/_m2 and (when overlap-aware) _rad/_r2."""
    m = F.col("_mass") * F.col("_m2")
    if not prevent_overlapping:
        return F.lit(scaling_ratio) * m / nd2
    dist = F.sqrt(nd2)
    rsum = F.col("_rad") + F.col("_r2")
    return F.when(dist <= rsum, F.lit(overlap_scaling_ratio) * m / dist).otherwise(
        F.lit(scaling_ratio) * m / (dist * (dist - rsum + F.lit(_EPS)))
    )


def force_atlas2(
    input_graph: Graph,
    max_iter: int = 500,
    pos_list: Optional[DataFrame] = None,
    *,
    outbound_attraction_distribution: bool = True,
    lin_log_mode: bool = False,
    prevent_overlapping: bool = False,
    vertex_radius: Optional[DataFrame] = None,
    overlap_scaling_ratio: float = 100.0,
    edge_weight_influence: float = 1.0,
    jitter_tolerance: float = 1.0,
    barnes_hut_optimize: bool = True,
    barnes_hut_theta: float = 0.5,
    scaling_ratio: float = 2.0,
    strong_gravity_mode: bool = False,
    gravity: float = 1.0,
    vertex_mobility: Optional[DataFrame] = None,
    vertex_mass: Optional[DataFrame] = None,
    verbose: bool = False,
    callback=None,
    random_state: Optional[int] = None,
) -> DataFrame:
    """Continuous force-directed layout; returns ``(vertex, x, y)``.

    ``prevent_overlapping`` uses border distance ``d' = d - r_u - r_v``
    (``vertex_radius``: DataFrame (vertex, radius), required): attraction
    is zeroed and repulsion switches to ``overlap_scaling_ratio*m_u*m_v/d``
    while nodes overlap, else both use ``d'`` in place of ``d`` — the
    reference's exact_repulsion.cuh:33-44 / fa2_kernels.cuh:47-65 rules.
    Under ``barnes_hut_optimize`` the overlap terms apply to the exact
    near-field (same-cell) pairs; far-field cell centroids keep the
    standard kernel (far cells cannot overlap).
    """
    if callback is not None:
        # reference parity: callback support was removed upstream
        # (layout/force_atlas2.py:186-192 raises RuntimeError)
        raise RuntimeError(
            "Support for the callback argument was removed in the reference "
            "(version 25.10); it is likewise not supported here"
        )
    if prevent_overlapping and vertex_radius is None:
        raise ValueError(
            "vertex_radius must be provided when prevent_overlapping is enabled"
        )

    G = input_graph
    w = (
        F.pow(F.col(WEIGHT), F.lit(edge_weight_influence))
        if G.is_weighted() and edge_weight_influence != 0
        else F.lit(1.0)
    )
    edges = G.edgelist.select(SRC, DST, w.alias("_w"))
    if G.is_directed():
        # forces are symmetric: symmetrize a directed edge list on the fly
        edges = edges.union(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "_w")
        )
    edges = iterloop.persist(edges)

    # mass = 1 + degree (FA2 standard), user-overridable
    deg = edges.groupBy(F.col(SRC).alias("vertex")).agg(
        F.sum("_w").alias("_wdeg"), F.count("*").alias("_deg")
    )
    verts = G.vertices_internal.select("vertex").join(deg, "vertex", "left").select(
        "vertex",
        F.coalesce(F.col("_deg"), F.lit(0)).cast("double").alias("_deg"),
        (F.lit(1.0) + F.coalesce(F.col("_deg"), F.lit(0))).alias("_mass"),
    )
    if vertex_mass is not None:
        vm = G.renumber_vertices(vertex_mass, "vertex").select(
            "vertex", F.col("mass").cast("double").alias("_umass")
        )
        verts = verts.join(vm, "vertex", "left").select(
            "vertex", "_deg", F.coalesce("_umass", F.col("_mass")).alias("_mass")
        )
    if prevent_overlapping:
        vr = G.renumber_vertices(vertex_radius, "vertex").select(
            "vertex", F.col("radius").cast("double").alias("_rad")
        )
        verts = verts.join(vr, "vertex", "left").withColumn(
            "_rad", F.coalesce("_rad", F.lit(0.0))
        )
    mob = None
    if vertex_mobility is not None:
        mob = G.renumber_vertices(vertex_mobility, "vertex").select(
            "vertex", F.col("mobility").cast("double").alias("_mob")
        )

    # deterministic init on the unit disk from a vertex-id hash
    if pos_list is not None:
        p = G.renumber_vertices(pos_list, "vertex").select(
            "vertex", F.col("x").cast("double"), F.col("y").cast("double")
        )
        pos = verts.join(p, "vertex", "left")
    else:
        seed = int(random_state or 0)
        h = F.abs(F.xxhash64(F.col("vertex"), F.lit(seed)))
        ang = (h % 1000000) / 1000000.0 * 2 * math.pi
        rad = ((h / 1000000) % 1000000) / 1000000.0
        pos = verts.withColumn("x", F.sqrt(rad) * F.cos(ang)).withColumn(
            "y", F.sqrt(rad) * F.sin(ang)
        )
    if mob is not None:
        pos = pos.join(mob, "vertex", "left").withColumn(
            "_mob", F.coalesce("_mob", F.lit(1.0))
        )
    else:
        pos = pos.withColumn("_mob", F.lit(1.0))
    state_cols = ["vertex", "_deg", "_mass", "_mob"] + (
        ["_rad"] if prevent_overlapping else []
    )
    pos = pos.select(*state_cols, "x", "y").withColumn(
        "_pdx", F.lit(0.0)
    ).withColumn("_pdy", F.lit(0.0))
    # NOT fused (r6, deliberate): fa2_invariants pins BIT-identical
    # output across two same-session runs, and the adaptive speed scalars
    # (g_swing/g_tract) feed the coordinates. Fusing the swap with the
    # scalar agg made that agg a deep multi-stage job whose float partial
    # sums merge in task-arrival order — a last-ulp difference in g_swing
    # amplifies through `speed` into visibly different layouts (caught by
    # the r6 contract run). The eager materialize keeps the scalar agg a
    # tiny fixed-shape job over stored blocks, which is the configuration
    # measured deterministic across rounds 2-6.
    pos = iterloop.materialize(pos)
    (n_v, sum_mass) = iterloop.collect_scalars(pos, [F.count("*"), F.sum("_mass")])
    if not n_v:
        return G.unrenumber(pos.select("vertex", "x", "y"), "vertex")

    # grid resolution: ~1/theta cells per axis (theta=0.5 → 2x2 ... capped)
    cells_per_axis = max(2, min(16, int(round(1.0 / max(barnes_hut_theta, 0.0625)))))
    speed, speed_efficiency = 1.0, 1.0

    for it in range(max_iter):
        ps = pos.select(
            F.col("vertex").alias(SRC), F.col("x").alias("_xs"),
            F.col("y").alias("_ys"), F.col("_mass").alias("_ms"),
            F.col("_deg").alias("_ds"),
            *([F.col("_rad").alias("_rs")] if prevent_overlapping else []),
        )
        pd_ = pos.select(
            F.col("vertex").alias(DST), F.col("x").alias("_xd"),
            F.col("y").alias("_yd"), F.col("_mass").alias("_md"),
            *([F.col("_rad").alias("_rd")] if prevent_overlapping else []),
        )
        e = edges.join(ps, SRC).join(pd_, DST)
        dx, dy = F.col("_xd") - F.col("_xs"), F.col("_yd") - F.col("_ys")
        dist = F.sqrt(dx * dx + dy * dy) + F.lit(_EPS)
        # attraction: lin-lin F = w*d (force per unit vector: w), lin-log
        # F = w*log(1+d); outbound distribution divides by src mass
        if prevent_overlapping:
            # fa2_kernels.cuh:47-65: border distance d' = d - r_src - r_dst
            # replaces d; overlapping pairs attract with force 0
            d_inter = dist - F.col("_rs") - F.col("_rd")
            fa = F.when(d_inter <= 0, F.lit(0.0)).otherwise(
                F.col("_w")
                * ((F.log1p(d_inter) if lin_log_mode else d_inter) / dist)
            )
        else:
            fa = F.col("_w") * (F.log1p(dist) / dist if lin_log_mode else F.lit(1.0))
        if outbound_attraction_distribution:
            fa = fa / F.col("_ms")
        attr = e.select(
            SRC, (fa * dx).alias("_fx"), (fa * dy).alias("_fy")
        ).groupBy(SRC).agg(
            F.sum("_fx").alias("_ax"), F.sum("_fy").alias("_ay")
        ).withColumnRenamed(SRC, "vertex")

        # bounding box → square grid cells
        xmin, xmax, ymin, ymax = iterloop.collect_scalars(
            pos, [F.min("x"), F.max("x"), F.min("y"), F.max("y")]
        )
        span = max(xmax - xmin, ymax - ymin, _EPS)
        cell = span / cells_per_axis
        with_cell = pos.select(
            "vertex", "x", "y", "_mass",
            *(["_rad"] if prevent_overlapping else []),
            F.least(
                F.floor((F.col("x") - F.lit(xmin)) / F.lit(cell)),
                F.lit(cells_per_axis - 1),
            ).cast("int").alias("_cx"),
            F.least(
                F.floor((F.col("y") - F.lit(ymin)) / F.lit(cell)),
                F.lit(cells_per_axis - 1),
            ).cast("int").alias("_cy"),
        )
        centroids = with_cell.groupBy("_cx", "_cy").agg(
            F.sum("_mass").alias("_cm"),
            (F.sum(F.col("x") * F.col("_mass")) / F.sum("_mass")).alias("_gx"),
            (F.sum(F.col("y") * F.col("_mass")) / F.sum("_mass")).alias("_gy"),
        )
        if barnes_hut_optimize:
            # far field: every vertex vs every cell centroid except its own
            far = (
                with_cell.crossJoin(
                    F.broadcast(
                        centroids.select(
                            F.col("_cx").alias("_ox"), F.col("_cy").alias("_oy"),
                            "_cm", "_gx", "_gy",
                        )
                    )
                )
                .filter((F.col("_cx") != F.col("_ox")) | (F.col("_cy") != F.col("_oy")))
            )
            fdx, fdy = F.col("x") - F.col("_gx"), F.col("y") - F.col("_gy")
            fd2 = fdx * fdx + fdy * fdy + F.lit(_EPS)
            fr = F.lit(scaling_ratio) * F.col("_mass") * F.col("_cm") / fd2
            far_rep = far.select(
                "vertex", (fr * fdx).alias("_fx"), (fr * fdy).alias("_fy")
            )
            # near field: exact pairs within the same cell
            a = with_cell.select(
                "_cx", "_cy", "vertex", "x", "y", "_mass",
                *(["_rad"] if prevent_overlapping else []),
            )
            b = with_cell.select(
                F.col("_cx").alias("_bx"), F.col("_cy").alias("_by"),
                F.col("vertex").alias("_v2"), F.col("x").alias("_x2"),
                F.col("y").alias("_y2"), F.col("_mass").alias("_m2"),
                *([F.col("_rad").alias("_r2")] if prevent_overlapping else []),
            )
            near = a.join(
                b,
                (F.col("_cx") == F.col("_bx"))
                & (F.col("_cy") == F.col("_by"))
                & (F.col("vertex") != F.col("_v2")),
            )
            ndx, ndy = F.col("x") - F.col("_x2"), F.col("y") - F.col("_y2")
            nd2 = ndx * ndx + ndy * ndy + F.lit(_EPS)
            nr = _pair_repulsion(
                nd2, prevent_overlapping, scaling_ratio, overlap_scaling_ratio
            )
            near_rep = near.select(
                "vertex", (nr * ndx).alias("_fx"), (nr * ndy).alias("_fy")
            )
            rep = far_rep.unionAll(near_rep)
        else:
            # exact: all-pairs (V² — small graphs only, reference parity)
            a = with_cell.select(
                "vertex", "x", "y", "_mass",
                *(["_rad"] if prevent_overlapping else []),
            )
            b = with_cell.select(
                F.col("vertex").alias("_v2"), F.col("x").alias("_x2"),
                F.col("y").alias("_y2"), F.col("_mass").alias("_m2"),
                *([F.col("_rad").alias("_r2")] if prevent_overlapping else []),
            )
            pr = a.crossJoin(b).filter(F.col("vertex") != F.col("_v2"))
            ndx, ndy = F.col("x") - F.col("_x2"), F.col("y") - F.col("_y2")
            nd2 = ndx * ndx + ndy * ndy + F.lit(_EPS)
            nr = _pair_repulsion(
                nd2, prevent_overlapping, scaling_ratio, overlap_scaling_ratio
            )
            rep = pr.select("vertex", (nr * ndx).alias("_fx"), (nr * ndy).alias("_fy"))
        rep = rep.groupBy("vertex").agg(
            F.sum("_fx").alias("_rx"), F.sum("_fy").alias("_ry")
        )

        # gravity toward origin
        gdist = F.sqrt(F.col("x") * F.col("x") + F.col("y") * F.col("y")) + F.lit(_EPS)
        gf = (
            F.lit(gravity) * F.col("_mass")
            if strong_gravity_mode
            else F.lit(gravity) * F.col("_mass") / gdist
        )
        stepped = (
            pos.join(attr, "vertex", "left")
            .join(rep, "vertex", "left")
            .select(
                *state_cols, "x", "y", "_pdx", "_pdy",
                (
                    F.coalesce("_ax", F.lit(0.0))
                    + F.coalesce("_rx", F.lit(0.0))
                    - gf * F.col("x")
                ).alias("_dx"),
                (
                    F.coalesce("_ay", F.lit(0.0))
                    + F.coalesce("_ry", F.lit(0.0))
                    - gf * F.col("y")
                ).alias("_dy"),
            )
        )
        stepped = iterloop.materialize(stepped)

        # adaptive speed (Jacomy et al. 2014): swing vs traction —
        # kept as a separate tiny agg over the materialized blocks for
        # the bit-determinism reason documented above
        swing_c = F.sqrt(
            (F.col("_dx") - F.col("_pdx")) ** 2 + (F.col("_dy") - F.col("_pdy")) ** 2
        )
        tract_c = F.lit(0.5) * F.sqrt(
            (F.col("_dx") + F.col("_pdx")) ** 2 + (F.col("_dy") + F.col("_pdy")) ** 2
        )
        g_swing, g_tract = iterloop.collect_scalars(
            stepped,
            [F.sum(F.col("_mass") * swing_c), F.sum(F.col("_mass") * tract_c)],
        )
        g_swing = (g_swing or 0.0) + _EPS
        g_tract = (g_tract or 0.0) + _EPS
        est_jitter = 0.05 * math.sqrt(n_v)
        min_jt = math.sqrt(est_jitter)
        max_jt = 10.0
        jt = jitter_tolerance * max(
            min_jt, min(max_jt, est_jitter * g_tract / (n_v * n_v * 1.0))
        )
        if g_swing / g_tract > 2.0:
            speed_efficiency = max(0.05, speed_efficiency * 0.5)
            jt = max(jt, jitter_tolerance)
        target_speed = jt * speed_efficiency * g_tract / g_swing
        if g_swing > jt * g_tract:
            speed_efficiency = max(0.05, speed_efficiency * 0.7)
        elif speed < 1000:
            speed_efficiency = min(3.0, speed_efficiency * 1.3)
        speed = speed + min(target_speed - speed, 0.5 * speed)

        swing_v = swing_c + F.lit(_EPS)
        factor = F.lit(speed) / (F.lit(1.0) + F.sqrt(F.lit(speed) * swing_v))
        pos = stepped.select(
            *state_cols,
            (F.col("x") + F.col("_mob") * factor * F.col("_dx")).alias("x"),
            (F.col("y") + F.col("_mob") * factor * F.col("_dy")).alias("y"),
            F.col("_dx").alias("_pdx"),
            F.col("_dy").alias("_pdy"),
        )
        pos = iterloop.materialize(pos)
        if verbose:
            print(f"force_atlas2 iter {it}: speed={speed:.4f} swing={g_swing:.4f}")

    edges.unpersist()
    out = pos.select("vertex", "x", "y")
    return G.unrenumber(out, "vertex")
