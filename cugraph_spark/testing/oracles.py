"""Programmatically-generated DuckDB oracles for hash-seeded operators.

These oracles replicate the engine's xxhash64-based PRNG bit-for-bit (see
``xxh_sql``), turning operators that would otherwise get rows-only checks
(rmat, random walks, negative sampling) into exact value-matched ones.
"""

from __future__ import annotations

import math

from .xxh_sql import (
    cte_chain,
    fold_steps,
    hash_round_steps,
    pmod_sql,
    to_i64,
    xxhash64_steps,
)


def lsh_topk_oracle_sql(
    dim: int, n_planes: int = 6, k: int = 5, n_queries: int = 10, seed: int = 42
) -> str:
    """Exact oracle for ``lsh_topk(emb, q, k, n_planes)`` over the
    ``embeddings`` view (queries = vec_id < n_queries).

    The hyperplanes are driver-side ``random.Random(seed)`` gaussians —
    tiny and known at oracle-generation time, so they are embedded as SQL
    literals (full repr precision). Bucket signature, single-bit
    multiprobe, in-bucket cosine scoring and (desc cosine, asc vec_id)
    top-k mirror pipelines/similarity_search.py:lsh_topk exactly."""
    from ..pipelines.similarity_search import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    def plane_lit(p):
        return "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"

    sig = " + ".join(
        f"(CASE WHEN list_dot_product(v, {plane_lit(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(f"xor(bucket, {1 << i})" for i in range(n_planes))
    return f"""
WITH lsh_corpus AS MATERIALIZED (
    SELECT vec_id, embedding::DOUBLE[] AS v, {sig} AS bucket FROM embeddings
),
lsh_queries AS MATERIALIZED (
    SELECT vec_id AS query_id, v AS q, bucket FROM lsh_corpus WHERE vec_id < {n_queries}
),
lsh_probes AS MATERIALIZED (
    SELECT query_id, q, unnest([bucket, {probes}]) AS bucket FROM lsh_queries
),
lsh_scored AS MATERIALIZED (
    SELECT DISTINCT p.query_id, c.vec_id,
           list_dot_product(p.q, c.v)
             / (sqrt(list_dot_product(p.q, p.q)) * sqrt(list_dot_product(c.v, c.v))) AS cos
    FROM lsh_probes p JOIN lsh_corpus c ON c.bucket = p.bucket
),
lsh_ranked AS MATERIALIZED (
    SELECT query_id, vec_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
    FROM lsh_scored
)
SELECT query_id, vec_id, ROUND(cos, 5) AS cosine FROM lsh_ranked WHERE rn <= {k}
"""


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _ivf_kmeans_defs(dim: int, n_lists: int, kmeans_iters: int, seed: int) -> list[str]:
    """Shared CTE chain for the DataFrame Lloyd quantizer (ivf_topk /
    semantic_duplicates): xxhash64-picked init, per-vector argmax-cosine
    assignment (list_id tie-break), per-dimension AVG update carrying
    empty lists forward, ending in ``ivf_final`` (vec_id, v, list_id)."""
    steps, h = xxhash64_steps(
        "ivf", [("vec_id", "long"), (str(seed), "int")], seed=42
    )
    hash_defs, hashed = cte_chain("ivf_corpus", steps, "ivfh_")
    cos = _cos_sql
    avg_arr = "[" + ", ".join(f"AVG(v[{j}])" for j in range(1, dim + 1)) + "]"
    defs = [
        "ivf_corpus AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        *hash_defs,
        f"ivf_cent0 AS MATERIALIZED (SELECT list_id, ctr FROM ("
        f"  SELECT ROW_NUMBER() OVER (ORDER BY {to_i64(h)}, vec_id) - 1 AS list_id, v AS ctr"
        f"  FROM {hashed}) WHERE list_id < {n_lists})",
    ]
    for i in range(1, kmeans_iters + 1):
        defs.append(
            f"ivf_asg{i} AS MATERIALIZED (SELECT vec_id, v, list_id FROM ("
            f"  SELECT c.vec_id, c.v, t.list_id,"
            f"    ROW_NUMBER() OVER (PARTITION BY c.vec_id"
            f"      ORDER BY {cos('c.v', 't.ctr')} DESC, t.list_id) AS rn"
            f"  FROM ivf_corpus c CROSS JOIN ivf_cent{i - 1} t) WHERE rn = 1)"
        )
        defs.append(
            f"ivf_cent{i} AS MATERIALIZED (SELECT p.list_id, COALESCE(u.newc, p.ctr) AS ctr"
            f"  FROM ivf_cent{i - 1} p LEFT JOIN ("
            f"    SELECT list_id, {avg_arr} AS newc FROM ivf_asg{i} GROUP BY list_id) u"
            f"  ON u.list_id = p.list_id)"
        )
    last = f"ivf_cent{kmeans_iters}"
    defs.append(
        f"ivf_final AS MATERIALIZED (SELECT vec_id, v, list_id FROM ("
        f"  SELECT c.vec_id, c.v, t.list_id,"
        f"    ROW_NUMBER() OVER (PARTITION BY c.vec_id"
        f"      ORDER BY {cos('c.v', 't.ctr')} DESC, t.list_id) AS rn"
        f"  FROM ivf_corpus c CROSS JOIN {last} t) WHERE rn = 1)"
    )
    return defs


def semantic_dup_oracle_sql(
    dim: int,
    threshold: float,
    n_lists: int = 16,
    kmeans_iters: int = 3,
    seed: int = 42,
) -> str:
    """Exact oracle for ``semantic_duplicates(emb, threshold, n_lists,
    kmeans_iters)``: shared Lloyd CTE chain, then within-cluster pairs
    with ROUND(cos, 6) >= threshold (rounded on both engines so the
    comparison is boundary-stable), duplicate = min lower same-cluster
    id."""
    defs = _ivf_kmeans_defs(dim, n_lists, kmeans_iters, seed)
    defs.append(
        f"sd_dup AS MATERIALIZED (SELECT a.vec_id, MIN(b.vec_id) AS dup_of"
        f"  FROM ivf_final a JOIN ivf_final b"
        f"    ON a.list_id = b.list_id AND b.vec_id < a.vec_id"
        f"  WHERE ROUND({_cos_sql('a.v', 'b.v')}, 6) >= {threshold}"
        f"  GROUP BY a.vec_id)"
    )
    return (
        f"WITH {', '.join(defs)} SELECT c.vec_id,"
        f" (d.dup_of IS NOT NULL) AS is_duplicate, d.dup_of"
        f" FROM ivf_corpus c LEFT JOIN sd_dup d ON d.vec_id = c.vec_id"
    )


def ivf_topk_oracle_sql(
    dim: int,
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 3,
    kmeans_iters: int = 3,
    n_queries: int = 10,
    seed: int = 42,
) -> str:
    """Exact oracle for ``ivf_topk(emb, q, k, n_lists, n_probe,
    kmeans_iters)`` over the ``embeddings`` view (queries = vec_id <
    n_queries).

    Every stochastic choice in ivf_topk is xxhash64-derived (centroid
    init picks the ``n_lists`` vectors minimizing (xxhash64(vec_id,
    seed), vec_id)) and the Lloyd iteration count is fixed, so the whole
    pipeline is a pure function of the corpus: unroll the iterations as
    CTEs (see ``_ivf_kmeans_defs``); probe = top ``n_probe`` lists per
    query; final = (cos desc, vec_id) top-k, mirroring
    pipelines/similarity_search.py:ivf_topk. Centroid means are summed
    in engine-specific order — 5-dp rounding absorbs the ~1e-14 drift
    (an assignment flip would need two centroids cosine-equidistant to
    ~1e-13; measure-zero on real embeddings)."""
    cos = _cos_sql
    last = f"ivf_cent{kmeans_iters}"
    defs = _ivf_kmeans_defs(dim, n_lists, kmeans_iters, seed)
    defs += [
        f"ivf_probe AS MATERIALIZED (SELECT query_id, q, list_id FROM ("
        f"  SELECT c.vec_id AS query_id, c.v AS q, t.list_id,"
        f"    ROW_NUMBER() OVER (PARTITION BY c.vec_id"
        f"      ORDER BY {cos('c.v', 't.ctr')} DESC, t.list_id) AS rn"
        f"  FROM ivf_corpus c CROSS JOIN {last} t WHERE c.vec_id < {n_queries})"
        f"  WHERE rn <= {n_probe})",
        f"ivf_scored AS MATERIALIZED (SELECT p.query_id, a.vec_id,"
        f"  {cos('p.q', 'a.v')} AS cos"
        f"  FROM ivf_probe p JOIN ivf_final a ON a.list_id = p.list_id)",
        "ivf_ranked AS MATERIALIZED (SELECT query_id, vec_id, cos,"
        "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn"
        "  FROM ivf_scored)",
    ]
    return (
        f"WITH {', '.join(defs)} SELECT query_id, vec_id, ROUND(cos, 5) AS cosine"
        f" FROM ivf_ranked WHERE rn <= {k}"
    )


def negative_sampling_oracle_sql(
    fixture_cte: str,
    edges_name: str,
    num_samples: int,
    random_state: int = 42,
) -> str:
    """Exact oracle for ``negative_sampling(G, num_samples,
    exact_number_of_samples=True)`` on an identity-renumbered graph.

    Mirrors sampling/negative_sampling.py round 1: draw
    ``int(1.5*num_samples)+16`` (src, dst) index pairs from
    ``abs(xxhash64(id, seed) % n)``, map indices through the
    vertex-rank table, drop self-loops/duplicates/true edges, and keep
    the ``num_samples`` pairs minimizing (xxhash64(src, dst, seed), src,
    dst). Assumes round 1 yields enough samples — guaranteed at the
    registry's graph/sample sizes (overdraw 1.5x, non-edges dominate)."""
    count = int(num_samples * 1.5) + 16
    s_steps, hs = xxhash64_steps(
        "ns_s", [("id", "long"), (str(random_state), "int")], seed=42
    )
    d_steps, hd = xxhash64_steps(
        "ns_d", [("id", "long"), (str(random_state + 1), "int")], seed=42
    )
    hash_defs, hashed = cte_chain("ns_ids", s_steps + d_steps, "nsh_")
    p_steps, hp = xxhash64_steps(
        "ns_p", [("src", "long"), ("dst", "long"), (str(random_state), "int")], seed=42
    )
    pick_defs, picked = cte_chain("ns_nonedge", p_steps, "nsp_")
    defs = [
        fixture_cte.strip().strip(","),
        f"ns_verts AS MATERIALIZED (SELECT vertex, ROW_NUMBER() OVER (ORDER BY vertex) - 1 AS _i"
        f" FROM (SELECT src AS vertex FROM {edges_name} UNION SELECT dst FROM {edges_name}))",
        "ns_n AS MATERIALIZED (SELECT COUNT(*) AS n FROM ns_verts)",
        f"ns_ids AS MATERIALIZED (SELECT id FROM generate_series(0, {count - 1}) t(id))",
        *hash_defs,
        f"ns_pairs AS MATERIALIZED (SELECT abs({to_i64(hs)} % (SELECT n FROM ns_n)) AS _si,"
        f" abs({to_i64(hd)} % (SELECT n FROM ns_n)) AS _di FROM {hashed})",
        "ns_cand AS MATERIALIZED (SELECT DISTINCT vs.vertex AS src, vd.vertex AS dst"
        " FROM ns_pairs p JOIN ns_verts vs ON vs._i = p._si"
        " JOIN ns_verts vd ON vd._i = p._di WHERE vs.vertex <> vd.vertex)",
        f"ns_nonedge AS MATERIALIZED (SELECT c.src, c.dst FROM ns_cand c"
        f" WHERE NOT EXISTS (SELECT 1 FROM {edges_name} e"
        f" WHERE e.src = c.src AND e.dst = c.dst))",
        *pick_defs,
    ]
    return (
        f"WITH {', '.join(defs)} SELECT src, dst FROM {picked}"
        f" ORDER BY {to_i64(hp)}, src, dst LIMIT {num_samples}"
    )


def neighbor_sample_oracle_sql(
    fixture_cte: str,
    edges_name: str,
    n_starts: int,
    fanouts: list[int],
    starts_where: str = "TRUE",
    random_state: int = 42,
) -> str:
    """Exact oracle for ``homogeneous_neighbor_sample(G, starts, fanouts,
    with_batch_ids=True)`` on an identity-renumbered unweighted graph.

    Mirrors sampling/neighbor_sample.py: starts are the first
    ``n_starts`` vertices (optionally filtered) ordered by id with
    batch_id = that order; per hop each (batch_id, src) keeps the
    ``fanouts[hop]`` neighbors minimizing xxhash64(src, dst, hop, seed,
    batch_id). Output (majors, minors, batch_id, hop_id)."""
    defs = [
        fixture_cte.strip().strip(","),
        f"nbs_starts AS MATERIALIZED (SELECT vertex, (ROW_NUMBER() OVER (ORDER BY vertex) - 1)::INT"
        f" AS batch_id FROM (SELECT DISTINCT src AS vertex FROM {edges_name}"
        f" WHERE {starts_where} ORDER BY vertex LIMIT {n_starts}))",
    ]
    layer_selects = []
    prev = "nbs_starts"
    for hop, fanout in enumerate(fanouts):
        cand = f"nbs_cand{hop}"
        defs.append(
            f"{cand} AS MATERIALIZED (SELECT f.batch_id, e.src, e.dst FROM {prev} f"
            f" JOIN {edges_name} e ON e.src = f.vertex)"
        )
        steps, h = xxhash64_steps(
            f"nb{hop}",
            [("src", "long"), ("dst", "long"), (str(hop), "int"),
             (str(random_state), "int"), ("batch_id", "int")],
            seed=42,
        )
        hash_defs, hashed = cte_chain(cand, steps, f"nbh{hop}_")
        defs += hash_defs
        layer = f"nbs_layer{hop}"
        defs.append(
            f"{layer} AS MATERIALIZED (SELECT batch_id, src AS majors, dst AS minors FROM {hashed}"
            f" QUALIFY ROW_NUMBER() OVER (PARTITION BY batch_id, src"
            f" ORDER BY {to_i64(h)}) <= {fanout})"
        )
        layer_selects.append(
            f"SELECT majors, minors, batch_id, {hop}::INT AS hop_id FROM {layer}"
        )
        nxt = f"nbs_front{hop + 1}"
        defs.append(
            f"{nxt} AS MATERIALIZED (SELECT DISTINCT minors AS vertex, batch_id FROM {layer})"
        )
        prev = nxt
    return f"WITH {', '.join(defs)} {' UNION ALL '.join(layer_selects)}"


def hetero_neighbor_sample_oracle_sql(
    fixture_cte: str,
    edges_name: str,
    n_starts: int,
    fanouts_by_type: dict,
    type_col: str = "etype",
    starts_where: str = "TRUE",
    random_state: int = 42,
) -> str:
    """Exact oracle for ``heterogeneous_neighbor_sample(G, starts,
    fanouts_by_type, with_batch_ids=True)`` on an identity-renumbered
    directed typed graph.

    Mirrors sampling/neighbor_sample.py:208 — one independent
    homogeneous sample per edge type over the type-filtered edge list
    (same start set and batch ids for every type, same per-hop
    xxhash64(src, dst, hop, seed, batch_id) pick), outputs unioned with
    the edge_type column carried through."""
    defs = [
        fixture_cte.strip().strip(","),
        f"hns_starts AS MATERIALIZED (SELECT vertex, (ROW_NUMBER() OVER (ORDER BY vertex) - 1)::INT"
        f" AS batch_id FROM (SELECT DISTINCT src AS vertex FROM {edges_name}"
        f" WHERE {starts_where} ORDER BY vertex LIMIT {n_starts}))",
    ]
    selects = []
    for et in sorted(fanouts_by_type):
        fans = fanouts_by_type[et]
        prev = "hns_starts"
        for hop, fanout in enumerate(fans):
            cand = f"hns_t{et}_cand{hop}"
            defs.append(
                f"{cand} AS MATERIALIZED (SELECT f.batch_id, e.src, e.dst FROM {prev} f"
                f" JOIN {edges_name} e ON e.src = f.vertex AND e.{type_col} = {et})"
            )
            steps, h = xxhash64_steps(
                f"hn{et}_{hop}",
                [("src", "long"), ("dst", "long"), (str(hop), "int"),
                 (str(random_state), "int"), ("batch_id", "int")],
                seed=42,
            )
            hash_defs, hashed = cte_chain(cand, steps, f"hnh{et}_{hop}_")
            defs += hash_defs
            layer = f"hns_t{et}_layer{hop}"
            defs.append(
                f"{layer} AS MATERIALIZED (SELECT batch_id, src AS majors, dst AS minors"
                f" FROM {hashed} QUALIFY ROW_NUMBER() OVER (PARTITION BY batch_id, src"
                f" ORDER BY {to_i64(h)}) <= {fanout})"
            )
            selects.append(
                f"SELECT majors, minors, {et}::INT AS edge_type, batch_id,"
                f" {hop}::INT AS hop_id FROM {layer}"
            )
            nxt = f"hns_t{et}_front{hop + 1}"
            defs.append(
                f"{nxt} AS MATERIALIZED (SELECT DISTINCT minors AS vertex, batch_id FROM {layer})"
            )
            prev = nxt
    return f"WITH {', '.join(defs)} {' UNION ALL '.join(selects)}"


def mis_oracle_sql(
    fixture_cte: str, edges_name: str, rounds: int, seed: int = 42
) -> str:
    """Exact oracle for ``maximal_independent_set(G, seed)`` (Luby's) on
    an identity-renumbered undirected graph.

    Mirrors components/mis.py: per round, active vertices draw priority
    xxhash64(vertex, seed+round); vertices beating every active
    neighbor's priority join the MIS; winners and their neighbors leave
    the active set. Unrolled ``rounds`` times — once the active set
    empties, further rounds are no-ops, so any round count >= the
    fixpoint is exact."""
    defs = [
        fixture_cte.strip().strip(","),
        f"mis_act0 AS MATERIALIZED (SELECT src AS vertex FROM {edges_name} UNION SELECT dst FROM {edges_name})",
    ]
    win_selects = []
    for r in range(rounds):
        steps, h = xxhash64_steps(
            f"mp{r}", [("vertex", "long"), (str(seed + r), "int")], seed=42
        )
        hash_defs, hashed = cte_chain(f"mis_act{r}", steps, f"mph{r}_")
        defs += hash_defs
        defs.append(
            f"mis_pri{r} AS MATERIALIZED (SELECT vertex, {to_i64(h)} AS hp FROM {hashed})"
        )
        defs.append(
            f"mis_nmin{r} AS MATERIALIZED (SELECT e.dst AS vertex, MIN(p.hp) AS np"
            f" FROM {edges_name} e JOIN mis_pri{r} p ON p.vertex = e.src"
            f" JOIN mis_act{r} a ON a.vertex = e.dst WHERE e.src <> e.dst GROUP BY e.dst)"
        )
        defs.append(
            f"mis_win{r} AS MATERIALIZED (SELECT p.vertex FROM mis_pri{r} p"
            f" LEFT JOIN mis_nmin{r} m ON m.vertex = p.vertex"
            f" WHERE m.np IS NULL OR p.hp < m.np)"
        )
        defs.append(
            f"mis_nbr{r} AS MATERIALIZED (SELECT DISTINCT e.dst AS vertex FROM {edges_name} e"
            f" JOIN mis_win{r} w ON w.vertex = e.src)"
        )
        defs.append(
            f"mis_act{r + 1} AS MATERIALIZED (SELECT a.vertex FROM mis_act{r} a"
            f" WHERE NOT EXISTS (SELECT 1 FROM mis_win{r} w WHERE w.vertex = a.vertex)"
            f" AND NOT EXISTS (SELECT 1 FROM mis_nbr{r} n WHERE n.vertex = a.vertex))"
        )
        win_selects.append(f"SELECT vertex FROM mis_win{r}")
    return f"WITH {', '.join(defs)} {' UNION ALL '.join(win_selects)}"


def vertex_coloring_oracle_sql(
    fixture_cte: str, edges_name: str, rounds: int, sweeps: int = 3, seed: int = 42
) -> str:
    """Exact oracle for ``vertex_coloring(G, seed)`` (rank-based
    speculative coloring + fixed compaction sweeps) on an
    identity-renumbered undirected graph.

    Mirrors components/vertex_coloring.py round for round: rank(v) =
    count of uncolored neighbors with higher (xxhash64 priority, id);
    candidate color = (rank+1)-th color unused by colored neighbors
    (Spark's 0-based ``filter(sequence(0, |used|+rank), ..)[rank]`` is
    DuckDB's 1-based ``list_filter(range(0, |used|+rank+1), ..)[rank+1]``);
    conflicts keep the higher-(p, id) endpoint. Then ``sweeps`` mex
    compaction passes. Extra rounds are no-ops."""
    defs = [
        fixture_cte.strip().strip(","),
        f"vc_verts AS MATERIALIZED (SELECT src AS vertex FROM {edges_name} UNION SELECT dst FROM {edges_name})",
    ]
    steps, h = xxhash64_steps("vcp", [("vertex", "long"), (str(seed), "int")], seed=42)
    hash_defs, hashed = cte_chain("vc_verts", steps, "vcph_")
    defs += hash_defs
    defs.append(f"vc_unc0 AS MATERIALIZED (SELECT vertex, {to_i64(h)} AS p FROM {hashed})")
    higher = "(s.p > d.p OR (s.p = d.p AND e.src > e.dst))"
    for r in range(rounds):
        defs.append(
            f"vc_rank{r} AS MATERIALIZED (SELECT e.dst AS vertex, COUNT(*) AS rnk"
            f" FROM {edges_name} e JOIN vc_unc{r} s ON s.vertex = e.src"
            f" JOIN vc_unc{r} d ON d.vertex = e.dst WHERE {higher} GROUP BY e.dst)"
        )
        if r == 0:
            defs.append(
                "vc_cand0 AS MATERIALIZED (SELECT u.vertex, u.p,"
                " COALESCE(k.rnk, 0)::INT AS color FROM vc_unc0 u"
                " LEFT JOIN vc_rank0 k ON k.vertex = u.vertex)"
            )
        else:
            defs.append(
                f"vc_used{r} AS MATERIALIZED (SELECT e.dst AS vertex,"
                f" list_sort(list(DISTINCT c.color)) AS used"
                f" FROM {edges_name} e JOIN vc_col{r} c ON c.vertex = e.src"
                f" JOIN vc_unc{r} d ON d.vertex = e.dst GROUP BY e.dst)"
            )
            defs.append(
                f"vc_cand{r} AS MATERIALIZED (SELECT u.vertex, u.p,"
                f" list_filter(range(0, len(COALESCE(w.used, [])) + COALESCE(k.rnk, 0) + 1),"
                f" x -> NOT list_contains(COALESCE(w.used, []), x))[COALESCE(k.rnk, 0) + 1]::INT"
                f" AS color FROM vc_unc{r} u"
                f" LEFT JOIN vc_rank{r} k ON k.vertex = u.vertex"
                f" LEFT JOIN vc_used{r} w ON w.vertex = u.vertex)"
            )
        defs.append(
            f"vc_lose{r} AS MATERIALIZED (SELECT DISTINCT e.dst AS vertex"
            f" FROM {edges_name} e JOIN vc_cand{r} s ON s.vertex = e.src"
            f" JOIN vc_cand{r} d ON d.vertex = e.dst"
            f" WHERE s.color = d.color AND {higher})"
        )
        defs.append(
            f"vc_new{r} AS MATERIALIZED (SELECT c.vertex, c.color FROM vc_cand{r} c"
            f" WHERE NOT EXISTS (SELECT 1 FROM vc_lose{r} x WHERE x.vertex = c.vertex))"
        )
        defs.append(
            f"vc_col{r + 1} AS MATERIALIZED ("
            + (f"SELECT vertex, color FROM vc_col{r} UNION ALL " if r else "")
            + f"SELECT vertex, color FROM vc_new{r})"
        )
        defs.append(
            f"vc_unc{r + 1} AS MATERIALIZED (SELECT u.* FROM vc_unc{r} u"
            f" WHERE NOT EXISTS (SELECT 1 FROM vc_new{r} x WHERE x.vertex = u.vertex))"
        )
    cur = f"vc_col{rounds}"
    defs.append(
        f"vc_sw0 AS MATERIALIZED (SELECT c.vertex, c.color, u.p FROM {cur} c"
        f" JOIN vc_unc0 u ON u.vertex = c.vertex)"
    )
    for s in range(sweeps):
        defs.append(
            f"vc_swu{s} AS MATERIALIZED (SELECT e.dst AS vertex,"
            f" list_sort(list(DISTINCT c.color)) AS used"
            f" FROM {edges_name} e JOIN vc_sw{s} c ON c.vertex = e.src GROUP BY e.dst)"
        )
        defs.append(
            f"vc_prop{s} AS MATERIALIZED (SELECT c.vertex, c.color, c.p,"
            f" list_filter(range(0, len(COALESCE(w.used, [])) + 1),"
            f" x -> NOT list_contains(COALESCE(w.used, []), x))[1]::INT AS mex"
            f" FROM vc_sw{s} c LEFT JOIN vc_swu{s} w ON w.vertex = c.vertex)"
        )
        defs.append(
            f"vc_swl{s} AS MATERIALIZED (SELECT DISTINCT e.dst AS vertex"
            f" FROM {edges_name} e JOIN vc_prop{s} s ON s.vertex = e.src"
            f" JOIN vc_prop{s} d ON d.vertex = e.dst"
            f" WHERE s.mex < s.color AND d.mex < d.color AND s.mex = d.mex"
            f" AND {higher})"
        )
        defs.append(
            f"vc_sw{s + 1} AS MATERIALIZED (SELECT c.vertex,"
            f" CASE WHEN c.mex < c.color AND NOT EXISTS"
            f" (SELECT 1 FROM vc_swl{s} x WHERE x.vertex = c.vertex)"
            f" THEN c.mex ELSE c.color END AS color, c.p FROM vc_prop{s} c)"
        )
    return f"WITH {', '.join(defs)} SELECT vertex, color FROM vc_sw{sweeps}"


def matching_oracle_sql(edges0_cte: str, edges0_name: str, rounds: int) -> str:
    """Exact oracle for ``approximate_weighted_matching`` (mutual-best
    handshaking) on an identity-renumbered symmetrized weighted graph.

    Mirrors community/matching.py: per round each remaining vertex points
    at its (weight, dst)-lexicographic-max neighbor; mutual pointers
    match and both endpoints' edges drop out. Weight sums must be exact
    across engines (integer-valued doubles). Extra rounds are no-ops."""
    defs = [edges0_cte.strip().strip(",")]
    pair_selects = []
    prev = edges0_name
    for r in range(rounds):
        defs.append(
            f"mat_best{r} AS MATERIALIZED (SELECT src AS a, dst AS b FROM {prev}"
            f" QUALIFY ROW_NUMBER() OVER (PARTITION BY src"
            f" ORDER BY weight DESC, dst DESC) = 1)"
        )
        defs.append(
            f"mat_mut{r} AS MATERIALIZED (SELECT x.a, x.b FROM mat_best{r} x"
            f" JOIN mat_best{r} y ON x.a = y.b AND x.b = y.a WHERE x.a < x.b)"
        )
        defs.append(
            f"mat_gone{r} AS MATERIALIZED (SELECT a AS vertex FROM mat_mut{r}"
            f" UNION ALL SELECT b FROM mat_mut{r})"
        )
        nxt = f"mat_e{r + 1}"
        defs.append(
            f"{nxt} AS MATERIALIZED (SELECT e.* FROM {prev} e"
            f" WHERE NOT EXISTS (SELECT 1 FROM mat_gone{r} g WHERE g.vertex = e.src)"
            f" AND NOT EXISTS (SELECT 1 FROM mat_gone{r} g WHERE g.vertex = e.dst))"
        )
        pair_selects.append(
            f"SELECT a AS vertex, b AS match FROM mat_mut{r}"
            f" UNION ALL SELECT b AS vertex, a AS match FROM mat_mut{r}"
        )
        prev = nxt
    return f"WITH {', '.join(defs)} {' UNION ALL '.join(pair_selects)}"


def mst_oracle_sql(
    edges_cte: str, edges_name: str, rounds: int, label_iters: int
) -> str:
    """Exact oracle for ``minimum_spanning_tree`` (Borůvka) projected to
    (src, dst, weight) with src < dst, on an identity-renumbered
    symmetrized weighted graph.

    Mirrors tree/minimum_spanning_tree.py: per round each component
    picks its minimum cross-component edge under the total order
    (weight, least(src,dst), greatest(src,dst), neighbor-component) —
    the key identifies the undirected edge independent of orientation,
    which is what makes equal-weight pick cycles impossible — then
    components merge by min-label propagation over the picked pairs.
    Both loops are unrolled with margin; converged rounds/iterations
    are no-ops."""
    defs = [
        edges_cte.strip().strip(","),
        f"mst_comp0 AS MATERIALIZED (SELECT vertex, vertex AS comp FROM (SELECT src AS vertex FROM {edges_name} UNION SELECT dst FROM {edges_name}))",
    ]
    new_selects = []
    for r in range(rounds):
        defs.append(
            f"mst_x{r} AS MATERIALIZED (SELECT e.src, e.dst, e.weight AS w,"
            f" cs.comp AS a, cd.comp AS b FROM {edges_name} e"
            f" JOIN mst_comp{r} cs ON cs.vertex = e.src"
            f" JOIN mst_comp{r} cd ON cd.vertex = e.dst"
            f" WHERE cs.comp <> cd.comp AND e.src <> e.dst)"
        )
        defs.append(
            f"mst_pick{r} AS MATERIALIZED (SELECT a, b, src, dst, w FROM mst_x{r}"
            f" QUALIFY ROW_NUMBER() OVER (PARTITION BY a"
            f" ORDER BY w, LEAST(src, dst), GREATEST(src, dst), b) = 1)"
        )
        new_selects.append(
            f"SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst, ABS(w) AS weight"
            f" FROM mst_pick{r}"
        )
        defs.append(
            f"mst_merge{r} AS MATERIALIZED (SELECT a, b FROM mst_pick{r}"
            f" UNION SELECT b, a FROM mst_pick{r})"
        )
        defs.append(
            f"mst_lab{r}_0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab"
            f" FROM mst_merge{r})"
        )
        for i in range(label_iters):
            defs.append(
                f"mst_nbr{r}_{i} AS MATERIALIZED (SELECT g.b AS node, MIN(l.lab) AS n"
                f" FROM mst_merge{r} g JOIN mst_lab{r}_{i} l ON l.node = g.a GROUP BY g.b)"
            )
            defs.append(
                f"mst_lab{r}_{i + 1} AS MATERIALIZED (SELECT l.node,"
                f" LEAST(l.lab, COALESCE(m.n, l.lab)) AS lab FROM mst_lab{r}_{i} l"
                f" LEFT JOIN mst_nbr{r}_{i} m ON m.node = l.node)"
            )
        defs.append(
            f"mst_comp{r + 1} AS MATERIALIZED (SELECT c.vertex,"
            f" COALESCE(l.lab, c.comp) AS comp FROM mst_comp{r} c"
            f" LEFT JOIN mst_lab{r}_{label_iters} l ON l.node = c.comp)"
        )
    union = " UNION ALL ".join(new_selects)
    return (
        f"WITH {', '.join(defs)} SELECT DISTINCT src, dst, weight FROM ({union})"
    )


def uniform_walk_path_oracle_sql(
    fixture_cte: str,
    edges_name: str,
    n_starts: int,
    max_depth: int,
    random_state: int = 42,
) -> str:
    """Exact oracle for ``uniform_random_walks`` projected to
    (walk_id, path, path_length) with '-'-joined external-id paths.

    Mirrors sampling/random_walks.py: starts are the first ``n_starts``
    vertices ordered by id (walk_id = that order); each step picks the
    neighbor minimizing (xxhash64(walk_id, step, dst, seed), dst).
    Unrolled over ``max_depth`` steps — each step is a join + hash-steps
    CTE chain + a QUALIFY row_number pick, exactly the Spark plan."""
    defs = [fixture_cte.strip().strip(",")]
    defs.append(
        f"rw_starts AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY vertex) - 1 AS walk_id,"
        f" vertex AS cur FROM (SELECT DISTINCT src AS vertex FROM {edges_name}"
        f" ORDER BY vertex LIMIT {n_starts}))"
    )
    trace_selects = ["SELECT walk_id, 0 AS step, cur AS vertex FROM rw_starts"]
    prev = "rw_starts"
    for step in range(1, max_depth + 1):
        cand = f"rw_cand{step}"
        defs.append(
            f"{cand} AS MATERIALIZED (SELECT w.walk_id, e.dst FROM {prev} w"
            f" JOIN {edges_name} e ON e.src = w.cur)"
        )
        steps, h = xxhash64_steps(
            f"rw{step}",
            [("walk_id", "long"), (str(step), "int"), ("dst", "long"),
             (str(random_state), "int")],
            seed=42,
        )
        hash_defs, hashed = cte_chain(cand, steps, f"rwh{step}_")
        defs += hash_defs
        chosen = f"rw_w{step}"
        defs.append(
            f"{chosen} AS MATERIALIZED (SELECT walk_id, dst AS cur FROM {hashed}"
            f" QUALIFY ROW_NUMBER() OVER (PARTITION BY walk_id"
            f" ORDER BY {to_i64(h)}, dst) = 1)"
        )
        trace_selects.append(f"SELECT walk_id, {step} AS step, cur AS vertex FROM {chosen}")
        prev = chosen
    defs.append(f"rw_trace AS MATERIALIZED ({' UNION ALL '.join(trace_selects)})")
    return (
        f"WITH {', '.join(defs)} "
        f"SELECT walk_id, string_agg(vertex::VARCHAR, '-' ORDER BY step) AS path, "
        f"COUNT(*) - 1 AS path_length FROM rw_trace GROUP BY walk_id"
    )


def node2vec_walk_path_oracle_sql(
    fixture_cte: str,
    edges_name: str,
    n_starts: int,
    max_depth: int,
    p: float,
    q: float,
    random_state: int = 42,
) -> str:
    """Exact oracle for ``node2vec_random_walks`` projected to
    (walk_id, path, path_length) with '-'-joined external-id paths.

    Mirrors sampling/random_walks.py's node2vec branch step by step: every
    out-edge of ``cur`` is reweighted by the (prev, cur, dst) relation —
    1/p when dst == prev (return), 1.0 when (prev, dst) is itself an edge
    (in-out), 1/q otherwise (explore; also the entire first step, where
    prev is NULL so both earlier CASE arms miss) — then the pick is
    inverse-CDF over the dst-ordered cumulative weights at threshold
    r = pmod(xxhash64(walk_id, step, seed), 2^30) / 2^30.

    Cross-engine exactness: the registry calls this with p/q whose
    reciprocals are small powers of two (p=0.5, q=0.25 -> weights in
    {2.0, 1.0, 4.0}), so every cumulative sum is an exact
    integer-in-double in BOTH engines (no float-association drift), r is
    exact (h < 2^30 divided by 2^30), and r*tot needs < 53 mantissa bits
    — the comparison is bit-identical."""
    inv_p, inv_q = 1.0 / p, 1.0 / q
    assert inv_p == int(inv_p) and inv_q == int(inv_q), (
        "exact oracle requires 1/p and 1/q to be exact small doubles"
    )

    def cand_body(rsel: str, edges: str) -> str:
        return (
            f"SELECT w.walk_id, w.cur AS vsrc, e.dst, w.r,"
            f" CASE WHEN e.dst = w.prev THEN {inv_p!r}"
            f" WHEN a.dst IS NOT NULL THEN 1.0 ELSE {inv_q!r} END AS w"
            f" FROM {rsel} w JOIN {edges} e ON e.src = w.cur"
            f" LEFT JOIN {edges} a ON a.src = w.prev AND a.dst = e.dst"
        )

    defs = [fixture_cte.strip().strip(",")]
    return _cdf_walk_sql(defs, edges_name, n_starts, max_depth, random_state, cand_body)


def biased_walk_path_oracle_sql(
    fixture_defs: list[str],
    edges_name: str,
    n_starts: int,
    max_depth: int,
    random_state: int = 42,
) -> str:
    """Exact oracle for ``biased_random_walks`` (weighted inverse-CDF
    pick, no node2vec reweighting) projected to (walk_id, path,
    path_length). ``fixture_defs`` must define ``edges_name`` with
    columns (src, dst, weight) whose weights are exact small doubles
    (powers of two) so cumulative sums compare bit-identically."""

    def cand_body(rsel: str, edges: str) -> str:
        return (
            f"SELECT w.walk_id, w.cur AS vsrc, e.dst, w.r, e.weight AS w"
            f" FROM {rsel} w JOIN {edges} e ON e.src = w.cur"
        )

    return _cdf_walk_sql(
        list(fixture_defs), edges_name, n_starts, max_depth, random_state, cand_body
    )


def _cdf_walk_sql(
    defs: list[str],
    edges_name: str,
    n_starts: int,
    max_depth: int,
    random_state: int,
    cand_body,
) -> str:
    """Shared skeleton of the weighted-walk oracles: per step, one
    per-walk threshold r = pmod(xxhash64(walk_id, step, seed), 2^30)/2^30,
    a candidate CTE from ``cand_body(state_cte, edges_name)`` (must yield
    walk_id, vsrc, dst, r, w), then the dst-ordered cumulative-sum pick —
    exactly sampling/random_walks.py's non-uniform branch."""
    defs.append(
        f"n2_starts AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY vertex) - 1 AS walk_id,"
        f" vertex AS cur, NULL::BIGINT AS prev FROM (SELECT DISTINCT src AS vertex FROM {edges_name}"
        f" ORDER BY vertex LIMIT {n_starts}))"
    )
    trace_selects = ["SELECT walk_id, 0 AS step, cur AS vertex FROM n2_starts"]
    prev = "n2_starts"
    for step in range(1, max_depth + 1):
        # per-walk inverse-CDF threshold r for this step (hash of
        # (walk_id, step, seed) — no dst: one draw per walker per step)
        steps, h = xxhash64_steps(
            f"nv{step}",
            [("walk_id", "long"), (str(step), "int"), (str(random_state), "int")],
            seed=42,
        )
        rdefs, rlast = cte_chain(prev, steps, f"n2h{step}_")
        defs += rdefs
        rsel = f"n2r{step}"
        defs.append(
            f"{rsel} AS MATERIALIZED (SELECT walk_id, cur, prev,"
            f" {pmod_sql(to_i64(h), 1 << 30)} / 1073741824.0 AS r FROM {rlast})"
        )
        cand = f"n2c{step}"
        defs.append(f"{cand} AS MATERIALIZED ({cand_body(rsel, edges_name)})")
        agg = f"n2b{step}"
        defs.append(
            f"{agg} AS MATERIALIZED (SELECT walk_id, vsrc, dst, r, w,"
            f" SUM(w) OVER (PARTITION BY walk_id) AS tot,"
            f" SUM(w) OVER (PARTITION BY walk_id ORDER BY dst"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum"
            f" FROM {cand})"
        )
        chosen = f"n2w{step}"
        # WHERE runs before the QUALIFY window in DuckDB, mirroring
        # Spark's eligible-filter-then-row_number exactly
        defs.append(
            f"{chosen} AS MATERIALIZED (SELECT walk_id, dst AS cur, vsrc AS prev"
            f" FROM {agg} WHERE cum >= r * tot"
            f" QUALIFY ROW_NUMBER() OVER (PARTITION BY walk_id ORDER BY cum, dst) = 1)"
        )
        trace_selects.append(f"SELECT walk_id, {step} AS step, cur AS vertex FROM {chosen}")
        prev = chosen
    defs.append(f"n2_trace AS MATERIALIZED ({' UNION ALL '.join(trace_selects)})")
    return (
        f"WITH {', '.join(defs)} "
        f"SELECT walk_id, string_agg(vertex::VARCHAR, '-' ORDER BY step) AS path, "
        f"COUNT(*) - 1 AS path_length FROM n2_trace GROUP BY walk_id"
    )


def _ge_threshold(p_col: str, t: float) -> str:
    """SQL for ``(p / 2^30) >= t`` with p an exact integer in [0, 2^30).

    t*2^30 is an exact double (power-of-two scaling), so the real-number
    comparison reduces to an exact integer one — immune to cross-engine
    float-division differences."""
    return f"({p_col} >= {math.ceil(t * (1 << 30))})"


def rmat_oracle_sql(
    scale: int,
    num_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> str:
    """Exact oracle for ``cugraph_spark.rmat(scale, num_edges, a, b, c,
    seed)`` with default flags (no clip/scramble/weights).

    Mirrors generators/rmat.py: per (row, level) uniform
    u = pmod(xxhash64(id, seed+level), 2^30) / 2^30; src bit when
    u >= a+b, dst bit when u in [a, a+b) or u >= a+b+c. The chained
    Spark hash shares its first fold (hashLong(id, 42)) across levels,
    and so does the oracle."""
    t_ab = a + b
    t_abc = a + b + c
    steps, h_id = xxhash64_steps("s", [("id", "long")], seed=42)
    src_terms, dst_terms = [], []
    for level in range(scale):
        lv, p_col = f"L{level}", f"p{level}"
        lv_steps, f = hash_round_steps(lv, str(seed + level), h_id, "int")
        steps += lv_steps
        steps.append((p_col, pmod_sql(to_i64(f), 1 << 30)))
        src_terms.append(
            f"(CASE WHEN {_ge_threshold(p_col, t_ab)} THEN {1 << level} ELSE 0 END)"
        )
        dst_terms.append(
            f"(CASE WHEN ({_ge_threshold(p_col, a)} AND NOT {_ge_threshold(p_col, t_ab)})"
            f" OR {_ge_threshold(p_col, t_abc)} THEN {1 << level} ELSE 0 END)"
        )
    final = (
        f"CAST({' + '.join(src_terms)} AS BIGINT) AS src, "
        f"CAST({' + '.join(dst_terms)} AS BIGINT) AS dst"
    )
    base = f"SELECT id FROM generate_series(0, {num_edges - 1}) t(id)"
    return fold_steps(base, steps, final_select=final)
