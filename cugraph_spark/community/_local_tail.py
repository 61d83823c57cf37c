"""Driver-side dendrogram tail for Louvain/Leiden.

Coarsened community graphs shrink geometrically: after one contraction
the level graph is community-sized, and after two it is almost always
driver-sized even when the input is 100 TB (the reference keeps the
whole dendrogram walk on one GPU for the same reason,
cpp/src/community/louvain_impl.cuh:74). Once a coarsened edge list fits
under ``LOCAL_TAIL_MAX_EDGES`` rows, finishing the remaining levels
with classic sequential Louvain locally replaces dozens of fixed-cost
Spark jobs whose shuffles would carry only a few thousand rows.

The gain formula, modularity convention (min-weight symmetrized list,
self-loops counted once in degrees and internal sums) and min-member
community labeling match community/louvain.py exactly; the visit order
is sequential ascending-id (the classic Louvain variant — label output
for these operators is documented as variant-dependent, validated by
modularity/connectivity invariants).
"""

from __future__ import annotations

LOCAL_TAIL_MAX_EDGES = 100_000


def _one_level_seq(adj, k, two_m, resolution, max_iter, threshold):
    """Sequential local-move passes; returns (comm dict, any_change)."""
    comm = {v: v for v in k}
    sigma = dict(k)
    changed_any = False
    for _ in range(max_iter):
        gain_total = 0.0
        moves = 0
        for v in sorted(k):
            cv = comm[v]
            wvc: dict = {}
            for u, w in adj.get(v, {}).items():
                c = comm[u]
                wvc[c] = wvc.get(c, 0.0) + w
            sigma[cv] -= k[v]
            stay = wvc.get(cv, 0.0) - resolution * k[v] * sigma[cv] / two_m
            best_c, best_g = cv, stay
            for c in sorted(wvc):
                if c == cv:
                    continue
                g = wvc[c] - resolution * k[v] * sigma[c] / two_m
                if g > best_g + 1e-12:
                    best_c, best_g = c, g
            if best_c != cv:
                comm[v] = best_c
                sigma[best_c] += k[v]
                gain_total += best_g - stay
                moves += 1
                changed_any = True
            else:
                sigma[cv] += k[v]
        if not moves or gain_total / two_m < threshold:
            break
    return comm, changed_any


def _split_connected_seq(adj, comm):
    """Leiden guarantee: split each community into connected components
    (union-find over intra-community edges); labels = min member."""
    parent = {v: v for v in comm}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for v in adj:
        for u in adj[v]:
            if comm[u] == comm[v]:
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in comm}


def _canonical(comm):
    mins: dict = {}
    for v, c in comm.items():
        if c not in mins or v < mins[c]:
            mins[c] = v
    return {v: mins[c] for v, c in comm.items()}


def _modularity(rows, comm, resolution):
    """Replicates louvain.modularity_of: two_m = sum of all row weights,
    internal(C) = intra rows' weight, sigma(C) = sum of member out-degrees."""
    two_m = sum(w for _, _, w in rows)
    if not two_m:
        return 0.0
    internal: dict = {}
    k: dict = {}
    for s, d, w in rows:
        k[s] = k.get(s, 0.0) + w
        if comm[s] == comm[d]:
            internal[comm[s]] = internal.get(comm[s], 0.0) + w
    sigma: dict = {}
    for v, c in comm.items():
        sigma[c] = sigma.get(c, 0.0) + k.get(v, 0.0)
    return sum(
        internal.get(c, 0.0) / two_m - resolution * (s / two_m) ** 2
        for c, s in sigma.items()
    )


def local_tail(rows, resolution, max_levels, max_iter, threshold, leiden_split=False):
    """Run the remaining dendrogram levels on a collected symmetrized
    edge list ``rows`` = [(src, dst, w)] (both directions present).

    Returns (mapping dict original-node -> final community label,
    modularity of the final partition)."""
    nodes = {s for s, _, _ in rows} | {d for _, d, _ in rows}
    mapping = {v: v for v in nodes}
    level_rows = rows
    for _ in range(max(0, max_levels)):
        adj: dict = {}
        k: dict = {}
        for s, d, w in level_rows:
            k[s] = k.get(s, 0.0) + w
            if s != d:
                # self-loops count in degrees but never in w_iC, matching
                # the distributed wic's src != dst filter
                adj.setdefault(s, {})
                adj[s][d] = adj[s].get(d, 0.0) + w
        two_m = sum(k.values())
        if not two_m:
            break
        comm, changed = _one_level_seq(adj, k, two_m, resolution, max_iter, threshold)
        if leiden_split:
            comm = _split_connected_seq(adj, comm)
        comm = _canonical(comm)
        # isolated level-nodes keep their own label
        for v in k:
            comm.setdefault(v, v)
        mapping = {o: comm[c] for o, c in mapping.items()}
        n_comms = len(set(comm.values()))
        if not changed or n_comms == len(k):
            break
        # contract for the next level
        contracted: dict = {}
        for s, d, w in level_rows:
            key = (comm[s], comm[d])
            contracted[key] = contracted.get(key, 0.0) + w
        level_rows = [(s, d, w) for (s, d), w in contracted.items()]
    final_comm = {v: mapping[v] for v in nodes}
    return final_comm, _modularity(rows, final_comm, resolution)
