"""Linear assignment (Hungarian) on bipartite graphs.

Reference: linear_assignment/lap.py:8 (``hungarian(G, workers)``), :79
(``dense_hungarian(costs, nr, nc)``); legacy
cpp/src/linear_assignment/legacy/hungarian.cu (raft::lap).

SURVEY §2.H marks this optional/hard at scale; the implemented path is the
reference-parity small-N route: collect the bipartite cost matrix to the
driver and solve with a pure-python O(n^3) Jonker-Volgenant-style shortest
augmenting path algorithm (public textbook algorithm). Inputs beyond a few
thousand workers should use an auction-algorithm IterLoop (documented
future path) — the API shape is what matters for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..structure.graph import Graph

_INF = float("inf")


def _solve_dense(cost: list[list[float]]) -> list[int]:
    """Min-cost assignment; returns col index per row. JV shortest
    augmenting path, O(n^3)."""
    n, m = len(cost), len(cost[0]) if cost else 0
    assert n <= m
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)  # p[j] = row matched to column j (1-based)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [_INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], _INF, 0
            for j in range(1, m + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j], way[j] = cur, j0
                    if minv[j] < delta:
                        delta, j1 = minv[j], j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    out = [0] * n
    for j in range(1, m + 1):
        if p[j]:
            out[p[j] - 1] = j - 1
    return out


def dense_hungarian(costs, num_rows: int, num_columns: int, epsilon=None):
    """lap.py:79 — flattened row-major cost matrix. Returns (cost,
    assignment list). ``epsilon`` is the reference's float-comparison
    tolerance knob; the exact JV solver here has no float-threshold step,
    so it is accepted and unused."""
    num_cols = num_columns
    mat = [
        [float(costs[r * num_cols + c]) for c in range(num_cols)] for r in range(num_rows)
    ]
    assign = _solve_dense(mat)
    total = sum(mat[r][assign[r]] for r in range(num_rows))
    return total, assign


def hungarian(G: Graph, workers, epsilon: float = 1e-6):
    """lap.py:8 — workers = vertex list of the 'row' partition; the other
    endpoint set of their edges is the 'task' partition. Edge weights are
    costs (missing edges = +inf). Returns (total_cost, DataFrame (vertex,
    assignment))."""
    if not G.is_weighted():
        raise ValueError("hungarian requires edge weights (costs)")
    spark = G.edgelist.sparkSession
    workers = list(workers)
    wset = set(workers)
    edges = G.edges().collect()  # small-N driver path (see module docstring)
    tasks = sorted({r[DST] for r in edges if r[SRC] in wset})
    tidx = {t: i for i, t in enumerate(tasks)}
    if len(workers) > len(tasks):
        raise ValueError("more workers than tasks; infeasible assignment")
    big = 1e18
    mat = [[big] * len(tasks) for _ in workers]
    for r in edges:
        if r[SRC] in wset and r[DST] in tidx:
            i = workers.index(r[SRC])
            mat[i][tidx[r[DST]]] = min(mat[i][tidx[r[DST]]], float(r[WEIGHT]))
    assign = _solve_dense(mat)
    total = sum(mat[i][assign[i]] for i in range(len(workers)))
    rows = [(w, tasks[assign[i]]) for i, w in enumerate(workers)]
    df = spark.createDataFrame(rows, ["vertex", "assignment"])
    return total, df
