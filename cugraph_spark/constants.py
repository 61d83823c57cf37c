"""Canonical column names for the engine.

Mirrors the reference's canonical edge-list columns
(/root/reference/python/cugraph/cugraph/structure/graph_implementation/simpleGraph.py:36-67):
``src, dst, weights, edge_id, edge_type`` — we use ``weight`` (singular)
as the public attr name, matching the docstring-facing convention.
"""

SRC = "src"
DST = "dst"
WEIGHT = "weight"
EDGE_ID = "edge_id"
EDGE_TYPE = "edge_type"
VERTEX = "vertex"
# Temporal edge columns (reference cugraph_c/graph.h:102-138,
# cugraph_graph_create_with_times_sg: edge_start_time_ids/edge_end_time_ids)
EDGE_START_TIME = "edge_start_time"
EDGE_END_TIME = "edge_end_time"

# Sentinel distance for unreachable vertices in bfs/sssp (the reference uses
# the max value of the distance dtype; see traversal/bfs.py docstrings).
import sys

UNREACHABLE_DISTANCE = float("inf")
UNREACHABLE_PREDECESSOR = -1
