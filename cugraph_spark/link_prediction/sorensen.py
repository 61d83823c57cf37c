"""Sorensen similarity (SURVEY §2.F).

Reference: /root/reference/python/cugraph/cugraph/link_prediction/sorensen.py
(3-call shape: sorensen / sorensen_coefficient / all_pairs_sorensen). Implementation
shared in _similarity.py.
"""

from ._similarity import all_pairs_similarity, similarity


def sorensen(input_graph, vertex_pair=None, use_weight=False):
    return similarity(input_graph, "sorensen", vertex_pair, use_weight)


def sorensen_coefficient(G, ebunch=None):
    """NetworkX-compat wrapper (reference sorensen.py)."""
    return similarity(G, "sorensen", ebunch, False)


def all_pairs_sorensen(input_graph, vertices=None, use_weight=False, topk=None):
    return all_pairs_similarity(input_graph, "sorensen", vertices, use_weight, topk)
