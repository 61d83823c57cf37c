"""Overlap similarity (SURVEY §2.F).

Reference: /root/reference/python/cugraph/cugraph/link_prediction/overlap.py
(3-call shape: overlap / overlap_coefficient / all_pairs_overlap). Implementation
shared in _similarity.py.
"""

from ._similarity import all_pairs_similarity, similarity


def overlap(input_graph, vertex_pair=None, use_weight=False):
    return similarity(input_graph, "overlap", vertex_pair, use_weight)


def overlap_coefficient(G, ebunch=None, do_expensive_check: bool = False):
    """NetworkX-compat wrapper (reference overlap.py; the
    ``do_expensive_check`` input-validation flag is a no-op there too)."""
    return similarity(G, "overlap", ebunch, False)


def all_pairs_overlap(input_graph, vertices=None, use_weight=False, topk=None):
    return all_pairs_similarity(input_graph, "overlap", vertices, use_weight, topk)
