"""Jaccard similarity (SURVEY §2.F).

Reference: /root/reference/python/cugraph/cugraph/link_prediction/jaccard.py
(3-call shape: jaccard / jaccard_coefficient / all_pairs_jaccard). Implementation
shared in _similarity.py.
"""

from ._similarity import all_pairs_similarity, similarity


def jaccard(input_graph, vertex_pair=None, use_weight=False):
    return similarity(input_graph, "jaccard", vertex_pair, use_weight)


def jaccard_coefficient(G, ebunch=None):
    """NetworkX-compat wrapper (reference jaccard.py)."""
    return similarity(G, "jaccard", ebunch, False)


def all_pairs_jaccard(input_graph, vertices=None, use_weight=False, topk=None):
    return all_pairs_similarity(input_graph, "jaccard", vertices, use_weight, topk)
