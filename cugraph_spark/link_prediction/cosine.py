"""Cosine similarity (SURVEY §2.F).

Reference: /root/reference/python/cugraph/cugraph/link_prediction/cosine.py
(3-call shape: cosine / cosine_coefficient / all_pairs_cosine). Implementation
shared in _similarity.py.
"""

from ._similarity import all_pairs_similarity, similarity


def cosine(input_graph, vertex_pair=None, use_weight=False):
    return similarity(input_graph, "cosine", vertex_pair, use_weight)


def cosine_coefficient(G, ebunch=None):
    """NetworkX-compat wrapper (reference cosine.py)."""
    return similarity(G, "cosine", ebunch, False)


def all_pairs_cosine(input_graph, vertices=None, use_weight=False, topk=None):
    return all_pairs_similarity(input_graph, "cosine", vertices, use_weight, topk)
