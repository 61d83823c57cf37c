"""Exception classes (reference: python/cugraph/cugraph/exceptions.py)."""

from .link_analysis.pagerank import FailedToConvergeError

__all__ = ["FailedToConvergeError"]
