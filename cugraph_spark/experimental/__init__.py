"""Experimental namespace (reference: cugraph/experimental/__init__.py —
strongly_connected_components and find_bicliques live here too)."""

from ..components.connectivity import strongly_connected_components
from ..structure.bicliques import find_bicliques

__all__ = ["strongly_connected_components", "find_bicliques"]
