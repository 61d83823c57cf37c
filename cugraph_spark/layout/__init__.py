from .force_atlas2 import force_atlas2

__all__ = ["force_atlas2"]
