"""Utility helpers (reference: cugraph/utilities/__init__.py —
path-retrieval helpers, sample_groups, import_optional)."""

from ..structure.utils_ops import sample_groups
from ..traversal.path_retrieval import (
    get_traversed_cost,
    get_traversed_path,
    get_traversed_path_list,
)


class MissingModule:
    """Placeholder for an unimportable module: any attribute access
    raises (reference: utilities/utils.py:316 MissingModule)."""

    def __init__(self, mod_name):
        self.name = mod_name

    def __getattr__(self, attr):
        raise RuntimeError(f"Module {self.name} could not be imported")


def import_optional(mod, default_mod_class=MissingModule):
    """Import ``mod`` if available, else return a MissingModule stub
    (reference: utilities/utils.py:323) — lets optional-dependency code
    fail only at use time."""
    import importlib

    try:
        return importlib.import_module(mod)
    except ModuleNotFoundError:
        return default_mod_class(mod_name=mod)


from . import utils  # noqa: E402  (submodule alias, after definitions)

__all__ = [
    "utils",
    "sample_groups",
    "get_traversed_cost",
    "get_traversed_path",
    "get_traversed_path_list",
    "MissingModule",
    "import_optional",
]
