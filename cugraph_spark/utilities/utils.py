"""utils submodule alias (reference: from cugraph.utilities import utils;
users call e.g. cugraph.utils.import_optional)."""

from . import (  # noqa: F401
    MissingModule,
    import_optional,
    sample_groups,
    get_traversed_path,
    get_traversed_path_list,
)
