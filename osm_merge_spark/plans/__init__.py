from . import lineage  # noqa: F401
