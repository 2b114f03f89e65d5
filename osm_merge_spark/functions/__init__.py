from . import tags, text  # noqa: F401
