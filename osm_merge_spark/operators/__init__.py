from . import conflate, spans  # noqa: F401
