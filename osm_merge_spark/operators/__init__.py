from . import buildings, conflate, dedup, media, poi, similarity, spans, tiling  # noqa: F401
