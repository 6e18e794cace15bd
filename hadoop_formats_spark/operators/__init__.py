from . import dedup, multimodal, similarity, skew  # noqa: F401
