from . import dedup, multimodal, similarity  # noqa: F401
