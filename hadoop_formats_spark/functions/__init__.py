from .text import (  # noqa: F401
    LANG_STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    tokens,
)
