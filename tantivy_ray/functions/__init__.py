from .text import (  # noqa: F401
    LANG_STOPWORDS,
    detect_language_batch,
    fingerprint_batch,
    quality_features_batch,
)
