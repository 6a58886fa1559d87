from fluvio_duck_spark.functions.exact import davg, dmul, dsum
from fluvio_duck_spark.functions.text import (
    char_trigrams,
    fingerprint,
    lang_id,
    lang_id_ngram,
    prefix_fingerprint,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
    winnow_fingerprints,
)
from fluvio_duck_spark.functions.vectors import cosine, dot, l2_normalize, norm

__all__ = [
    "char_trigrams",
    "cosine",
    "davg",
    "dmul",
    "dot",
    "dsum",
    "fingerprint",
    "l2_normalize",
    "lang_id",
    "lang_id_ngram",
    "norm",
    "prefix_fingerprint",
    "quality_score",
    "shingles",
    "stopword_ratio",
    "token_count",
    "winnow_fingerprints",
]
