from .datetime import datetime_feature_columns  # noqa: F401
from .text import (  # noqa: F401
    MAX_GRAMS_PER_DOC,
    char_ngrams,
    distinct_shingles,
    language_id,
    quality_columns,
    rolling_fingerprint,
    tokens,
    word_shingles,
)
from .vector import cosine_similarity, dot_product, l2_norm  # noqa: F401
from .hashing import (  # noqa: F401
    hamming64,
    minhash_band_keys,
    minhash_from_grams,
    minhash_signature,
    simhash64,
)
