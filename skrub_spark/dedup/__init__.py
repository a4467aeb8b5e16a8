from .contamination import ngram_contamination  # noqa: F401
from .exact import dedup_exact  # noqa: F401
from .minhash import (  # noqa: F401
    dedup_minhash_pairs,
    minhash_buckets,
    minhash_incremental,
    minhash_near_duplicates,
)
from .simhash import dedup_simhash_pairs  # noqa: F401
from .jaccard import ngram_jaccard_pairs  # noqa: F401
from .embedding import embedding_near_duplicates, semantic_dedup  # noqa: F401
from .strings import deduplicate_strings  # noqa: F401
from .components import connected_components, keep_best  # noqa: F401
from .winnowing import winnow_fingerprints, winnowing_pairs  # noqa: F401
