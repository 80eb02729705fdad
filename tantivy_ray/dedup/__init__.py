from .minhash import (  # noqa: F401
    MinHasher,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from .simhash import SimHasher, simhash_pairs  # noqa: F401
from .embedding import embedding_near_dup_pairs  # noqa: F401
from .exact import exact_dedup  # noqa: F401
from .allpairs import jaccard_allpairs_prefix  # noqa: F401
