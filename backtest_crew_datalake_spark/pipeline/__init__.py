from .text import (  # noqa: F401
    token_stats, quality_score, language_id, doc_fingerprint,
)
from .dedup import (  # noqa: F401
    exact_dedup, ngram_jaccard_pairs, minhash_dedup_pairs, simhash,
)
from .similarity import cosine_topk, lsh_sign_buckets, ivf_topk  # noqa: F401
from .sketch import cms_build, cms_estimate, cms_merge  # noqa: F401
