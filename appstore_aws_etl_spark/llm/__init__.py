"""LLM-data-pipeline operators (SURVEY.md §2.11, north star).

Everything here is built for the 100 TB regime first: no driver-side
loops, no collect(), quadratic work always behind a pruned candidate
stage (LSH bands, cluster routing), Python only in Arrow-batched UDFs.
"""

from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from .similarity import (  # noqa: F401
    brute_force_knn,
    cosine_pairs,
    ivf_knn,
    lsh_candidate_pairs,
    lsh_similarity_join,
    similarity_join,
)
from .text import (  # noqa: F401
    document_fingerprint,
    language_id,
    ngrams,
    quality_scores,
    tfidf,
    tokenize,
    word_counts,
)
