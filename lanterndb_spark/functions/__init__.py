from lanterndb_spark.functions.distance import (
    cos_dist,
    hamming_dist,
    inner_dist,
    l2_dist,
    l2sq_dist,
    vector_dims,
    vector_norm,
)

__all__ = [
    "l2sq_dist",
    "l2_dist",
    "cos_dist",
    "hamming_dist",
    "inner_dist",
    "vector_norm",
    "vector_dims",
]

from lanterndb_spark.functions.bloom import (
    add_posting_blooms,
    array_to_bloom,
    bloom_build,
    might_contain,
)
from lanterndb_spark.functions.text import (
    STOPWORDS,
    bpe_token_estimate,
    compression_ratio,
    doc_fingerprint,
    dup_ngram_fraction,
    repetition_signals,
    top_ngram_fraction,
    word_ngrams,
    get_user_stopwords,
    lang_id,
    porter_stem,
    quality_score,
    set_user_stopwords,
    stem_array,
    token_count,
    tokenize,
    tokenize_py,
)

__all__ += [
    "bloom_build", "might_contain", "array_to_bloom", "add_posting_blooms",
    "tokenize", "tokenize_py", "stem_array", "porter_stem",
    "set_user_stopwords", "get_user_stopwords", "STOPWORDS",
    "lang_id", "token_count", "bpe_token_estimate", "quality_score",
    "compression_ratio",
    "doc_fingerprint", "word_ngrams", "dup_ngram_fraction",
    "top_ngram_fraction", "repetition_signals",
]

from lanterndb_spark.functions.sketches import (
    approx_quantiles,
    cms_build,
    cms_estimate,
    heavy_hitters,
    hll_distinct,
    hll_rollup,
    hll_sketches,
)

__all__ += [
    "hll_sketches", "hll_rollup", "hll_distinct",
    "approx_quantiles", "cms_build", "cms_estimate", "heavy_hitters",
]
