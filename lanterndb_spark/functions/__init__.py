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
