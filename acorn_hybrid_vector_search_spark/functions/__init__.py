from acorn_hybrid_vector_search_spark.functions.distance import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    l2_sq_distance,
)
from acorn_hybrid_vector_search_spark.functions.predicates import (
    abo_accessors,
    build_predicate,
    flat_accessors,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "l2_sq_distance",
    "abo_accessors",
    "build_predicate",
    "flat_accessors",
]
