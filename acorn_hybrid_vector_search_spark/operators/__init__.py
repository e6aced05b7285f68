from acorn_hybrid_vector_search_spark.operators.knn import knn_exact
from acorn_hybrid_vector_search_spark.operators.hybrid import (
    acorn_search,
    attribute_partitioned_search,
    postfilter_search,
    prefilter_search,
)

__all__ = [
    "knn_exact",
    "prefilter_search",
    "postfilter_search",
    "acorn_search",
    "attribute_partitioned_search",
]
