from kowari_spark.functions.vector import (
    cosine_similarity,
    dimension,
    dot,
    euclidean_distance,
    magnitude,
    manhattan_distance,
    neg_euclidean_score,
    normalize,
    similarity_expr,
)
from kowari_spark.functions.metadata import meta_field, meta_json

__all__ = [
    "cosine_similarity",
    "euclidean_distance",
    "manhattan_distance",
    "normalize",
    "magnitude",
    "dimension",
    "dot",
    "neg_euclidean_score",
    "similarity_expr",
    "meta_field",
    "meta_json",
]
