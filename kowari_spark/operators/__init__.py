from kowari_spark.operators.topk import knn, knn_batch, resolve

__all__ = ["knn", "knn_batch", "resolve"]
