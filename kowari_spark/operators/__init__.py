from kowari_spark.operators.topk import knn, knn_batch, knn_two_stage, resolve

__all__ = ["knn", "knn_batch", "knn_two_stage", "resolve"]
