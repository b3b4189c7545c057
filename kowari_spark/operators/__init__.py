from kowari_spark.operators.topk import knn, knn_batch, knn_two_stage, resolve

__all__ = ["knn", "knn_batch", "knn_two_stage", "resolve"]


def __getattr__(name):
    # lazy re-exports of the ANN strategy contract (avoids importing
    # numpy/pandas-backed modules for callers that only need topk)
    if name in ("AnnIndex", "SignLSHIndex", "CrossPolytopeIndex",
                "IVFIndex", "HNSWIndex", "PQIndex", "IVFPQIndex"):
        from kowari_spark.operators import ann

        return getattr(ann, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
