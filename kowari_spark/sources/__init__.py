from kowari_spark.sources.json_source import append_vectors, load_vectors, save_vectors

__all__ = ["save_vectors", "load_vectors", "append_vectors"]
