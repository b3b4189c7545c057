"""Reference-parity walkthrough (kowari examples/basic_usage.rs:20-91):
create a collection, ingest vectors with metadata, run top-k searches
with id resolution, point ops, and an LSH probe.

Run: python examples/basic_usage.py
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kowari_spark import get_session
from kowari_spark.catalog import CollectionManager
from kowari_spark.functions.generators import generate_random_vectors
from kowari_spark.operators import knn, resolve
from kowari_spark.operators.lsh import SignLSH


def main() -> None:
    spark = get_session(app="kowari_example")
    warehouse = tempfile.mkdtemp(prefix="kowari_wh_")

    # -- create + ingest (reference: 100 vectors x 128 dims) -------------
    mgr = CollectionManager(spark, warehouse)
    coll = mgr.create_collection("demo", dimension=128, mode="strict")
    vecs = generate_random_vectors(spark, 100, 128, seed=7).select(
        F.col("id").cast("string").alias("id"),
        "embedding",
        F.to_json(F.struct(F.col("id").alias("n"))).alias("metadata"),
    )
    coll.add_df(vecs)
    print(f"collection info: {coll.info()}")

    # -- exact top-k with id resolution ---------------------------------
    base = coll.df()
    query = [float(x) for x in base.filter(F.col("id") == "0").first()["embedding"]]
    top5 = knn(base, query, 5, metric="cosine", round_to=6)
    hits = resolve(top5, base.select("id", "metadata"))
    print("top-5 (self-query — rank 1 must be id 0 at score 1.0):")
    for r in hits.orderBy(F.desc("score")).collect():
        print(f"  id={r['id']:>3}  score={r['score']:.6f}  meta={json.loads(r['metadata'])}")

    # -- metadata-filtered search ---------------------------------------
    filtered = knn(
        base.filter(F.get_json_object("metadata", "$.n").cast("long") < 50),
        query, 3, metric="euclidean", round_to=6,
    )
    print("euclidean top-3 among ids < 50:", [r["id"] for r in filtered.collect()])

    # -- LSH probe with brute-force fallback ----------------------------
    lsh = SignLSH(dim=128, num_planes=6, seed=42)
    probe = lsh.query(base, query, 5, id_col="id", round_to=6)
    print("LSH top-5:", [(r["id"], r["score"]) for r in probe.collect()])

    # -- point ops -------------------------------------------------------
    print("point get id=7 ->", coll.get("7") is not None)
    coll.delete("7")
    print("after delete, count =", coll.count())
    spark.stop()


if __name__ == "__main__":
    main()
