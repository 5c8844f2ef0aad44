"""Training-data dedup pipeline — exact + MinHash near-dup + quality filter
over the documents table, the shape of a production corpus-cleaning job.

Run: python examples/dedup_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    from rasterframes_spark import pipeline as P
    from pyspark.sql import functions as F

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]", app_name="dedup-example")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup (hash groupBy semantics)
    exact = P.dedup_exact(docs, ["text"])
    n1 = exact.count()

    # 2. near-dup pairs via MinHash+LSH, drop the higher doc_id of each pair
    pairs = P.minhash_dedup_pairs(exact, "doc_id", "text",
                                  num_perm=32, bands=16, threshold=0.85)
    to_drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    near = exact.join(to_drop, "doc_id", "left_anti")
    n2 = near.count()

    # 3. quality gate
    scored = near.withColumn("quality", P.quality_score("text"))
    kept = scored.where(F.col("quality") >= 0.5)
    n3 = kept.count()

    print(f"corpus: {n0} -> exact dedup {n1} -> near-dup removal {n2} "
          f"-> quality>=0.5 {n3}")
    if own:
        spark.stop()
    return (n0, n1, n2, n3)


if __name__ == "__main__":
    main()
