"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query set tracks BASELINE.md: column stats aggregate (StatsComputeBench),
binary local op (BinaryTileOpBench), explode (TileExplodeBench),
assemble (TileAssembleBench), plus the flagship normalized-difference
pipeline and masking.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F
    import rasterframes_spark as rf
    from rasterframes_spark import create_rf_spark_session
    import __spark_entry__ as entry

    spark = create_rf_spark_session(app_name="rf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # warm up the JVM + Python workers once (not timed)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).count()

    tiles = entry._two_band(spark, sf_dir)
    tiles.cache().count()  # materialize tile build once; bench the operators

    run("agg_stats", lambda: tiles.agg(rf.rf_agg_stats("qty").alias("s")).collect())
    run("local_add_sum", lambda: tiles.select(
        rf.rf_tile_sum(rf.rf_local_add("qty", 5)).alias("s")).agg(F.sum("s")).collect())
    run("normalized_difference", lambda: tiles.select(
        "grp", rf.rf_normalized_difference("price", "qty").alias("nd"))
        .agg(rf.rf_agg_mean("nd").alias("m")).collect())
    run("mask_pipeline", lambda: tiles.select(
        "grp", rf.rf_mask_by_value("price", rf.rf_local_greater("qty", 25), 1).alias("m"))
        .agg(rf.rf_agg_data_cells("m").alias("n")).collect())
    run("explode", lambda: rf.explode_tiles(tiles, ["qty"]).agg(F.sum("qty")).collect())

    cells = rf.explode_tiles(tiles, ["qty"]).where(F.col("qty").isNotNull())
    cells.cache().count()
    run("assemble", lambda: rf.assemble_tiles(
        cells, ["grp"], "column_index", "row_index", "qty", 16, 16, "float64")
        .agg(F.sum(rf.rf_tile_sum("tile"))).collect())

    run("quantiles", lambda: rf.rf_agg_approx_quantiles(
        tiles, "qty", [0.1, 0.5, 0.9]).collect())

    # LLM-pipeline headliners on documents/embeddings
    from rasterframes_spark import pipeline as P

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    run("text_metrics", lambda: P.text_metrics(docs).agg(
        F.sum("n_tokens"), F.sum("fingerprint")).collect())
    run("minhash_dedup", lambda: P.minhash_dedup_pairs(
        docs, "doc_id", "text", num_perm=32, bands=16, threshold=0.8).count())
    run("cosine_topk", lambda: P.cosine_topk(
        emb, emb.orderBy("vec_id").limit(8).select(
            F.col("vec_id").alias("query_id"), "embedding"), k=10).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
