"""Streaming scale evidence for streaming_neardup (r14, VERDICT r13
#8): a 10x document stream driven availableNow in multiple
micro-batches, recording per-batch throughput and STATE SIZE from the
streaming progress metrics — the bounded-state claim (per-bucket cap +
TTL) pinned with numbers instead of design prose.

The 10x corpus follows the bench's sf1 salting rules (10 pairwise-
distinct alphabet-rotation replicas of the sf0.1 documents — within-
replica near-dup structure survives, cross-replica Jaccard stays far
under threshold).  The corpus lands as ~20 parquet files and
maxFilesPerTrigger splits the availableNow run into several batches,
so state metrics are observed ACROSS batches: numRowsTotal should
plateau at ~(distinct occupied buckets x <= max_per_bucket) and
memoryUsedBytes must not grow unboundedly batch-over-batch.

Not a bench leg; results are recorded in PLANS.md.

Usage: python tools/rehearse_streaming.py
"""
# NOTE: no `from __future__ import annotations` — it would stringify
# pandas_udf type hints in imported modules' lazy registration
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from rasterframes_spark import create_rf_spark_session
    from rasterframes_spark.streaming import streaming_neardup

    spark = create_rf_spark_session(app_name="rehearse-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    a1, a2 = "aeiounrstl", "bcdfghmpwy"
    _tr = {r: str.maketrans(a1 + a2, a1[r:] + a1[:r] + a2[r:] + a2[:r])
           for r in range(10)}

    @pandas_udf("string")
    def salt(text: pd.Series, rep: pd.Series) -> pd.Series:
        return pd.Series(
            [None if t is None else t.translate(_tr[int(r)])
             for t, r in zip(text.values, rep.values)], dtype=object)

    reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    docs10 = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
              .select("doc_id", "text", reps)
              .select((F.col("doc_id").cast("long")
                       + F.col("rep").cast("long")
                       * F.lit(1_000_000_000).cast("long")).alias("doc_id"),
                      salt("text", "rep").alias("text")))

    work = tempfile.mkdtemp(prefix="rf_stream_rehearse_")
    src = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    docs10.repartition(20).write.parquet(src)
    n_in = spark.read.parquet(src).count()

    stream = spark.readStream.schema("doc_id long, text string") \
        .option("maxFilesPerTrigger", 4).parquet(src)
    pairs = streaming_neardup(stream, "doc_id", "text", num_perm=32,
                              bands=16, threshold=0.8, max_per_bucket=64)
    t0 = time.time()
    q = (pairs.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(1800)
    wall = round(time.time() - t0, 3)

    batches = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        batches.append({
            "batch": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "rows_per_sec": round(p.get("processedRowsPerSecond") or 0, 1),
            "state_rows": so.get("numRowsTotal"),
            "state_mb": round((so.get("memoryUsedBytes") or 0) / 1e6, 2),
            "state_rows_updated": so.get("numRowsUpdated"),
        })
    n_pairs = spark.read.parquet(out_dir).count()
    data_batches = [b for b in batches if (b["input_rows"] or 0) > 0]
    peak_state = max((b["state_mb"] or 0) for b in batches) if batches \
        else None
    result = {
        "leg": "streaming_neardup_10x",
        "docs_in": n_in, "pairs_out": n_pairs, "wall_sec": wall,
        "docs_per_sec": round(n_in / wall, 1),
        "n_batches": len(data_batches),
        "peak_state_mb": peak_state,
        "final_state_rows": batches[-1]["state_rows"] if batches else None,
        "batches": batches,
    }
    shutil.rmtree(work, ignore_errors=True)
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    sys.stdout.flush()
    print(json.dumps({"rehearse_streaming": result}))


if __name__ == "__main__":
    main()
