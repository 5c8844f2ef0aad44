"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries broadcast (they are small by construction); the scan side stays
  partitioned, per-partition partial top-k via window rank after a single
  projection. No shuffle of the corpus.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing → candidate rerank —
  the 100 TB path: each query probes only its bucket (+ optional multiprobe
  neighbors), turning a full scan into a bucket-local scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from rasterframes_spark.functions._kernel import lazy_pandas_udf
from rasterframes_spark.pipeline.dedup import cosine_sim

__all__ = ["cosine_topk", "lsh_ann_topk", "hyperplane_bucket"]


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                corpus_id: str = "vec_id", query_id: str = "query_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns (query_id, neighbor_id, cos, rank). Ties broken by neighbor id
    for determinism. The join is a broadcast of `queries` (small side) —
    verify with .explain(): BroadcastHashJoin/BNLJ over broadcast, corpus
    never shuffles until the per-query top-k (k rows per query per
    partition after the window's partial rank).
    """
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col("__qid").alias(query_id),
        "neighbor_id",
        F.round(cosine_sim(F.col("__cv").cast("array<double>"),
                           F.col("__qv").cast("array<double>")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_bucket(vec_col, n_planes: int = 12, dim: int = 64, seed: int = 42):
    """Random-hyperplane LSH bucket id: sign-bit pattern of `n_planes`
    projections (Charikar cosine LSH)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    @lazy_pandas_udf("long")
    def udf(v: pd.Series) -> pd.Series:
        out = []
        for arr in v.values:
            if arr is None:
                out.append(None)
                continue
            x = np.asarray(arr, dtype="float64")
            bits = (planes @ x) > 0
            out.append(int(bits.dot(1 << np.arange(n_planes))))
        return pd.Series(out, dtype=object)

    return udf(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 corpus_id: str = "vec_id", query_id: str = "query_id",
                 vec_col: str = "embedding", n_planes: int = 8,
                 dim: int = 64) -> DataFrame:
    """Approximate top-k: both sides bucketed by hyperplane signature,
    equi-join on bucket, exact cosine rerank within bucket.

    Recall is tunable via n_planes (fewer planes = bigger buckets = higher
    recall & cost). Multiprobe (flipping one bit) would raise recall at
    +n_planes× candidate cost; omitted here for determinism.
    """
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        hyperplane_bucket(vec_col, n_planes, dim).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv"),
        hyperplane_bucket(vec_col, n_planes, dim).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col("__qid").alias(query_id),
        "neighbor_id",
        F.round(cosine_sim(F.col("__cv").cast("array<double>"),
                           F.col("__qv").cast("array<double>")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
