"""Skew-mitigation utilities for 100 TB-scale aggregations and joins.

AQE's skew-join split handles the join side; these helpers handle skewed
GROUP BY keys (a handful of keys owning most rows — e.g. one language
dominating a document corpus) with the classic two-stage salted aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_agg", "salted_count"]


def salted_agg(df: DataFrame, group_cols: list, aggs: dict,
               salt_buckets: int = 16) -> DataFrame:
    """Two-stage aggregate for skewed keys.

    Stage 1 groups by (key, random salt) — the hot key's rows spread over
    `salt_buckets` reducers; stage 2 combines the per-salt partials. `aggs`
    maps output name -> (col, kind) with kind in {sum, count, min, max}.
    sum/count/min/max all re-combine exactly; avg = sum/count downstream.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    stage1 = []
    for name, (col, kind) in aggs.items():
        if kind == "sum":
            stage1.append(F.sum(col).alias(f"__p_{name}"))
        elif kind == "count":
            stage1.append(F.count(col).alias(f"__p_{name}"))
        elif kind == "min":
            stage1.append(F.min(col).alias(f"__p_{name}"))
        elif kind == "max":
            stage1.append(F.max(col).alias(f"__p_{name}"))
        else:
            raise ValueError(kind)
    partial = salted.groupBy(*group_cols, "__salt").agg(*stage1)
    stage2 = []
    for name, (col, kind) in aggs.items():
        combine = F.sum if kind in ("sum", "count") else (F.min if kind == "min" else F.max)
        stage2.append(combine(f"__p_{name}").alias(name))
    return partial.groupBy(*group_cols).agg(*stage2)


def salted_count(df: DataFrame, group_cols: list, salt_buckets: int = 16) -> DataFrame:
    return salted_agg(df, group_cols, {"n": ("*", "count")}, salt_buckets)
