"""IVF ANN, salted aggregates, stateful streaming sessionizer."""

import datetime as dt
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from rasterframes_spark import pipeline as P


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_ann_recall_and_self_match(spark, emb):
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = P.cosine_topk(emb, queries, k=5)
    approx = P.ivf_ann_topk(emb, queries, k=5, n_lists=8, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert all((q, q) in a for q in [r["query_id"] for r in queries.collect()])
    assert len(e & a) / len(e) > 0.4  # probing 3/8 lists of near-random vectors


def test_ivf_cost_is_partial_scan(spark, emb):
    # with n_probe == n_lists the result must equal the exact top-k
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = P.cosine_topk(emb, queries, k=5)
    full = P.ivf_ann_topk(emb, queries, k=5, n_lists=4, n_probe=4)
    e = {(r["query_id"], r["neighbor_id"], r["cos"]) for r in exact.collect()}
    f = {(r["query_id"], r["neighbor_id"], r["cos"]) for r in full.collect()}
    assert e == f


def test_salted_agg_matches_plain(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = {(r["lang"],): (r["n"], r["s"]) for r in
             docs.groupBy("lang").agg(F.count("*").alias("n"),
                                      F.sum("n_chars").alias("s")).collect()}
    salted = P.salted_agg(docs, ["lang"], {"n": ("*", "count"), "s": ("n_chars", "sum")})
    got = {(r["lang"],): (r["n"], r["s"]) for r in salted.collect()}
    assert got == plain


def test_stateful_sessionizer(spark, tmp_path):
    from rasterframes_spark.streaming import stateful_sessionizer

    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2h gap; user 2: one session
    for i in range(3):
        rows.append({"user_id": 1, "ts": base + dt.timedelta(minutes=5 * i), "value": 1.0})
    for i in range(2):
        rows.append({"user_id": 1, "ts": base + dt.timedelta(hours=3, minutes=5 * i), "value": 2.0})
    rows.append({"user_id": 2, "ts": base, "value": 7.0})
    batch = spark.createDataFrame(rows, schema="user_id long, ts timestamp, value double")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = stateful_sessionizer(stream, gap_seconds=1800)
    q = (out.writeStream.format("memory").queryName("sessions")
         .outputMode("append").start())
    try:
        # processAllAvailable never returns under ProcessingTimeTimeout
        # (timeout wakeups keep scheduling batches) — poll the sink instead
        import time

        sessions = set()
        for _ in range(40):
            time.sleep(2)
            got = spark.sql("select * from sessions").collect()
            sessions = {(r["user_id"], r["n_events"], r["total_value"]) for r in got}
            if (1, 3, 3.0) in sessions:
                break
        # the first user-1 session closed (gap exceeded within the batch)
        assert (1, 3, 3.0) in sessions
    finally:
        q.stop()


def test_lsh_multiprobe_improves_recall(spark):
    """Hamming-1 multiprobe recovers strictly more of the exact top-k than
    single-bucket probing at the same n_planes, and never less than the
    base; probing all bits == near-exhaustive."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(6).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in P.cosine_topk(emb, queries, k=5).collect()}

    def recall(mp):
        got = {(r["query_id"], r["neighbor_id"]) for r in P.lsh_ann_topk(
            emb, queries, k=5, n_planes=6, dim=64, multiprobe=mp).collect()}
        return len(got & exact) / len(exact)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0
    assert recall(6) > 0.9  # probing every Hamming ball ~ brute force
