"""Full corpus-curation pipeline — the end-to-end shape of a production
pretraining-data job: PII scrub -> domain filter -> repetition/quality
gates -> exact + cross-corpus dedup -> benchmark decontamination ->
source mixing -> train/val/test split -> deterministic shuffle ->
sequence packing.

Every stage is a narrow Catalyst pass or a single bounded shuffle; the
stage-by-stage row counts print as the funnel report a curation run
normally logs.

Run: python examples/curation_pipeline.py
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
        spark = create_rf_spark_session(master="local[4]",
                                        app_name="curation-example")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    funnel = [("raw", docs.count())]

    # 1. PII scrub (codegen'd regexp chain; audit counts first)
    audited = docs.select("*", P.pii_counts("text").alias("pii"))
    docs = audited.withColumn("text", P.pii_scrub("text")).drop("pii")

    # 2. domain blocklist (no URLs in the synthetic corpus — a no-op
    # stage here, but the plan shape is the production one)
    docs = P.filter_by_domains(docs, ["spam.example"], mode="block")
    funnel.append(("domain_filter", docs.count()))

    # 2b. corpus-wide boilerplate-line removal (CCNet §4.1): lines
    # repeated verbatim across documents — nav bars, footers — are cut
    # before any per-document quality metric sees them.  The synthetic
    # corpus has no newlines, so plant a shared footer to show the
    # stage doing real work (at crawl scale the footers come free).
    docs = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit("\nsite footer (c) example")))
    docs = P.remove_duplicated_lines(docs, min_docs=2, keep_first=False,
                                     assume_unique_ids=True)
    funnel.append(("line_dedup", docs.count()))

    # 3. repetition + quality gates (Gopher-style thresholds)
    docs = P.repetition_metrics(docs, "text", top_ns=(2,), dup_ns=(5,))
    docs = docs.where((F.col("dup_line_frac") <= 0.9)
                      & (F.col("top_2gram_char_frac") <= 0.5)
                      & (F.col("dup_5gram_frac") <= 0.5))
    docs = docs.withColumn("quality", P.quality_score("text")) \
        .where(F.col("quality") >= 0.4)
    funnel.append(("quality", docs.count()))

    # 4. exact dedup, repeated-span (exact-substring) flagging, then
    # drop near-dups of a reference corpus
    docs = P.dedup_exact(docs, ["text"])
    docs = P.flag_repeated_spans(docs, n=12, winnow_stride=2) \
        .where(~F.col("has_repeated_span")).drop("has_repeated_span")
    ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .where(F.col("doc_id") % 10 == 0)
    hits = P.dedup_against_minhash(docs, ref, "doc_id", "text",
                                   num_perm=32, bands=16, threshold=0.9)
    self_hits = hits.where(F.col("new_id") != F.col("ref_id"))
    docs = docs.join(self_hits.select(F.col("new_id").alias("doc_id"))
                     .distinct(), "doc_id", "left_anti")
    funnel.append(("dedup", docs.count()))

    # 5. benchmark decontamination (13-gram membership, broadcast)
    toks = F.split(F.col("text"), r"\s+")
    bench = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
             .where(F.col("doc_id").isin(5, 11)).where(F.size(toks) >= 15)
             .select(F.concat_ws(" ", F.slice(toks, 2, 13)).alias("text")))
    docs = P.decontaminate(docs, bench, n=13, mode="drop")
    funnel.append(("decontaminated", docs.count()))

    # 6. source mixing -> split -> deterministic shuffle -> packing
    weights = {s: 1.0 if i % 2 == 0 else 0.5 for i, (s,) in enumerate(
        sorted(docs.select("source").distinct().collect()))}
    docs = P.sample_mixture(docs, weights)
    docs = P.split_dataset(docs, {"train": 0.9, "val": 0.05, "test": 0.05},
                           seed=13)
    train = docs.where(F.col("split") == "train")
    train = P.shuffle_deterministic(train, num_partitions=4, seed=0)
    # bound sequence length, then pack the chunks to the token budget
    train = P.chunk_documents(train, max_tokens=256)
    train = train.withColumn("n_tokens", P.token_count("text")) \
        .withColumn("doc_id", F.col("doc_id") * 1000 + F.col("chunk_index"))
    packed = P.pack_documents(train, max_tokens=2048)
    n_packs = packed.select("pack_id").distinct().count()
    funnel.append(("train_docs", train.count()))

    # 7. deterministic sharded delivery (stable membership + in-shard
    # order across runs)
    import shutil
    import tempfile
    shard_dir = tempfile.mkdtemp(prefix="curation_shards_")
    try:
        P.write_shards(train.drop("split"), shard_dir, num_shards=4, seed=21)
        n_shards = len([d for d in os.listdir(shard_dir)
                        if d.startswith("__shard=")])
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)

    for stage, n in funnel:
        print(f"{stage:>16}: {n}")
    print(f"{'packs':>16}: {n_packs}")
    print(f"{'shards':>16}: {n_shards}")
    if own:
        spark.stop()
    return funnel, n_packs


if __name__ == "__main__":
    main()
