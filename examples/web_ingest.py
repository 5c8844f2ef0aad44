"""The full web-scrape ingest chain, end to end — what a training-data
pipeline actually runs over Common Crawl:

    WARC files (member-gzip, the crawl container)
      -> read_warc           (sources/warc.py: records, HTTP split)
      -> extract_html_text   (sources/html_text.py: boilerplate-pruned)
      -> c4_clean            (Raffel et al. 2020 line/page rules)
      -> gopher_quality_filter (Rae et al. 2021 document rules)
      -> minhash dedup       (banded LSH, never all-pairs)
      -> token counts        (what's left feeds the tokenizer)

Every stage is this repo's own operator; the crawl fixture is written
with the repo's own WARC writer. At 100 TB the only change is the input
glob — one WARC file per task, everything downstream shuffles on
content hashes and band buckets.

Run: python examples/web_ingest.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    from pyspark.sql import functions as F

    from rasterframes_spark import pipeline as P
    from rasterframes_spark.sources.warc import read_warc, write_warc

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]",
                                        app_name="web-ingest-example")

    # -- build a small crawl: good pages, boilerplate, near-duplicates --
    def http(body: bytes) -> bytes:
        return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body)

    def page(i: int, body: str) -> bytes:
        return (f"<html lang='en'><head><title>Page {i}</title></head>"
                f"<body><nav><a href=/>Home</a> <a>About</a></nav>"
                f"<article>{body}</article>"
                f"<footer>site footer</footer></body></html>").encode()

    base = ("<p>The quick brown fox jumps over the lazy dog and keeps "
            "going with plenty of the usual words to pass the of and "
            "length rules in this body paragraph number %d.</p>")
    crawl = tempfile.mkdtemp(prefix="crawl_")
    for fi in range(2):
        recs = []
        for i in range(6):
            doc_id = fi * 6 + i
            body = " ".join(base % (doc_id * 3 + k) for k in range(3))
            if i == 4:     # near-duplicate of page 0 (one word changed)
                body = (" ".join(base % (fi * 18 + k) for k in range(3))
                        .replace("quick", "speedy", 1))
            if i == 5:     # boilerplate-only page: C4 must drop it
                body = "<p>click here</p><p>read more</p>"
            recs.append(({"WARC-Type": "response",
                          "WARC-Target-URI":
                              f"https://ex.org/f{fi}/p{i}",
                          "WARC-Date": "2026-01-01T00:00:00Z"},
                         http(page(doc_id, body))))
        with open(os.path.join(crawl, f"part-{fi}.warc.gz"), "wb") as f:
            f.write(write_warc(recs))

    # -- the chain ------------------------------------------------------
    raw = read_warc(spark, crawl)
    docs = P.extract_html_text(
        raw.select(F.xxhash64("url").alias("media_id"), "url", "payload"))
    n_fetched = docs.count()

    cleaned = P.c4_clean(docs, "text", min_sentences=2)
    n_c4 = cleaned.count()

    quality = P.gopher_quality_filter(
        cleaned, "c4_text", min_words=30, min_stopwords=2)
    n_quality = quality.count()

    pairs = P.minhash_dedup_pairs(
        quality.withColumn("doc_id", F.col("media_id")),
        "doc_id", "c4_text", shingle_size=3, threshold=0.8)
    clusters = P.dedup_clusters(pairs)
    deduped = (quality.join(
        clusters.where(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias("media_id")), "media_id", "left_anti"))
    n_final = deduped.count()

    tokens = deduped.select(
        P.token_count("c4_text").alias("n")).agg(
        F.sum("n").alias("s")).head()["s"]

    print(f"fetched={n_fetched} after_c4={n_c4} after_quality={n_quality} "
          f"after_dedup={n_final} tokens={int(tokens)}")
    if own:
        spark.stop()
    return {"fetched": n_fetched, "after_c4": n_c4,
            "after_quality": n_quality, "after_dedup": n_final}


if __name__ == "__main__":
    main()
