"""Multimodal training-data pipeline — REAL pure-python codecs end-to-end.

Ingest binary media columns (PNG images, animated-GIF video, WAV audio),
decode distributed, extract filter-time features, and join the scalar
features back onto the corpus — the shape of a multimodal corpus-curation
job. Every decode here is a real codec from this repo (sources/png.py,
sources/gif.py, pipeline/audio.py); no external media library.

Run: python examples/multimodal_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(spark=None):
    from pyspark.sql import functions as F

    from rasterframes_spark import pipeline as P
    from rasterframes_spark.sources.gif import encode_gif
    from rasterframes_spark.sources.png import encode_png
    from rasterframes_spark.pipeline.audio import encode_wav

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]",
                                        app_name="multimodal-example")

    # --- synthesize a small mixed-media corpus keyed by doc_id -------------
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id").limit(12).collect()
    rng = np.random.default_rng(0)
    rows = []
    for i, r in enumerate(docs):
        d = int(r["doc_id"])
        if i % 3 == 0:  # PNG image
            img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            rows.append((d, "image", bytearray(encode_png(img))))
        elif i % 3 == 1:  # animated GIF
            pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
            frames = [pal[rng.integers(0, 8, (16, 16))] for _ in range(3)]
            rows.append((d, "video", bytearray(encode_gif(frames, delay_ms=100))))
        else:  # WAV clip
            t = np.arange(4000) / 8000.0
            x = 0.4 * np.sin(2 * np.pi * (100 + d % 500) * t)
            rows.append((d, "audio", bytearray(encode_wav(x, 8000, bits=16))))
    media = spark.createDataFrame(
        rows, schema="media_id long, kind string, payload binary")

    # --- per-modality decode + features (each a mapInPandas chain) ---------
    images = P.decode_image(media.where(F.col("kind") == "image"), decode="png")
    img_feats = P.image_features(images, dim=16) \
        .select("media_id", F.lit("image").alias("kind"),
                F.aggregate("features", F.lit(0.0),
                            lambda a, v: a + v).alias("feature_sum"))

    frames = P.sample_video_frames(media.where(F.col("kind") == "video"),
                                   every_ms=100, decode="gif")
    vid_feats = frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames")) \
        .select("media_id", F.lit("video").alias("kind"),
                F.col("n_frames").cast("double").alias("feature_sum"))

    audio = P.decode_audio(media.where(F.col("kind") == "audio"), decode="wav")
    aud_feats = P.audio_features(audio) \
        .select("media_id", F.lit("audio").alias("kind"),
                F.col("rms").alias("feature_sum"))

    feats = img_feats.unionByName(vid_feats).unionByName(aud_feats)
    out = media.select("media_id", "kind").join(feats, ["media_id", "kind"], "left")
    result = out.orderBy("media_id").collect()
    assert all(r["feature_sum"] is not None for r in result), "a decode failed"
    if own:
        for r in result:
            print(r["media_id"], r["kind"], round(r["feature_sum"], 4))
        spark.stop()
    return result


if __name__ == "__main__":
    main()
