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

import pandas as pd

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

    def run(name, fn, repeat=1):
        best = None
        for _ in range(repeat):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    def force(df):
        """Materialize every selected column without agg overhead."""
        df.write.format("noop").mode("overwrite").save()

    # warm up the JVM + Python workers once (not timed)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).count()

    # 64 tiles over 8 partitions: fewer Python-runner startups per chained
    # UDF stage than shuffle.partitions=32 would give for this tiny row count
    tiles = entry._two_band(spark, sf_dir).repartition(8)
    tiles.cache().count()  # materialize tile build once; bench the operators

    run("agg_stats", lambda: tiles.agg(rf.rf_agg_stats("qty").alias("s")).collect(), repeat=3)
    run("local_add_sum", lambda: tiles.select(
        rf.rf_tile_sum(rf.rf_local_add("qty", 5)).alias("s")).agg(F.sum("s")).collect(), repeat=3)
    run("normalized_difference", lambda: tiles.select(
        "grp", rf.rf_normalized_difference("price", "qty").alias("nd"))
        .agg(rf.rf_agg_mean("nd").alias("m")).collect(), repeat=3)
    run("mask_pipeline", lambda: tiles.select(
        "grp", rf.rf_mask_by_value("price", rf.rf_local_greater("qty", 25), 1).alias("m"))
        .agg(rf.rf_agg_data_cells("m").alias("n")).collect(), repeat=3)
    run("explode", lambda: rf.explode_tiles(tiles, ["qty"]).agg(F.sum("qty")).collect(), repeat=3)

    cells = rf.explode_tiles(tiles, ["qty"]).where(F.col("qty").isNotNull())
    cells.cache().count()
    run("assemble", lambda: rf.assemble_tiles(
        cells, ["grp"], "column_index", "row_index", "qty", 16, 16, "float64")
        .agg(F.sum(rf.rf_tile_sum("tile"))).collect(), repeat=3)

    run("quantiles", lambda: rf.rf_agg_approx_quantiles(
        tiles, "qty", [0.1, 0.5, 0.9]).collect(), repeat=3)

    # LLM-pipeline headliners on documents/embeddings
    from rasterframes_spark import pipeline as P

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    run("text_metrics", lambda: P.text_metrics(docs).agg(
        F.sum("n_tokens"), F.sum("fingerprint")).collect(), repeat=3)
    run("minhash_dedup", lambda: P.minhash_dedup_pairs(
        docs, "doc_id", "text", num_perm=32, bands=16, threshold=0.8).count(),
        repeat=3)
    run("cosine_topk", lambda: P.cosine_topk(
        emb, emb.orderBy("vec_id").limit(8).select(
            F.col("vec_id").alias("query_id"), "embedding"), k=10).count(), repeat=3)
    # PII scrub + Gopher repetition metrics: one narrow codegen'd
    # projection, no Python worker — the zero-UDF curation hot path
    run("scrub_repetition", lambda: P.repetition_metrics(
        docs.select("doc_id", P.pii_scrub("text").alias("text")), "text")
        .agg(F.sum("dup_5gram_frac"), F.sum("top_2gram_char_frac")).collect(),
        repeat=3)

    # --- BASELINE.md-matched microbenches (same shapes as the reference's
    # JMH runs, BASELINE.md table) ---
    import numpy as np
    from rasterframes_spark.tile import Tile

    TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"
    rng = np.random.default_rng(42)

    def tile_df(n, size, dtype="uint16", ct="uint16ud255"):
        rows = [{"id": i, "tile": Tile(
            rng.integers(0, 255, (size, size)).astype(dtype), ct).to_row()}
            for i in range(n)]
        return spark.createDataFrame(rows, schema=f"id int, tile {TILE_T}").repartition(8)

    # rf_agg_stats on 400 x 240^2 uint16ud255 (ref: 2061 ms)
    t400 = tile_df(400, 240).cache()
    t400.count()
    run("baseline_agg_stats_400x240", lambda: t400.agg(
        rf.rf_agg_stats("tile").alias("s")).collect(), repeat=5)

    # rf_local_add on 100 x 64^2 uint16ud255 (ref: 60 ms). Also record the
    # Arrow-UDF floor (identity pandas UDF on the same payload): the local_add
    # kernel itself adds ~0 over the Python-boundary fixed cost — the cost the
    # reference's JVM-only eval avoids at toy scale but pays back 6x on real
    # aggregates (see baseline_agg_stats).
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _ident(s: pd.Series) -> pd.Series:
        return s

    # min-of-7 on the floor + the floor-dominated kernel cell: the round-4
    # suite "regressed" 10% purely because this diagnostic drifted +38%
    # with unchanged code — more repeats pin the floor so kernel-minus-
    # floor (reported under "derived") separates real regressions from
    # environment drift
    t100s = tile_df(100, 64).cache()
    t100s.count()
    run("baseline_arrow_floor_100x64", lambda: force(
        t100s.select(_ident(F.col("tile.cells")))), repeat=7)
    run("baseline_local_add_100x64", lambda: force(
        t100s.select(rf.rf_local_add("tile", 5).alias("r"))), repeat=7)

    # 10x rows/task at the SAME shape: the 100x64 cell is ~100% fixed
    # per-stage harness cost (kernel-minus-floor ~ 0); this cell shows
    # that cost amortizing — per-tile work scales linearly while the
    # floor stays flat, which is the 100 TB posture (thousands of tiles
    # per task, not 100). Compare against 10x the reference's 60 ms
    # BinaryTileOpBench budget.
    t1000s = tile_df(1000, 64).cache()
    t1000s.count()
    run("baseline_local_add_10x_1000x64", lambda: force(
        t1000s.select(rf.rf_local_add("tile", 5).alias("r"))), repeat=7)

    # earlier sections' caches are dead weight from here on — release them
    # so the 6.5M-row assemble shuffle isn't benched under GC pressure
    t400.unpersist()
    t100s.unpersist()
    t1000s.unpersist()

    # explode 100 x 256^2 (ref: 217-413 ms); assemble back (ref: 100-381 ms)
    t100b = tile_df(100, 256).cache()
    t100b.count()
    run("baseline_explode_100x256", lambda: force(
        rf.explode_tiles(t100b, ["tile"])), repeat=5)
    cells_b = rf.explode_tiles(t100b, ["tile"]).where(F.col("tile").isNotNull()).cache()
    cells_b.count()
    # repeat=7: the budget cell with the highest run-to-run variance on a
    # noisy host — min-of-7 keeps the recorded number close to capability
    run("baseline_assemble_100x256", lambda: force(rf.assemble_tiles(
        cells_b, ["id"], "column_index", "row_index", "tile", 256, 256, "uint16ud255")),
        repeat=7)

    # tile codec micro-cells vs BASELINE.md TileEncodeBench: per-op time =
    # cell value / op count in the name. Encode = Tile.to_row (ref: encode
    # f32 256^2 = 288.9 us/op); round-trip = to_row + batched struct decode
    # (ref: f64 512^2 = 3401 us/op). Local-python by design — the
    # reference's JMH bench is also single-op, no cluster.
    from rasterframes_spark.functions._kernel import decode_struct_pdf
    from rasterframes_spark.tile import Tile as _Tile

    rng2 = np.random.default_rng(1)
    t32 = _Tile(rng2.random((256, 256)).astype("float32"), "float32")
    t64 = _Tile(rng2.random((512, 512)).astype("float64"), "float64")

    def enc_2000():
        for _ in range(2000):
            t32.to_row()

    def rt_1000():
        row = None
        for _ in range(1000):
            row = t64.to_row()
        pdf = pd.DataFrame([row] * 50)
        for _ in range(20):
            decode_struct_pdf(pdf)

    run("baseline_encode_f32_256_x2000", enc_2000, repeat=3)
    run("baseline_roundtrip_f64_512_x1000", rt_1000, repeat=3)

    # multiband PNG render vs BASELINE.md MultibandRenderBench (397.7
    # ms/op, Landsat-8 natural-color COG -> adjusted RGB PNG). The exact
    # Norfolk fixture isn't in this checkout; same workload class on the
    # Memphis COG band (963x754 uint16, decoded by our own TIFF reader)
    # or a same-shape synthetic when the fixture is absent. Single-op
    # local python, matching the JMH harness.
    import os as _os
    from rasterframes_spark.sources import geotiff as _GT
    from rasterframes_spark.sources.png import encode_png as _encode_png

    _memphis = "/root/reference/core/src/test/resources/LC08_B7_Memphis_COG.tiff"
    if _os.path.exists(_memphis):
        with open(_memphis, "rb") as _f:
            _cog = _f.read()
        _inf = _GT.read_info(_cog)
        _band = _GT.read_window(_cog, _inf, 0, 0, _inf.width, _inf.height)
    else:
        _band = (np.random.default_rng(5)
                 .integers(4000, 16000, (754, 963)).astype("uint16"))
    _rgb_in = (_band, np.roll(_band, 7, axis=0), np.roll(_band, 13, axis=1))

    def _render_png_once():
        def adjust(a):
            a = a.astype("float64")
            lo, hi = a.min(), a.max()
            x = np.clip((a - lo) / ((hi - lo) or 1) * 255.0, 0, 255)
            x = 255.0 * (x / 255.0) ** (1 / 0.8)   # gamma 0.8
            return np.clip(x, 0, 255).astype("uint8")

        _encode_png(np.stack([adjust(b) for b in _rgb_in], axis=-1))

    run("baseline_render_png_963x754_rgb", _render_png_once, repeat=5)

    # native JP2 decode throughput on the reference's Kakadu-encoded
    # Sentinel-2 fixture (192x192 tile, pathological 4x4 code-blocks) —
    # no reference baseline exists (the reference needs GDAL for JP2);
    # recorded as evidence for the codec's per-tile task cost
    b01 = "/root/reference/core/src/test/resources/B01.jp2"
    if os.path.exists(b01):
        from rasterframes_spark.sources import jp2 as _jp2

        _b01_raw = open(b01, "rb").read()
        _b01_cs = _jp2.JP2Codestream(_jp2._strip_container(_b01_raw))
        run("jp2_decode_tile_192_4x4cb",
            lambda: _jp2._decode_tile(_b01_cs, 55, 0), repeat=3)
        run("jp2_overview_1830_reduce4",
            lambda: _jp2.decode_jp2(_b01_raw, reduce=4), repeat=3)

    total = round(sum(timings.values()), 3)
    floor = timings.get("baseline_arrow_floor_100x64", 0.0)
    derived = {
        "local_add_minus_floor": round(
            timings["baseline_local_add_100x64"] - floor, 3),
        "explode_minus_floor": round(
            timings["baseline_explode_100x256"] - floor, 3),
        "assemble_minus_floor": round(
            timings["baseline_assemble_100x256"] - floor, 3),
        # ratio vs 10x the reference's 60 ms BinaryTileOpBench budget —
        # the equal-per-row-work comparison the 100x64 cell can't make
        # because it is ~100% fixed cost
        "local_add_10x_vs_10x_baseline": round(
            timings["baseline_local_add_10x_1000x64"] / 0.600, 3),
    }
    # Host-drift normalization (VERDICT r6 #4): every cell divided by the
    # same run's no-op Arrow-floor cell.  The floor moves with the host
    # (±20% observed round-to-round with zero code changes), so the
    # normalized series is what round-over-round comparisons should lead
    # with — a cell whose normalized value is stable only drifted with
    # the machine; a cell whose normalized value moved was actually
    # changed by code.
    normalized = {
        k: round(v / floor, 3) for k, v in timings.items()
        if floor > 0 and k != "baseline_arrow_floor_100x64"}
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "derived": derived,
        "normalized": normalized,
        "normalized_unit": "x_arrow_floor",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
