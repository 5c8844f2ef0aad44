"""TileExploder/NoDataFilter transformers + streaming ops."""

import os
import time

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.ml import TileExploder, NoDataFilter
from rasterframes_spark.tile import Tile

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"


def test_tile_exploder_pipeline(spark):
    t = Tile(np.arange(9, dtype="float64").reshape(3, 3), "float64")
    nd = Tile(np.ma.masked_array(np.ones((3, 3)), mask=np.eye(3, dtype=bool)), "float64")
    df = spark.createDataFrame(
        [{"id": 1, "a": t.to_row(), "b": nd.to_row()}],
        schema=f"id int, a {TILE_T}, b {TILE_T}",
    )
    exploded = TileExploder(tileCols=["a", "b"]).transform(df)
    assert set(exploded.columns) == {"id", "column_index", "row_index", "a", "b"}
    assert exploded.count() == 9
    filtered = NoDataFilter(filterCols=["a", "b"]).transform(exploded)
    assert filtered.count() == 6  # 3 diagonal cells of b are NoData->null

    # feed into an actual ML stage
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(inputCols=["a", "b"], outputCol="features")
    vecs = va.transform(filtered)
    assert vecs.select("features").count() == 6


def test_windowed_tile_stats_stream(spark, tmp_path):
    from rasterframes_spark.streaming import read_tile_stream, windowed_tile_stats
    from pyspark.sql.types import StructType, StructField, TimestampType, StructType

    import datetime as dt

    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    tiles = [Tile(np.full((4, 4), float(i)), "float64") for i in range(4)]
    rows = [{"ts": dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=30 * i),
             "tile": t.to_row()} for i, t in enumerate(tiles)]
    batch = spark.createDataFrame(rows, schema=f"ts timestamp, tile {TILE_T}")
    batch.write.mode("overwrite").parquet(src)

    stream = read_tile_stream(spark, src, batch.schema)
    assert stream.isStreaming
    agg = windowed_tile_stats(stream, "tile", "ts", window="1 minute")
    q = (agg.writeStream.format("memory").queryName("tile_stats")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = spark.sql("select * from tile_stats order by window").collect()
        assert len(got) == 2  # 4 tiles at 30s spacing -> two 1-min windows
        assert got[0]["data_cells"] == 32
        assert got[0]["mean"] == 0.5  # tiles 0,1
        assert got[1]["mean"] == 2.5  # tiles 2,3
    finally:
        q.stop()


def test_streaming_dedup(spark, tmp_path):
    from rasterframes_spark.streaming import streaming_dedup
    import datetime as dt

    src = str(tmp_path / "dedup_src")
    os.makedirs(src, exist_ok=True)
    rows = [{"ts": dt.datetime(2026, 1, 1, 0, 0, i), "k": "x" if i % 2 == 0 else "y"}
            for i in range(6)]
    batch = spark.createDataFrame(rows, schema="ts timestamp, k string")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = streaming_dedup(stream, ["k"], "ts")
    q = out.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = spark.sql("select k, count(*) c from dedup_out group by k").collect()
        assert {r["k"]: r["c"] for r in got} == {"x": 1, "y": 1}
    finally:
        q.stop()


def test_read_geotiff_stream(spark, tmp_path):
    """Streaming GeoTIFF ingest: files landing in a directory stream out
    as tile-chunk rows; incremental runs over a checkpoint process only
    NEW scenes; values match the batch codec exactly."""
    from rasterframes_spark.sources import geotiff as GT
    from rasterframes_spark.streaming import read_geotiff_stream

    src = str(tmp_path / "scenes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    rng = np.random.default_rng(7)
    scenes = {}
    for name, (h, w) in [("a", (20, 20)), ("b", (16, 30))]:
        arr = rng.integers(0, 200, (h, w)).astype("uint16")
        scenes[name] = arr
        with open(f"{src}/{name}.tif", "wb") as f:
            f.write(GT.write_geotiff(arr, (0.0, 0.0, float(w), float(h)),
                                     "EPSG:32618", tile_size=16))

    out_dir = str(tmp_path / "out")
    stream = read_geotiff_stream(spark, src, tile_dimensions=(16, 16))
    assert stream.isStreaming
    # rf scalar ops compose on the stream unchanged
    enriched = stream.select("*", rf.rf_tile_sum("tile").alias("s"))
    q = (enriched.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    # a: 20x20/16 -> 2x2 = 4 chunks; b: 16x30 -> 1x2 = 2 chunks
    assert len(got) == 6
    by_scene = {}
    for r in got:
        key = os.path.basename(r["path"]).split(".")[0]
        by_scene.setdefault(key, []).append(r)
        tr = r["tile"]
        t = Tile.from_parts(tr["cell_type"], tr["cols"], tr["rows"],
                            bytes(tr["cells"]))
        sk = r["spatial_key"]
        exp = scenes[key][sk["row"] * 16: sk["row"] * 16 + t.cells.shape[0],
                          sk["col"] * 16: sk["col"] * 16 + t.cells.shape[1]]
        np.testing.assert_array_equal(np.asarray(t.cells), exp)
        assert r["s"] == float(exp.sum())
        assert r["crs"] == "EPSG:32618"
    assert len(by_scene["a"]) == 4 and len(by_scene["b"]) == 2

    # incremental: drop a third scene, same checkpoint -> only new rows
    arr = rng.integers(0, 200, (8, 8)).astype("uint16")
    with open(f"{src}/c.tif", "wb") as f:
        f.write(GT.write_geotiff(arr, (0.0, 0.0, 8.0, 8.0), "EPSG:32618",
                                 tile_size=16))
    q2 = (read_geotiff_stream(spark, src, tile_dimensions=(16, 16))
          .select("*", rf.rf_tile_sum("tile").alias("s"))
          .writeStream.format("parquet").option("path", out_dir)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    inc = spark.read.parquet(out_dir).collect()
    assert len(inc) == 7  # 6 prior chunks + exactly one new (c.tif)
    assert sum(1 for r in inc if r["path"].endswith("c.tif")) == 1


def test_read_geotiff_stream_query_extent(spark, tmp_path):
    from rasterframes_spark.sources import geotiff as GT
    from rasterframes_spark.streaming import read_geotiff_stream

    src = str(tmp_path / "scenes")
    os.makedirs(src, exist_ok=True)
    arr = np.arange(32 * 32, dtype="uint16").reshape(32, 32)
    with open(f"{src}/a.tif", "wb") as f:
        f.write(GT.write_geotiff(arr, (0.0, 0.0, 32.0, 32.0), "EPSG:32618",
                                 tile_size=16))
    out_dir = str(tmp_path / "out")
    q = (read_geotiff_stream(spark, src, tile_dimensions=(16, 16),
                             query_extent=(1.0, 17.0, 15.0, 31.0))
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    # AOI covers only the NW chunk (y 17..31 = top half, x 1..15 = left)
    assert len(rows) == 1
    assert rows[0]["spatial_key"].asDict() == {"col": 0, "row": 0}


def test_streaming_neardup(spark, tmp_path):
    """Stateful banded-LSH near-dup across a stream: planted near-copies
    in a LATER batch pair with their originals from state; unrelated
    docs never pair."""
    from rasterframes_spark.streaming import streaming_neardup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(30) \
        .select("doc_id", "text").collect()
    src = str(tmp_path / "neardup_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    # batch 1: originals
    spark.createDataFrame([(r["doc_id"], r["text"]) for r in docs],
                          schema).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    pairs = streaming_neardup(stream, "doc_id", "text", num_perm=32,
                              bands=16, threshold=0.9)
    out_dir = str(tmp_path / "neardup_out")
    ckpt = str(tmp_path / "neardup_ck")
    q = (pairs.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    first = spark.read.parquet(out_dir).collect()
    self_pairs = [r for r in first if r["new_id"] != r["prior_id"]]
    # batch 2: exact copies with shifted ids land later
    spark.createDataFrame(
        [(r["doc_id"] + 1000, r["text"]) for r in docs[:10]],
        schema).write.mode("append").parquet(src)
    q2 = (streaming_neardup(spark.readStream.schema(schema).parquet(src),
                            "doc_id", "text", num_perm=32, bands=16,
                            threshold=0.9)
          .writeStream.format("parquet").option("path", out_dir)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(180)
    allp = {(r["new_id"], r["prior_id"])
            for r in spark.read.parquet(out_dir).collect()}
    copies = {(d["doc_id"] + 1000, d["doc_id"]) for d in docs[:10]}
    # every planted copy found against STATE from the earlier batch
    assert copies <= allp, copies - allp
    # est_jaccard == 1.0 for exact copies
    ej = {(r["new_id"], r["prior_id"]): r["est_jaccard"]
          for r in spark.read.parquet(out_dir).collect()}
    assert all(ej[p] == 1.0 for p in copies)
    # any intra-corpus pair that emitted must clear the threshold
    assert all(v >= 0.9 for v in ej.values())
    assert all(a != b for a, b in allp)  # no self pairs
    del self_pairs


def test_sessionizer_late_events_and_string_keys(spark, tmp_path):
    """Cross-batch late events (inside the watermark) must never move the
    session's `last` backward — previously a late event split sessions
    spuriously and emitted session_end < session_start; string keys must
    work (schema was hardcoded long)."""
    import datetime as dt

    from rasterframes_spark.streaming import stateful_sessionizer

    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "user_id string, ts timestamp, value double"

    def write(rows, mode):
        spark.createDataFrame(rows, schema).write.mode(mode).parquet(src)

    out_dir = str(tmp_path / "late_out")
    seen = set()

    def run(_name):
        # parquet sink: memory sinks cannot recover from a checkpoint
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stateful_sessionizer(stream, gap_seconds=1800, timeout="none",
                                  watermark="2 hours")
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "late_ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        allr = spark.read.parquet(out_dir).collect()
        new = [r for r in allr
               if (r["user_id"], r["session_start"], r["session_end"])
               not in seen]
        seen.update((r["user_id"], r["session_start"], r["session_end"])
                    for r in allr)
        return new

    # batch 1: alice up to t=+20min
    write([{"user_id": "alice", "ts": base + dt.timedelta(minutes=m),
            "value": 1.0} for m in (0, 10, 20)], "overwrite")
    run("b1")
    # batch 2: a LATE alice event (t=+5min, before stored last=+20min)
    write([{"user_id": "alice", "ts": base + dt.timedelta(minutes=5),
            "value": 1.0}], "append")
    run("b2")
    # batch 3: +40min — within gap of last=+20min: must NOT close anything
    # (pre-fix, last had moved back to +5min and 40-5=35min > 30min split)
    write([{"user_id": "alice", "ts": base + dt.timedelta(minutes=40),
            "value": 1.0}], "append")
    got = run("b3")
    assert got == [], [r.asDict() for r in got]
    # batch 4: +3h closes the single merged session: 5 events, end>=start
    write([{"user_id": "alice", "ts": base + dt.timedelta(hours=3),
            "value": 1.0}], "append")
    got = run("b4")
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == "alice" and r["n_events"] == 5
    assert r["session_end"] >= r["session_start"]
    assert r["session_start"] == base
    assert r["session_end"] == base + dt.timedelta(minutes=40)


def test_sessionizer_adjacent_late_events_merge(spark, tmp_path):
    """Late events older than the open session by more than the gap form
    their OWN gap-respecting session(s): two late events within the gap of
    each other must close as ONE 2-event session, not two singletons."""
    import datetime as dt

    from rasterframes_spark.streaming import stateful_sessionizer

    src = str(tmp_path / "ll_src")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "user_id string, ts timestamp, value double"

    def write(rows, mode):
        spark.createDataFrame(rows, schema).write.mode(mode).parquet(src)

    out_dir = str(tmp_path / "ll_out")

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stateful_sessionizer(stream, gap_seconds=1800, timeout="none",
                                  watermark="10 hours")
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "ll_ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(out_dir).collect()

    # batch 1 opens a session far in the future of the late events
    write([{"user_id": "bob", "ts": base + dt.timedelta(hours=5),
            "value": 1.0}], "overwrite")
    run()
    # batch 2: two late events 10 min apart (well within the 30-min gap of
    # each other, both > gap older than the open session's start) and one
    # very-late loner > gap before them
    write([{"user_id": "bob", "ts": base, "value": 2.0},
           {"user_id": "bob", "ts": base + dt.timedelta(minutes=10),
            "value": 3.0},
           {"user_id": "bob", "ts": base - dt.timedelta(hours=2),
            "value": 7.0}], "append")
    got = sorted(run(), key=lambda r: r["session_start"])
    assert len(got) == 2, [r.asDict() for r in got]
    loner, merged = got
    assert loner["n_events"] == 1 and loner["total_value"] == 7.0
    assert merged["n_events"] == 2 and merged["total_value"] == 5.0
    assert merged["session_start"] == base
    assert merged["session_end"] == base + dt.timedelta(minutes=10)


def test_streaming_neardup_string_ids_and_band_guard(spark, tmp_path):
    """String doc ids work end-to-end (schemas were hardcoded long); a
    bands value that does not divide num_perm raises instead of silently
    dropping trailing minhash values."""
    from rasterframes_spark.streaming import streaming_neardup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(12) \
        .select("doc_id", "text").collect()
    src = str(tmp_path / "sid_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id string, text string"
    rows = [(f"doc-{r['doc_id']}", r["text"]) for r in docs]
    rows += [(f"copy-{r['doc_id']}", r["text"]) for r in docs[:4]]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    pairs = streaming_neardup(stream, "doc_id", "text", num_perm=32,
                              bands=16, threshold=0.9)
    out_dir, ckpt = str(tmp_path / "sid_out"), str(tmp_path / "sid_ck")
    q = (pairs.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["new_id"], r["prior_id"])
           for r in spark.read.parquet(out_dir).collect()}
    expected = {(f"copy-{r['doc_id']}", f"doc-{r['doc_id']}")
                for r in docs[:4]}
    # every planted exact copy pairs with its original (order of arrival
    # within the batch decides direction; both ids are strings)
    found = {tuple(sorted(p)) for p in got}
    assert {tuple(sorted(p)) for p in expected} <= found

    with pytest.raises(ValueError, match="divide num_perm"):
        streaming_neardup(stream, "doc_id", "text", num_perm=32, bands=10)


def test_read_raster_stream_mixed_formats(spark, tmp_path):
    """r10: the generic streaming source ingests a MIXED directory —
    GeoTIFF, GRIB2 (complex-packed), legacy GRIB1 and NetCDF-3 land in
    one stream and every tile decodes bit-exactly through the
    per-payload format sniff."""
    from rasterframes_spark.sources import geotiff as GT
    from rasterframes_spark.sources import grib1 as G1
    from rasterframes_spark.sources import grib2 as GB
    from rasterframes_spark.sources import netcdf as NC
    from rasterframes_spark.streaming import read_raster_stream

    src = str(tmp_path / "scenes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    rng = np.random.default_rng(12)
    fields = {
        "t.tif": rng.integers(0, 900, (20, 20)).astype("float64"),
        "g2.grib2": rng.integers(0, 900, (16, 16)).astype("float64"),
        "g1.grib": rng.integers(0, 900, (16, 16)).astype("float64"),
        "v.nc": rng.integers(0, 900, (16, 16)).astype("float64"),
    }
    ext = (0.0, 0.0, 16.0, 16.0)
    with open(f"{src}/t.tif", "wb") as f:
        f.write(GT.write_geotiff(fields["t.tif"], (0.0, 0.0, 20.0, 20.0)))
    with open(f"{src}/g2.grib2", "wb") as f:
        f.write(GB.write_grib2([fields["g2.grib2"]], ext,
                               packing="complex_diff"))
    with open(f"{src}/g1.grib", "wb") as f:
        f.write(G1.write_grib1([fields["g1.grib"]], ext))
    with open(f"{src}/v.nc", "wb") as f:
        f.write(NC.write_netcdf(
            {"band": (("y", "x"), fields["v.nc"]),
             "y": (("y",), np.arange(15.5, 0.0, -1.0)),
             "x": (("x",), np.arange(0.5, 16.0, 1.0))},
            {"y": 16, "x": 16}))
    # non-raster junk in the watched directory must be SKIPPED, not
    # crash-loop the checkpointed query (on_error='skip' default):
    # a sidecar, a truncated upload, and an MP4 whose ftyp box must
    # NOT be sniffed as JP2
    with open(f"{src}/scene.aux.xml", "wb") as f:
        f.write(b"<PAMDataset>metadata sidecar</PAMDataset>")
    with open(f"{src}/broken.tif", "wb") as f:
        f.write(b"II*\x00\x08\x00")
    with open(f"{src}/clip.mp4", "wb") as f:
        f.write(b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00" + b"\x00" * 64)

    out_dir = str(tmp_path / "out")
    stream = read_raster_stream(spark, src, tile_dimensions=(16, 16))
    q = (stream.select("*", rf.rf_tile_sum("tile").alias("s"))
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    # t.tif: 20x20/16 -> 4 chunks; the three 16x16 scenes: 1 each
    assert len(got) == 7
    sums = {}
    for r in got:
        name = os.path.basename(r["path"])
        sums[name] = sums.get(name, 0.0) + r["s"]
    for name, arr in fields.items():
        assert sums[name] == float(arr.sum()), name


def test_read_raster_stream_skips_corrupt_body_files(spark, tmp_path):
    """ADVICE r10 #2: a file whose header sniffs fine but whose chunk
    BYTES are corrupt (GeoTIFF/JP2 decode lazily per window) must also
    be skipped under on_error='skip' — the body-stage failure used to
    run outside the guard and crash-loop the checkpointed query.  And
    ADVICE r10 #4: the read_geotiff_stream alias stays STRICT by
    default (the r7 surface raised on malformed files)."""
    from rasterframes_spark.sources import geotiff as GT
    from rasterframes_spark.streaming import (_MemSource,
                                              read_geotiff_stream,
                                              read_raster_stream)

    src = str(tmp_path / "scenes")
    os.makedirs(src)
    rng = np.random.default_rng(13)
    good = rng.integers(0, 900, (64, 64)).astype("float64")
    payload = GT.write_geotiff(good, (0.0, 0.0, 64.0, 64.0),
                               tile_size=16)
    with open(f"{src}/good.tif", "wb") as f:
        f.write(payload)
    # valid header, clobbered first tile: read_info succeeds, the
    # window decode raises — the premise the guard must cover
    info = GT.read_info(_MemSource(payload, "probe"))
    bad = bytearray(payload)
    o, c = info.chunk_offsets[0], info.chunk_counts[0]
    bad[o:o + c] = b"\xff" * c
    GT.read_info(_MemSource(bytes(bad), "probe2"))   # header still fine
    with open(f"{src}/bad.tif", "wb") as f:
        f.write(bytes(bad))

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (read_raster_stream(spark, src, tile_dimensions=(64, 64))
         .select("*", rf.rf_tile_sum("tile").alias("s"))
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1 and os.path.basename(got[0]["path"]) == "good.tif"
    assert got[0]["s"] == float(good.sum())

    # the strict alias fails loudly on the same directory
    q2 = (read_geotiff_stream(spark, src, tile_dimensions=(64, 64))
          .writeStream.format("memory").queryName("strict_gt")
          .option("checkpointLocation", str(tmp_path / "ckpt2"))
          .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="corrupt|deflate|StreamingQuery"):
        q2.awaitTermination(120)


def test_read_raster_stream_multiband(spark, tmp_path):
    """r11: `bands` mirrors the batch reader's band_indexes — a
    streamed multi-field scene serves per-band tile columns (named
    like read_raster's), not just band 0."""
    from rasterframes_spark.sources import grib2 as GB
    from rasterframes_spark.streaming import read_raster_stream

    src = str(tmp_path / "scenes")
    os.makedirs(src)
    rng = np.random.default_rng(21)
    b0 = rng.integers(0, 900, (16, 16)).astype("float64")
    b1 = rng.integers(0, 900, (16, 16)).astype("float64")
    with open(f"{src}/multi.grib2", "wb") as f:
        f.write(GB.write_grib2([b0, b1], (0.0, 0.0, 16.0, 16.0)))
    # a single-band file in the same directory fails the band check and
    # is SKIPPED (on_error default) rather than crash-looping
    with open(f"{src}/single.grib2", "wb") as f:
        f.write(GB.write_grib2([b0], (0.0, 0.0, 16.0, 16.0)))

    q = (read_raster_stream(spark, src, tile_dimensions=(16, 16),
                            bands=(0, 1))
         .select("path", rf.rf_tile_sum("tile_b0").alias("s0"),
                 rf.rf_tile_sum("tile_b1").alias("s1"))
         .writeStream.format("memory").queryName("mb")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from mb").collect()
    assert len(rows) == 1
    assert os.path.basename(rows[0]["path"]) == "multi.grib2"
    assert rows[0]["s0"] == float(b0.sum())
    assert rows[0]["s1"] == float(b1.sum())


def test_read_raster_stream_netcdf_variable(spark, tmp_path):
    """r11: `variable` selects the NetCDF variable in streamed
    payloads — the byte-payload analog of batch `path#var` URIs.
    Without it the dispatch decodes the FIRST 2-D variable."""
    from rasterframes_spark.sources import netcdf as NC
    from rasterframes_spark.streaming import read_raster_stream

    src = str(tmp_path / "scenes")
    os.makedirs(src)
    rng = np.random.default_rng(43)
    t2m = rng.integers(0, 400, (16, 16)).astype("float64")
    wind = rng.integers(0, 90, (16, 16)).astype("float64")
    with open(f"{src}/s.nc", "wb") as f:
        f.write(NC.write_netcdf(
            {"t2m": (("y", "x"), t2m), "wind": (("y", "x"), wind),
             "y": (("y",), np.arange(15.5, 0.0, -1.0)),
             "x": (("x",), np.arange(0.5, 16.0, 1.0))},
            {"y": 16, "x": 16}))

    q = (read_raster_stream(spark, src, tile_dimensions=(16, 16),
                            variable="wind")
         .select(rf.rf_tile_sum("tile").alias("s"))
         .writeStream.format("memory").queryName("ncvar")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from ncvar").collect()
    assert len(rows) == 1 and rows[0]["s"] == float(wind.sum())
