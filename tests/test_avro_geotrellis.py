"""Avro binary/container codec + GeoTrellis file-backend layers.

The Avro decoder is validated against the CANONICAL JVM implementation
(org.apache.avro ships in pyspark's jars) through py4j — container files
written by GenericDatumWriter must decode identically, and files written
by the pure-python writer must read back through DataFileReader.  The
GeoTrellis layout itself has no in-container reference writer (the
reference generates layers at test runtime via GeoTrellis); the layer
tests pin the documented layout through write->read round-trips on top
of the JVM-validated Avro substrate.
"""
import json
import zlib

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.sources.avro_io import (
    decode_binary, encode_binary, parse_schema, read_container,
    write_container)
from rasterframes_spark.sources.geotrellis import (
    decode_kv_record, geotrellis_layer_ids, read_geotrellis_catalog,
    read_geotrellis_layer, write_geotrellis_layer)

KV_SCHEMA = {
    "type": "record", "name": "KeyValueRecord",
    "namespace": "geotrellis.spark.io",
    "fields": [
        {"name": "pairs", "type": {"type": "array", "items": {
            "type": "record", "name": "Tuple2", "fields": [
                {"name": "_1", "type": {
                    "type": "record", "name": "SpatialKey",
                    "namespace": "geotrellis.layer",
                    "fields": [{"name": "col", "type": "int"},
                               {"name": "row", "type": "int"}]}},
                {"name": "_2", "type": [
                    {"type": "record", "name": "ShortArrayTile",
                     "namespace": "geotrellis.raster",
                     "fields": [
                         {"name": "cols", "type": "int"},
                         {"name": "rows", "type": "int"},
                         {"name": "cells",
                          "type": {"type": "array", "items": "int"}},
                         {"name": "noDataValue",
                          "type": ["int", "null"]}]},
                    {"type": "record", "name": "DoubleArrayTile",
                     "namespace": "geotrellis.raster",
                     "fields": [
                         {"name": "cols", "type": "int"},
                         {"name": "rows", "type": "int"},
                         {"name": "cells",
                          "type": {"type": "array", "items": "double"}},
                         {"name": "noDataValue",
                          "type": ["double", "null"]}]},
                ]}]}}}]}


# ---------------------------------------------------------------------------
# binary codec
# ---------------------------------------------------------------------------


def test_zigzag_varint_edges():
    s = {"type": "long"}
    for v in (0, -1, 1, 63, -64, 64, 2**31 - 1, -2**31, 2**62, -2**63):
        assert decode_binary(encode_binary(v, s), s) == v
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    assert encode_binary(0, s) == b"\x00"
    assert encode_binary(-1, s) == b"\x01"
    assert encode_binary(1, s) == b"\x02"
    assert encode_binary(-2, s) == b"\x03"
    assert encode_binary(2, s) == b"\x04"


def test_record_union_roundtrip_tagged():
    rec = {"pairs": [
        {"_1": {"col": 1, "row": 2},
         "_2": {"_type": "ShortArrayTile", "cols": 2, "rows": 1,
                "cells": [7, -8], "noDataValue": -32768}},
        {"_1": {"col": 3, "row": 4},
         "_2": {"_type": "DoubleArrayTile", "cols": 1, "rows": 1,
                "cells": [2.5], "noDataValue": None}},
    ]}
    b = encode_binary(rec, KV_SCHEMA)
    back = decode_binary(b, KV_SCHEMA, tag_records=True, exact=True)
    assert back["_type"] == "KeyValueRecord"
    p0, p1 = back["pairs"]
    assert p0["_2"]["_type"] == "ShortArrayTile"
    assert p0["_2"]["cells"] == [7, -8]
    assert p1["_2"]["_type"] == "DoubleArrayTile"
    assert p1["_2"]["noDataValue"] is None


def test_negative_array_block_count():
    # writers may emit negative block counts followed by a byte size;
    # hand-craft one: schema array<long>, block of 2 items (-2, size),
    # items 5 and 7, terminator 0
    s = parse_schema({"type": "array", "items": "long"})
    body = bytearray()
    from rasterframes_spark.sources.avro_io import _enc_long
    _enc_long(body, -2)      # negative count
    items = bytearray()
    _enc_long(items, 5)
    _enc_long(items, 7)
    _enc_long(body, len(items))
    body += items
    _enc_long(body, 0)
    assert decode_binary(bytes(body), s, exact=True) == [5, 7]


def test_container_deflate_roundtrip():
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "string"}, {"name": "b", "type": "bytes"}]}
    recs = [{"a": "x" * 100, "b": b"\x00" * 50}, {"a": "y", "b": b""}]
    data = write_container(recs, json.dumps(schema), codec="deflate")
    back, sj = read_container(data)
    assert back == recs and json.loads(sj)["name"] == "R"
    with pytest.raises(ValueError):
        read_container(b"NotAvro" + data)


def test_truncated_and_wrong_schema_raise():
    s = {"type": "record", "name": "R",
         "fields": [{"name": "x", "type": "long"},
                    {"name": "y", "type": "string"}]}
    b = encode_binary({"x": 1, "y": "hello"}, s)
    with pytest.raises(ValueError):
        decode_binary(b[:3], s)
    with pytest.raises(ValueError):
        decode_binary(b + b"\x01", s, exact=True)


# ---------------------------------------------------------------------------
# JVM oracle (canonical Apache Avro through py4j)
# ---------------------------------------------------------------------------


def _jvm_record(jvm, schema, d):
    r = jvm.org.apache.avro.generic.GenericData.Record(schema)
    for f in schema.getFields():
        r.put(f.name(), _jvm_value(jvm, f.schema(), d[f.name()]))
    return r


def _jvm_value(jvm, ft, v):
    t = ft.getType().getName()
    if t == "record":
        return _jvm_record(jvm, ft, v)
    if t == "array":
        arr = jvm.java.util.ArrayList()
        for item in v:
            arr.add(_jvm_value(jvm, ft.getElementType(), item))
        return arr
    if t == "union":
        if v is None:
            return None
        want = v.get("_type") if isinstance(v, dict) else None
        for b in ft.getTypes():
            if b.getType().getName() == "null":
                continue
            if want is None or b.getName() == want:
                return _jvm_value(jvm, b, v)
        raise AssertionError("no union branch")
    if t == "bytes":
        return jvm.java.nio.ByteBuffer.wrap(bytearray(v))
    return v


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_jvm_written_container_decodes(spark, tmp_path, codec):
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(KV_SCHEMA))
    rec = {"pairs": [
        {"_1": {"col": 3, "row": 7},
         "_2": {"_type": "ShortArrayTile", "cols": 2, "rows": 2,
                "cells": [1, -2, 30000, -30000], "noDataValue": -32768}},
        {"_1": {"col": 0, "row": 1},
         "_2": {"_type": "DoubleArrayTile", "cols": 1, "rows": 2,
                "cells": [0.5, -1e300], "noDataValue": None}},
    ]}
    path = str(tmp_path / f"jvm_{codec}.avro")
    dw = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    fw = jvm.org.apache.avro.file.DataFileWriter(dw)
    if codec == "deflate":
        fw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    fw.create(schema, jvm.java.io.File(path))
    fw.append(_jvm_record(jvm, schema, rec))
    fw.append(_jvm_record(jvm, schema, rec))
    fw.close()
    recs, sj = read_container(open(path, "rb").read())
    want = json.loads(json.dumps(rec))
    for p in want["pairs"]:                 # untag for equality
        p["_2"] = {k: v for k, v in p["_2"].items() if k != "_type"}
    assert recs == [want, want]


def test_jvm_reads_python_written_container(spark, tmp_path):
    jvm = spark._jvm
    rec = {"pairs": [
        {"_1": {"col": 9, "row": 9},
         "_2": {"_type": "ShortArrayTile", "cols": 1, "rows": 1,
                "cells": [42], "noDataValue": None}}]}
    data = write_container([rec], json.dumps(KV_SCHEMA), codec="deflate")
    p = str(tmp_path / "py.avro")
    open(p, "wb").write(data)
    dr = jvm.org.apache.avro.generic.GenericDatumReader()
    fr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), dr)
    n = 0
    while fr.hasNext():
        r = fr.next()
        pairs = r.get("pairs")
        assert pairs.size() == 1
        t2 = pairs.get(0).get("_2")
        assert t2.get("cells").get(0) == 42
        n += 1
    fr.close()
    assert n == 1


def test_jvm_raw_binary_matches_python_encoding(spark):
    """Byte-level: raw binary (no container) from the JVM encoder must
    equal the pure-python encoding exactly — the GeoTrellis data-file
    payload format."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(KV_SCHEMA))
    rec = {"pairs": [
        {"_1": {"col": 5, "row": -6},
         "_2": {"_type": "DoubleArrayTile", "cols": 2, "rows": 1,
                "cells": [1.25, -2.5], "noDataValue": -9999.0}}]}
    bos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(
        bos, None)
    dw = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dw.write(_jvm_record(jvm, schema, rec), enc)
    enc.flush()
    jvm_bytes = bytes(bos.toByteArray())
    py_bytes = encode_binary(rec, KV_SCHEMA)
    assert jvm_bytes == py_bytes


# ---------------------------------------------------------------------------
# GeoTrellis layers
# ---------------------------------------------------------------------------


def _write_layer(cat, nodata=-999, dtype="int16"):
    rng = np.random.default_rng(3)
    tiles = []
    for c in range(3):
        for r in range(2):
            a = rng.integers(-100, 5000, (64, 64)).astype(dtype)
            a[0, 0] = nodata
            tiles.append((c + 2, r + 5, a))
    write_geotrellis_layer(tiles, cat, "ndvi", 9,
                           layout_extent=(-180, -90, 180, 90),
                           layout_cols=512, layout_rows=256,
                           nodata=nodata)
    return tiles


def test_kv_payload_compression_sniff(tmp_path):
    rec = {"pairs": [{"_1": {"col": 0, "row": 0},
                      "_2": {"_type": "ShortArrayTile", "cols": 1,
                             "rows": 1, "cells": [3],
                             "noDataValue": None}}]}
    raw = encode_binary(rec, KV_SCHEMA)
    for payload in (raw, zlib.compress(raw)):
        pairs = decode_kv_record(payload, json.dumps(KV_SCHEMA))
        assert pairs[0][1]["cells"] == [3]


def test_layer_roundtrip_distributed(spark, tmp_path):
    cat = str(tmp_path / "catalog")
    tiles = _write_layer(cat)
    assert geotrellis_layer_ids(cat) == [("ndvi", 9)]
    df = read_geotrellis_layer(spark, cat, "ndvi", 9)
    got = df.select("spatial_key",
                    rf.rf_tile_sum("tile").alias("s"),
                    rf.rf_no_data_cells("tile").alias("nd"),
                    "extent").collect()
    assert len(got) == 6
    exp = {(c, r): a for c, r, a in tiles}
    for row in got:
        a = exp[(row.spatial_key.col, row.spatial_key.row)]
        m = np.ma.masked_equal(a, -999)
        assert row.s == float(m.sum())
        assert row.nd == int((a == -999).sum())
    w, h = 360.0 / 512, 180.0 / 256
    r0 = [r for r in got
          if (r.spatial_key.col, r.spatial_key.row) == (2, 5)][0]
    assert r0.extent.xmin == pytest.approx(-180 + 2 * w)
    assert r0.extent.ymax == pytest.approx(90 - 5 * h)


def test_layer_query_extent_prunes(spark, tmp_path):
    cat = str(tmp_path / "catalog")
    _write_layer(cat)
    w = 360.0 / 512
    qe = (-180 + 2 * w + 1e-3, -90, -180 + 3 * w - 1e-3, 90)
    n = read_geotrellis_layer(spark, cat, "ndvi", 9,
                              query_extent=qe).count()
    assert n == 2


def test_catalog_listing(spark, tmp_path):
    cat = str(tmp_path / "catalog")
    _write_layer(cat)
    row = read_geotrellis_catalog(spark, cat).first()
    assert (row.layer, row.zoom) == ("ndvi", 9)
    assert row.cell_type == "int16ud-999"
    assert (row.tile_cols, row.tile_rows) == (64, 64)


def test_layer_float_nan_nodata(spark, tmp_path):
    cat = str(tmp_path / "catalog")
    a = np.array([[1.5, np.nan], [2.5, 4.0]], dtype="float64")
    write_geotrellis_layer([(0, 0, a)], cat, "f", 0,
                           layout_extent=(0, 0, 2, 2),
                           layout_cols=1, layout_rows=1,
                           nodata=float("nan"))
    row = (read_geotrellis_layer(spark, cat, "f", 0)
           .select(rf.rf_tile_sum("tile").alias("s"),
                   rf.rf_no_data_cells("tile").alias("nd"))
           .first())
    assert row.s == pytest.approx(8.0)
    assert row.nd == 1


def test_reader_zoom_without_layer_raises(spark, tmp_path):
    """zoom= without layer= is a user error (forgot layer=) — it must
    raise, not silently fall through to the Parquet-layer reader."""
    import pytest

    with pytest.raises(ValueError, match="zoom= needs layer="):
        spark.read.geotrellis(str(tmp_path), zoom=8)
