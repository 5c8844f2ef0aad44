"""Tile codec round-trips across all cell types — mirrors the reference's
TileUDTSpec / EncodingSpec strategy (SURVEY.md §5)."""

import numpy as np
import pytest

from rasterframes_spark.tile import CELL_TYPES, CellType, Tile


@pytest.mark.parametrize("ct_name", CELL_TYPES)
def test_roundtrip_all_cell_types(ct_name, rng):
    ct = CellType.parse(ct_name)
    if ct.dtype.kind == "f":
        arr = rng.normal(100, 10, (10, 10)).astype(ct.dtype)
    else:
        info = np.iinfo(ct.dtype)
        arr = rng.integers(max(info.min, -100) + 2, min(info.max, 100), (10, 10)).astype(ct.dtype)
    t = Tile(arr, ct)
    row = t.to_row()
    t2 = Tile.from_parts(row["cell_type"], row["cols"], row["rows"], row["cells"])
    assert t == t2


def test_nodata_sentinel_masks():
    t = Tile(np.array([[1, 0, 3], [4, 5, 0]], dtype="uint8"), "uint8")  # 0 == ND
    assert t.masked().count() == 4
    raw = Tile(np.array([[1, 0, 3]], dtype="uint8"), "uint8raw")
    assert raw.masked().count() == 3


def test_user_defined_nodata():
    ct = CellType.parse("uint16ud255")
    assert ct.nodata == 255
    t = Tile(np.array([[255, 1, 2]], dtype="uint16"), ct)
    assert t.masked().count() == 2
    assert float(t.masked().sum()) == 3.0


def test_float_nan_nodata():
    t = Tile(np.array([[1.0, np.nan, 3.0]]), "float64")
    assert t.masked().count() == 2
    row = t.to_row()
    t2 = Tile.from_parts(row["cell_type"], row["cols"], row["rows"], row["cells"])
    assert t2.masked().count() == 2


def test_masked_array_roundtrip_with_sentinel_fill():
    arr = np.ma.masked_array(np.array([[10, 20], [30, 40]], dtype="int16"), mask=[[0, 1], [0, 0]])
    t = Tile(arr, "int16")
    row = t.to_row()
    t2 = Tile.from_parts(row["cell_type"], row["cols"], row["rows"], row["cells"])
    assert np.ma.getmaskarray(t2.masked())[0, 1]
    assert t2.masked().sum() == 80


def test_operator_overloading():
    a = Tile(np.array([[1.0, 2.0]]), "float64")
    b = Tile(np.array([[10.0, 20.0]]), "float64")
    assert np.allclose((a + b).masked(), [[11, 22]])
    assert np.allclose((b - a).masked(), [[9, 18]])
    assert np.allclose((a * 2).masked(), [[2, 4]])
    assert np.allclose((b / a).masked(), [[10, 10]])


def test_celltype_parse_errors():
    with pytest.raises(ValueError):
        CellType.parse("int128")


def test_celltype_rf_types_api_surface():
    """The reference rf_types.CellType inspection surface (r7 parity):
    constructors, raw/ud/default classification, base names, numpy
    round-trip — nodata-handling.pymd builds on these."""
    from rasterframes_spark.tile import CellType

    assert CellType("uint16raw").is_raw()
    assert not CellType("uint16raw").has_no_data()
    assert CellType("uint16ud99").is_user_defined_no_data()
    assert CellType("uint16ud99").no_data_value() == 99
    assert CellType("uint16").is_default_no_data()
    assert CellType("uint16ud99").base_cell_type_name() == "uint16"
    assert CellType("float32raw").base_cell_type_name() == "float32"
    assert CellType.float32().is_floating_point()
    assert CellType.from_numpy_dtype(np.dtype("int16")).cell_type_name \
        == "int16"
    assert CellType.int32().to_numpy_dtype() == np.dtype("int32")
    assert CellType.uint8().with_no_data_value(7).cell_type_name \
        == "uint8ud7"


def test_tile_matmul_propagates_mask():
    from rasterframes_spark.tile import Tile

    a = np.ma.masked_array(np.arange(6, dtype="float64").reshape(2, 3),
                           mask=[[0, 0, 1], [0, 0, 0]])
    b = np.ones((3, 2))
    out = Tile(a, "float64") @ Tile(np.ma.masked_array(b), "float64")
    assert out.cells.shape == (2, 2)
    # plain product row 1 (unmasked) = 3+4+5
    assert float(out.cells[1, 0]) == 12.0


def test_extent_and_crs_classes():
    """Reference rf_types Extent/CRS surface, pure-python (r7)."""
    from types import SimpleNamespace

    from rasterframes_spark.tile import CRS, Extent

    e = Extent(10.0, 20.0, 13.0, 24.0)
    assert (e.width, e.height) == (3.0, 4.0)
    assert Extent.from_row(SimpleNamespace(xmin=1, ymin=2, xmax=3,
                                           ymax=4)) == Extent(1, 2, 3, 4)
    assert e.buffer(1.0) == Extent(9.0, 19.0, 14.0, 25.0)
    r = Extent(-78.0, 38.0, -77.0, 39.0).reproject("EPSG:4326", "EPSG:3857")
    assert r.xmin < r.xmax and abs(r.xmin) > 8_000_000  # web-mercator meters
    back = r.reproject("EPSG:3857", "EPSG:4326")
    assert abs(back.xmin + 78.0) < 1e-6 and abs(back.ymax - 39.0) < 1e-6
    c = CRS("EPSG:32618")
    assert c.proj4_str == "EPSG:32618" and str(c) == "EPSG:32618"
    assert c == CRS("EPSG:32618") and c != CRS("EPSG:4326")
    import pytest as _p
    with _p.raises(ValueError):
        CRS(12345)
