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
