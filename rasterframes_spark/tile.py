"""Tile core: cell types, the tile struct codec, and numpy interop.

Mirrors the reference's data model (SURVEY.md §1):

- CellType names and NoData semantics follow GeoTrellis conventions as used by
  the reference (``core/.../functions/package.scala:140-157``;
  ``python/pyrasterframes/rf_types.py:273-386``): each base dtype comes in a
  "raw" variant (no NoData), a "ConstantNoData" variant (sentinel NoData —
  the bare name, e.g. ``int16``), and a user-defined variant ``<base>ud<N>``.
- The tile struct layout is byte-compatible with the reference's TileUDT
  (``core/src/main/scala/org/apache/spark/sql/rf/TileUDT.scala:49-57``):
  ``struct{cell_type: string, cols: int, rows: int, cells: binary}``.
  Cells are C-order little-endian raw bytes of the numpy dtype.

There is deliberately NO Spark UDT: pandas UDFs receive the struct as a
pandas DataFrame of its fields, which is all the engine needs.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "CellType",
    "CRS",
    "Extent",
    "Tile",
    "TILE_SCHEMA",
    "EXTENT_SCHEMA",
    "PROJ_RASTER_SCHEMA",
    "CELL_TYPES",
]

# ---------------------------------------------------------------------------
# Spark schemas (the public contract)
# ---------------------------------------------------------------------------

TILE_SCHEMA = StructType(
    [
        StructField("cell_type", StringType(), True),
        StructField("cols", IntegerType(), True),
        StructField("rows", IntegerType(), True),
        StructField("cells", BinaryType(), True),
    ]
)

EXTENT_SCHEMA = StructType(
    [
        StructField("xmin", DoubleType(), True),
        StructField("ymin", DoubleType(), True),
        StructField("xmax", DoubleType(), True),
        StructField("ymax", DoubleType(), True),
    ]
)

PROJ_RASTER_SCHEMA = StructType(
    [
        StructField("tile", TILE_SCHEMA, True),
        StructField("extent", EXTENT_SCHEMA, True),
        StructField("crs", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Cell types
# ---------------------------------------------------------------------------

# base name -> (numpy dtype, ConstantNoData sentinel). Sentinels follow
# GeoTrellis (reference cell-type list core/.../functions/package.scala:140-157).
_BASES: dict[str, tuple[np.dtype, float | int | None]] = {
    "bool": (np.dtype("uint8"), None),  # bit-packed in GeoTrellis; 1 byte/cell here
    "int8": (np.dtype("int8"), -(2**7)),
    "uint8": (np.dtype("uint8"), 0),
    "int16": (np.dtype("int16"), -(2**15)),
    "uint16": (np.dtype("uint16"), 0),
    "int32": (np.dtype("int32"), -(2**31)),
    "float32": (np.dtype("float32"), float("nan")),
    "float64": (np.dtype("float64"), float("nan")),
}

_CT_RE = re.compile(r"^(bool|u?int(?:8|16|32)|float(?:32|64))(raw|ud(-?\d+(?:\.\d+)?))?$")


@dataclass(frozen=True)
class CellType:
    """Cell encoding + NoData semantics. ``nodata is None`` => raw (no NoData).

    ``CellType('uint16')`` (name-only, the reference rf_types constructor
    form) parses the name; internal call sites pass all three fields."""

    name: str
    dtype: np.dtype = None
    nodata: float | int | None = None

    def __post_init__(self):
        if self.dtype is None:
            parsed = CellType.parse(self.name)
            object.__setattr__(self, "dtype", parsed.dtype)
            object.__setattr__(self, "nodata", parsed.nodata)

    @property
    def has_nodata(self) -> bool:
        return self.nodata is not None

    @property
    def is_float(self) -> bool:
        return self.dtype.kind == "f"

    @staticmethod
    @functools.lru_cache(maxsize=256)
    def parse(name: str) -> "CellType":
        m = _CT_RE.match(name)
        if not m:
            raise ValueError(f"unknown cell type: {name!r}")
        base, suffix, ud = m.group(1), m.group(2), m.group(3)
        dtype, sentinel = _BASES[base]
        if base == "bool":
            nodata = None
        elif suffix is None:
            nodata = sentinel
        elif suffix == "raw":
            nodata = None
        else:  # user-defined
            nodata = float(ud) if dtype.kind == "f" else int(float(ud))
        return CellType(name=name, dtype=dtype, nodata=nodata)

    @staticmethod
    def from_numpy(dtype: np.dtype, nodata: float | int | None = "default") -> "CellType":
        """CellType for a numpy dtype, with ConstantNoData by default."""
        dtype = np.dtype(dtype)
        if dtype.kind == "b":
            return CellType.parse("bool")
        base = dtype.name  # e.g. 'int16', 'float32'
        if base not in _BASES:
            # promote unsupported dtypes (e.g. int64) to float64
            return CellType.parse("float64")
        if nodata == "default":
            return CellType.parse(base)
        if nodata is None:
            return CellType.parse(base + "raw")
        default = _BASES[base][1]
        if default is not None and (
            nodata == default or (isinstance(nodata, float) and np.isnan(nodata) and isinstance(default, float) and np.isnan(default))
        ):
            return CellType.parse(base)
        nd = int(nodata) if dtype.kind in "iu" else float(nodata)
        return CellType.parse(f"{base}ud{nd}")

    def mask_of(self, arr: np.ndarray) -> np.ndarray:
        """Boolean NoData mask for a raw value array of this cell type."""
        if self.nodata is None:
            return np.zeros(arr.shape, dtype=bool)
        if isinstance(self.nodata, float) and np.isnan(self.nodata):
            return np.isnan(arr)
        return arr == self.nodata

    # -- reference rf_types.CellType API compat --------------------------
    # (python/pyrasterframes/rf_types.py: the convenience constructors and
    # inspection methods the nodata-handling docs build on)

    @staticmethod
    def bool() -> "CellType":  # noqa: A003 - reference API name
        return CellType.parse("bool")

    @staticmethod
    def int8() -> "CellType":
        return CellType.parse("int8")

    @staticmethod
    def uint8() -> "CellType":
        return CellType.parse("uint8")

    @staticmethod
    def int16() -> "CellType":
        return CellType.parse("int16")

    @staticmethod
    def uint16() -> "CellType":
        return CellType.parse("uint16")

    @staticmethod
    def int32() -> "CellType":
        return CellType.parse("int32")

    @staticmethod
    def float32() -> "CellType":
        return CellType.parse("float32")

    @staticmethod
    def float64() -> "CellType":
        return CellType.parse("float64")

    def is_floating_point(self) -> bool:
        return self.is_float

    def has_no_data(self) -> bool:
        return self.has_nodata

    def no_data_value(self):
        return self.nodata

    def with_no_data_value(self, nodata) -> "CellType":
        """New CellType with a user-defined NoData (reference
        `CellType('uint16').with_no_data_value(99)` -> 'uint16ud99')."""
        return CellType.from_numpy(self.dtype, nodata)

    @property
    def cell_type_name(self) -> str:
        return self.name

    def is_raw(self) -> bool:
        return self.name.endswith("raw")

    def is_user_defined_no_data(self) -> bool:
        return "ud" in self.name

    def is_default_no_data(self) -> bool:
        return not (self.is_raw() or self.is_user_defined_no_data())

    def base_cell_type_name(self) -> str:
        if self.is_raw():
            return self.name[:-3]
        if self.is_user_defined_no_data():
            return self.name[:self.name.index("ud")]
        return self.name

    def to_numpy_dtype(self) -> np.dtype:
        return self.dtype

    @staticmethod
    def from_numpy_dtype(np_dtype) -> "CellType":
        return CellType.from_numpy(np.dtype(np_dtype))


CELL_TYPES = [
    "bool",
    "int8raw", "int8",
    "uint8raw", "uint8",
    "int16raw", "int16",
    "uint16raw", "uint16",
    "int32raw", "int32",
    "float32raw", "float32",
    "float64raw", "float64",
]


# ---------------------------------------------------------------------------
# Tile
# ---------------------------------------------------------------------------


class Tile:
    """A 2-D grid of cells + a CellType; numpy-masked-array backed.

    Mirrors the reference's Python Tile (``python/pyrasterframes/rf_types.py:389-533``)
    in behavior: construction from numpy arrays, NoData == mask, operator
    overloading, and round-trip to the Spark struct row.
    """

    __slots__ = ("cells", "cell_type")

    def __init__(self, cells: np.ndarray, cell_type: CellType | str | None = None):
        if isinstance(cell_type, str):
            cell_type = CellType.parse(cell_type)
        if cell_type is None:
            nodata = "default" if isinstance(cells, np.ma.MaskedArray) else None
            cell_type = CellType.from_numpy(cells.dtype, nodata)
        if cells.ndim == 1:
            cells = cells.reshape(1, -1)
        if cells.ndim != 2:
            raise ValueError("tile cells must be 2-D")
        if isinstance(cells, np.ma.MaskedArray):
            cells = np.ma.masked_array(
                np.asarray(cells.data, dtype=cell_type.dtype),
                mask=np.ma.getmaskarray(cells),
            )
        else:
            cells = np.ma.masked_array(
                np.asarray(cells, dtype=cell_type.dtype),
                mask=cell_type.mask_of(np.asarray(cells)),
            )
        self.cells: np.ma.MaskedArray = cells
        self.cell_type = cell_type

    # -- geometry of the grid --
    @property
    def rows(self) -> int:
        return self.cells.shape[0]

    @property
    def cols(self) -> int:
        return self.cells.shape[1]

    @property
    def dimensions(self) -> tuple[int, int]:
        return (self.cols, self.rows)

    # -- numpy interop --
    def masked(self) -> np.ma.MaskedArray:
        return self.cells

    def to_numpy(self) -> np.ndarray:
        """Raw values with NoData replaced by the sentinel (or as-is if raw)."""
        return encode_cells(self.cells, self.cell_type).reshape(self.cells.shape)

    def _repr_png_(self):
        """Jupyter display hook: render through the viridis ramp via the
        repo's pure-python PNG encoder — the reference's rf_ipython
        integration (python/pyrasterframes/rf_ipython.py) without PIL."""
        from rasterframes_spark.functions.proj_raster import _ramp_lut
        from rasterframes_spark.sources.png import encode_png

        a = self.masked().astype("float64")
        if a.count() == 0:
            return encode_png(np.zeros((self.rows, self.cols, 3), dtype="uint8"))
        lo, hi = float(a.min()), float(a.max())
        span = (hi - lo) or 1.0
        idx = np.clip(((a - lo) / span * 255.0).filled(0), 0, 255).astype("uint8")
        return encode_png(_ramp_lut("viridis")[idx])

    # -- struct codec --
    def to_row(self) -> dict:
        return {
            "cell_type": self.cell_type.name,
            "cols": self.cols,
            "rows": self.rows,
            "cells": self.to_numpy().tobytes(),
        }

    @staticmethod
    def from_parts(cell_type: str, cols: int, rows: int, cells: bytes) -> "Tile":
        ct = CellType.parse(cell_type)
        arr = np.frombuffer(cells, dtype=ct.dtype.newbyteorder("<")).astype(ct.dtype, copy=False)
        arr = arr.reshape(int(rows), int(cols))
        return Tile(np.ma.masked_array(arr, mask=ct.mask_of(arr)), ct)

    # -- equality / display --
    def __eq__(self, other):
        if not isinstance(other, Tile):
            return NotImplemented
        return (
            self.cell_type.name == other.cell_type.name
            and self.cells.shape == other.cells.shape
            and bool(np.array_equal(np.ma.getmaskarray(self.cells), np.ma.getmaskarray(other.cells)))
            and bool(np.ma.allequal(self.cells, other.cells))
        )

    def __repr__(self):
        return f"Tile({self.cols}x{self.rows}, {self.cell_type.name})"

    # -- local-algebra operator overloading (rf_types.py:430-462 analog) --
    def _lift(self, other):
        return other.cells if isinstance(other, Tile) else other

    def __add__(self, other):
        return Tile(self.cells + self._lift(other))

    __radd__ = __add__

    def __sub__(self, other):
        return Tile(self.cells - self._lift(other))

    def __rsub__(self, other):
        return Tile(self._lift(other) - self.cells)

    def __mul__(self, other):
        return Tile(self.cells * self._lift(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return Tile(self.cells.astype("float64") / self._lift(other))

    def __rtruediv__(self, other):
        return Tile(self._lift(other) / self.cells.astype("float64"))

    def __matmul__(self, other):
        # reference rf_types.Tile.__matmul__ (mask-propagating matmul)
        return Tile(np.ma.dot(self.cells, self._lift(other)))


class Extent:
    """Reference rf_types.Extent, without the JVM: plain float bounds
    plus the helpers the docs use (width/height/from_row/buffer) —
    ``reproject`` routes through the engine's own pure-math transforms
    (geom/proj.py) instead of a GeoTrellis callback."""

    __slots__ = ("xmin", "ymin", "xmax", "ymax")

    def __init__(self, xmin: float, ymin: float, xmax: float, ymax: float):
        self.xmin = float(xmin)
        self.ymin = float(ymin)
        self.xmax = float(xmax)
        self.ymax = float(ymax)

    @property
    def width(self) -> float:
        return abs(self.xmax - self.xmin)

    @property
    def height(self) -> float:
        return abs(self.ymax - self.ymin)

    @classmethod
    def from_row(cls, row) -> "Extent":
        return cls(row.xmin, row.ymin, row.xmax, row.ymax)

    def buffer(self, amount: float) -> "Extent":
        return Extent(self.xmin - amount, self.ymin - amount,
                      self.xmax + amount, self.ymax + amount)

    def reproject(self, src_crs: str, dest_crs: str) -> "Extent":
        from rasterframes_spark.geom.proj import transform_extent

        return Extent(*transform_extent(
            (self.xmin, self.ymin, self.xmax, self.ymax),
            str(src_crs), str(dest_crs)))

    def __eq__(self, other):
        return (isinstance(other, Extent)
                and (self.xmin, self.ymin, self.xmax, self.ymax)
                == (other.xmin, other.ymin, other.xmax, other.ymax))

    def __repr__(self):
        return (f"Extent({self.xmin}, {self.ymin}, "
                f"{self.xmax}, {self.ymax})")


class CRS:
    """Reference rf_types.CRS: a thin wrapper over the CRS string
    ('EPSG:nnnn' or a proj4 string); equality is string equality."""

    __slots__ = ("crsProj4",)

    def __init__(self, crsProj4):
        if not isinstance(crsProj4, str):
            raise ValueError(
                f"Unexpected CRS definition type: {type(crsProj4)}")
        self.crsProj4 = crsProj4

    @property
    def proj4_str(self) -> str:
        return self.crsProj4

    def __eq__(self, other):
        return isinstance(other, CRS) and self.crsProj4 == other.crsProj4

    def __str__(self):
        return self.crsProj4

    def __repr__(self):
        return f"CRS({self.crsProj4!r})"


# ---------------------------------------------------------------------------
# Vectorized (pandas-level) codec helpers for the kernel framework
# ---------------------------------------------------------------------------


def encode_cells(ma: np.ma.MaskedArray, ct: CellType) -> np.ndarray:
    """Masked array -> raw value array with sentinel-filled NoData."""
    data = np.asarray(ma.data if isinstance(ma, np.ma.MaskedArray) else ma)
    if data.dtype != ct.dtype:
        if ct.dtype.kind in "iu" and data.dtype.kind == "f":
            data = np.rint(data)
        data = data.astype(ct.dtype)
    mask = np.ma.getmaskarray(ma) if isinstance(ma, np.ma.MaskedArray) else None
    if mask is not None and mask.any():
        if ct.nodata is None:
            # raw cell type can't represent NoData: leave values as-is
            return data
        data = data.copy()
        data[mask] = ct.nodata
    return data


def decode_struct_pdf(pdf: pd.DataFrame) -> list[Tile | None]:
    """Decode a pandas DataFrame of tile-struct fields into Tiles.

    Pandas UDFs receive a StructType argument as a DataFrame with columns
    (cell_type, cols, rows, cells); null struct rows arrive as all-None.
    Accepts proj_raster structs too (tile field auto-unwrapped) — the
    engine's analog of the reference's DynamicExtractors structural typing
    (core/.../expressions/DynamicExtractors.scala:47-108).
    """
    if "cell_type" not in pdf.columns and "tile" in pdf.columns:
        pdf = pd.DataFrame([
            t if t is not None else {"cell_type": None, "cols": None, "rows": None, "cells": None}
            for t in pdf["tile"]
        ])
    out: list[Tile | None] = []
    cts = pdf["cell_type"].values
    colss = pdf["cols"].values
    rowss = pdf["rows"].values
    cellss = pdf["cells"].values
    for i in range(len(pdf)):
        ct = cts[i]
        cells = cellss[i]
        if ct is None or cells is None:
            out.append(None)
        else:
            out.append(Tile.from_parts(ct, int(colss[i]), int(rowss[i]), bytes(cells)))
    return out


def tiles_to_struct_pdf(tiles: list[Tile | None]) -> pd.DataFrame:
    """Encode Tiles into the pandas shape a struct-returning pandas UDF needs."""
    n = len(tiles)
    cell_type = np.empty(n, dtype=object)
    cols = np.empty(n, dtype=object)
    rows = np.empty(n, dtype=object)
    cells = np.empty(n, dtype=object)
    for i, t in enumerate(tiles):
        if t is None:
            cell_type[i] = None
            cols[i] = None
            rows[i] = None
            cells[i] = None
        else:
            cell_type[i] = t.cell_type.name
            cols[i] = t.cols
            rows[i] = t.rows
            cells[i] = t.to_numpy().tobytes()
    return pd.DataFrame(
        {"cell_type": cell_type, "cols": cols, "rows": rows, "cells": cells}
    )
