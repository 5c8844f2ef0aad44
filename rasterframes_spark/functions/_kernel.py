"""Kernel framework: lift numpy functions over masked arrays into
Arrow-vectorized pandas UDFs over tile struct columns.

This is the engine's replacement for the reference's Catalyst-expression
zoo (``core/.../expressions/``): instead of per-row JVM ``eval`` with
CodegenFallback (see SURVEY.md §3.2), each kernel receives an Arrow batch,
decodes tile structs to ``numpy.ma`` arrays, applies a SIMD numpy ufunc,
and re-encodes. NoData == mask propagation comes free from ``numpy.ma``.

Scale notes: kernels are stateless and embarrassingly parallel — one
Python worker per core, Arrow batches of whole tiles. The per-row Python
loop is over *tiles* (~64K cells each), so interpreter overhead is
amortized ~1e4× per iteration.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

from rasterframes_spark.tile import (
    CellType,
    Tile,
    TILE_SCHEMA,
    decode_struct_pdf,
    tiles_to_struct_pdf,
)

__all__ = [
    "col_or_name",
    "lazy_pandas_udf",
    "unary_tile_op",
    "binary_tile_op",
    "tile_to_scalar",
]


def col_or_name(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lazy_pandas_udf(return_type):
    """Defer pandas_udf creation until first call — DDL-string return types
    need an active SparkSession to parse, and this package must be importable
    without one (driver imports __spark_entry__ before building the session)."""
    import functools

    def deco(fn):
        holder: dict = {}

        @functools.wraps(fn)
        def call(*cols):
            if "udf" not in holder:
                holder["udf"] = pandas_udf(return_type)(fn)
            return holder["udf"](*cols)

        call.fn = fn
        call.returnType = return_type
        return call

    return deco


def _result_cell_type(out_ct: str | None, *inputs: Tile) -> CellType | None:
    if out_ct is not None:
        return CellType.parse(out_ct)
    return None  # derive from result dtype


def _encode_result(res: np.ndarray | np.ma.MaskedArray, out_ct: CellType | None) -> Tile:
    if not isinstance(res, np.ma.MaskedArray):
        res = np.ma.masked_array(res)
    if out_ct is None:
        ct = CellType.from_numpy(res.dtype, "default")
    else:
        ct = out_ct
    return Tile(res, ct)


def unary_tile_op(fn: Callable[[np.ma.MaskedArray], np.ma.MaskedArray], out_ct: str | None = None):
    """(tile) -> tile column function from a masked-array kernel."""
    octype = CellType.parse(out_ct) if out_ct else None

    @pandas_udf(TILE_SCHEMA)
    def udf(t: pd.DataFrame) -> pd.DataFrame:
        tiles = decode_struct_pdf(t)
        out: list[Tile | None] = []
        for tile in tiles:
            if tile is None:
                out.append(None)
            else:
                out.append(_encode_result(fn(tile.masked()), octype))
        return tiles_to_struct_pdf(out)

    def op(tile) -> Column:
        return udf(col_or_name(tile))

    return op


def binary_tile_op(
    fn: Callable[[np.ma.MaskedArray, np.ma.MaskedArray | float], np.ma.MaskedArray],
    out_ct: str | None = None,
):
    """(tile, tile|scalar) -> tile column function.

    Mirrors the reference's ``BinaryRasterFunction`` dispatch
    (``core/.../expressions/BinaryRasterFunction.scala:34``): the rhs may be
    a tile column or a numeric scalar/column. A python numeric is lifted to
    a literal; a Column rhs is probed as tile-struct first with a numeric
    fallback handled by a separate scalar UDF at call time.
    """
    octype = CellType.parse(out_ct) if out_ct else None

    @pandas_udf(TILE_SCHEMA)
    def udf_tt(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        ta, tb = decode_struct_pdf(a), decode_struct_pdf(b)
        out: list[Tile | None] = []
        for x, y in zip(ta, tb):
            if x is None or y is None:
                out.append(None)
            else:
                out.append(_encode_result(fn(x.masked(), y.masked()), octype))
        return tiles_to_struct_pdf(out)

    @pandas_udf(TILE_SCHEMA)
    def udf_ts(a: pd.DataFrame, b: pd.Series) -> pd.DataFrame:
        ta = decode_struct_pdf(a)
        bv = b.values
        out: list[Tile | None] = []
        for i, x in enumerate(ta):
            y = bv[i]
            if x is None or y is None or (isinstance(y, float) and np.isnan(y)):
                out.append(None)
            else:
                out.append(_encode_result(fn(x.masked(), float(y)), octype))
        return tiles_to_struct_pdf(out)

    def op(left, right) -> Column:
        left = col_or_name(left)
        if isinstance(right, (int, float, np.integer, np.floating)):
            return udf_ts(left, F.lit(float(right)).cast("double"))
        right = col_or_name(right)
        return udf_tt(left, right)

    op.scalar = lambda left, right: udf_ts(col_or_name(left), col_or_name(right).cast("double"))
    op.tile_tile = lambda left, right: udf_tt(col_or_name(left), col_or_name(right))
    return op


def tile_to_scalar(fn: Callable[[np.ma.MaskedArray], object], return_type: str):
    """(tile) -> scalar column function (double/long/boolean)."""

    @lazy_pandas_udf(return_type)
    def udf(t: pd.DataFrame) -> pd.Series:
        tiles = decode_struct_pdf(t)
        out = []
        for tile in tiles:
            if tile is None:
                out.append(None)
            else:
                v = fn(tile.masked())
                if v is np.ma.masked:
                    v = None
                out.append(v)
        return pd.Series(out, dtype=object)

    def op(tile) -> Column:
        return udf(col_or_name(tile))

    return op
