"""Tile constructors, converters, and the explode/assemble pair
(SURVEY.md §2.10 generators + §2.11 converters).

- ``rf_explode_tiles``: reference is a Catalyst Generator
  (``core/.../expressions/generators/ExplodeTiles.scala:40-111``). Here it
  is a DataFrame-level helper built from a tile→array kernel + posexplode,
  which Catalyst plans as a whole-stage-codegen Generate — no Python in the
  row-expansion hot path, only one Arrow pass to flatten each tile.
- ``rf_assemble_tile``: reference is a TypedImperativeAggregate
  (``core/.../expressions/TileAssembler.scala:60-199``); here an
  ``applyInPandas`` group map (NoData-fill + scatter), used via
  ``assemble_tiles`` or as an agg-style helper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from rasterframes_spark.tile import (
    CellType,
    Tile,
    TILE_SCHEMA,
    decode_struct_pdf,
    tiles_to_struct_pdf,
)
from rasterframes_spark.functions._kernel import lazy_pandas_udf, col_or_name

__all__ = [
    "rf_make_constant_tile", "rf_make_zeros_tile", "rf_make_ones_tile",
    "rf_array_to_tile", "rf_tile_to_array_double", "rf_tile_to_array_int",
    "explode_tiles", "assemble_tiles", "rf_convert_cell_type",
    "rf_interpret_cell_type_as", "rf_with_no_data",
]


# -- constant tiles (core/.../functions/package.scala:80-100) ----------------


def rf_make_constant_tile(value, cols: int, rows: int, cell_type: str = "float64") -> Column:
    ct = CellType.parse(cell_type)
    tile = Tile(np.full((rows, cols), value, dtype=ct.dtype), ct)
    row = tile.to_row()
    return F.struct(
        F.lit(row["cell_type"]).alias("cell_type"),
        F.lit(row["cols"]).cast("int").alias("cols"),
        F.lit(row["rows"]).cast("int").alias("rows"),
        F.lit(row["cells"]).alias("cells"),
    )


def rf_make_zeros_tile(cols: int, rows: int, cell_type: str = "float64") -> Column:
    return rf_make_constant_tile(0, cols, rows, cell_type)


def rf_make_ones_tile(cols: int, rows: int, cell_type: str = "float64") -> Column:
    return rf_make_constant_tile(1, cols, rows, cell_type)


# -- array <-> tile (functions/package.scala:61-77; transformers/TileToArray*) --


def rf_array_to_tile(array_col, cols: int, rows: int, cell_type: str = "float64") -> Column:
    """array<numeric> + dims -> tile. Null array elements become NoData."""
    nc, nr = int(cols), int(rows)
    ct = CellType.parse(cell_type)

    @pandas_udf(TILE_SCHEMA)
    def udf(arrs: pd.Series) -> pd.DataFrame:
        out = []
        for a in arrs.values:
            if a is None:
                out.append(None)
                continue
            vals = np.asarray(a, dtype="float64")
            mask = np.isnan(vals)
            vals = np.where(mask, 0, vals).reshape(nr, nc)
            out.append(Tile(np.ma.masked_array(vals.astype(ct.dtype), mask=mask.reshape(nr, nc)), ct))
        return tiles_to_struct_pdf(out)

    return udf(col_or_name(array_col))


@lazy_pandas_udf("array<double>")
def _tile_to_array_double_udf(t: pd.DataFrame) -> pd.Series:
    tiles = decode_struct_pdf(t)
    out = []
    for tile in tiles:
        if tile is None:
            out.append(None)
        else:
            a = tile.masked().astype("float64")
            out.append(a.filled(np.nan).ravel())
    return pd.Series(out, dtype=object)


def rf_tile_to_array_double(tile) -> Column:
    """tile -> flat array<double>, NoData as NaN/null
    (transformers/TileToArrayDouble.scala:40)."""
    return _tile_to_array_double_udf(col_or_name(tile))


@lazy_pandas_udf("array<int>")
def _tile_to_array_int_udf(t: pd.DataFrame) -> pd.Series:
    tiles = decode_struct_pdf(t)
    out = []
    for tile in tiles:
        if tile is None:
            out.append(None)
        else:
            out.append(tile.masked().filled(tile.cell_type.nodata or 0).astype("int32").ravel())
    return pd.Series(out, dtype=object)


def rf_tile_to_array_int(tile) -> Column:
    return _tile_to_array_int_udf(col_or_name(tile))


# -- explode / assemble -------------------------------------------------------


def explode_tiles(df: DataFrame, tile_cols: list, keep_cols: list | None = None,
                  sample_fraction: float | None = None, seed: int = 42) -> DataFrame:
    """tile column(s) -> one row per cell: (*keep, column_index, row_index, <name>...).

    Reference: generators/ExplodeTiles.scala:40-111. Multi-column requires
    equal dims (enforced there at :72-75; here the first tile defines dims and
    mismatches error inside the kernel). The expansion itself is Spark's
    codegen'd posexplode over a flat array — scale-safe: the Python boundary
    is crossed once per tile, not per cell.
    """
    tile_cols = [c if isinstance(c, str) else c._jc.toString() for c in tile_cols]
    keep_cols = keep_cols if keep_cols is not None else [
        c for c in df.columns if c not in tile_cols
    ]
    first = tile_cols[0]
    arrs = [rf_tile_to_array_double(F.col(c)).alias(f"__arr_{c}") for c in tile_cols]
    cols_f = F.col(first).getField("cols")
    out = (
        df.select(*keep_cols, cols_f.alias("__cols"), *arrs)
        .select(
            *keep_cols,
            F.col("__cols"),
            F.posexplode(F.col(f"__arr_{first}")).alias("__pos", f"{first}__cell"),
            *[F.col(f"__arr_{c}") for c in tile_cols[1:]],
        )
        .select(
            *keep_cols,
            (F.col("__pos") % F.col("__cols")).cast("int").alias("column_index"),
            (F.col("__pos") / F.col("__cols")).cast("int").alias("row_index"),
            F.col(f"{first}__cell").alias(first),
            *[
                F.col(f"__arr_{c}")[F.col("__pos")].alias(c)
                for c in tile_cols[1:]
            ],
        )
    )
    if sample_fraction is not None and sample_fraction < 1.0:
        out = out.sample(fraction=sample_fraction, seed=seed)
    return out


def assemble_tiles(df: DataFrame, group_cols: list, col_index, row_index, cell,
                   cols: int, rows: int, cell_type: str = "float64",
                   method: str = "auto") -> DataFrame:
    """Inverse of explode: (col_idx,row_idx,value) rows -> one tile per group.

    Reference: TileAssembler.scala:60-199 (TypedImperativeAggregate).
    Missing cells are NoData. ``cell`` may be a list of value columns — all
    bands assemble in ONE shuffle pass, one tile column per value column.

    method='collect' (default): the cell traffic stays JVM-side — a codegen'd
    hash aggregate of ``collect_list(struct(pos, v))`` (map-side partial
    collect applies), then Python receives just two flat arrays per GROUP
    (not per cell) and does one numpy scatter. ~5x less Arrow volume than
    streaming raw cell rows through a group map.

    method='group_map': applyInPandas over raw cell rows — faster for LARGE
    tiles (the JVM array_sort of a 65k-struct list costs more than streaming
    the rows). method='auto' (default) picks collect for tiles <= 8k cells.
    """
    nc, nr = int(cols), int(rows)
    if method == "auto":
        method = "collect" if nr * nc <= 8192 else "group_map"
    ct = CellType.parse(cell_type)
    ci = col_index if isinstance(col_index, str) else col_index._jc.toString()
    ri = row_index if isinstance(row_index, str) else row_index._jc.toString()
    cells = cell if isinstance(cell, (list, tuple)) else [cell]
    cvs = [c if isinstance(c, str) else c._jc.toString() for c in cells]
    single = not isinstance(cell, (list, tuple))
    out_names = ["tile"] if single else list(cvs)

    if method == "collect":
        pos = (F.col(ri).cast("long") * nc + F.col(ci).cast("long")).alias("__pos")
        aggs = [
            F.array_sort(
                F.collect_list(F.struct(pos.alias("pos"), F.col(cv).cast("double").alias("v")))
            ).alias(f"__arr_{cv}")
            for cv in cvs
        ]
        grouped = df.groupBy(*group_cols).agg(*aggs)

        @lazy_pandas_udf(TILE_SCHEMA)
        def scatter(poss: pd.Series, vals: pd.Series) -> pd.DataFrame:
            out = []
            for p, v in zip(poss.values, vals.values):
                if p is None:
                    out.append(None)
                    continue
                flat = np.full(nr * nc, np.nan, dtype="float64")
                flat[np.asarray(p, dtype="int64")] = np.asarray(v, dtype="float64")
                arr = flat.reshape(nr, nc)
                mask = np.isnan(arr)
                out.append(Tile(np.ma.masked_array(
                    np.where(mask, 0, arr).astype(ct.dtype), mask=mask), ct))
            return tiles_to_struct_pdf(out)

        sel = list(group_cols)
        for cv, name in zip(cvs, out_names):
            arr = F.col(f"__arr_{cv}")
            sel.append(scatter(
                F.transform(arr, lambda x: x.getField("pos")),
                F.transform(arr, lambda x: x.getField("v")),
            ).alias(name))
        return grouped.select(*sel)

    from pyspark.sql.types import StructType, StructField
    in_schema = df.select(*group_cols).schema
    out_schema = StructType(
        list(in_schema.fields) + [StructField(n, TILE_SCHEMA, True) for n in out_names]
    )

    def make(key, pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf[ri].to_numpy(dtype="int64")
        c = pdf[ci].to_numpy(dtype="int64")
        out = {g: [k] for g, k in zip([f.name for f in in_schema.fields], key)}
        for cv, name in zip(cvs, out_names):
            vals = np.full((nr, nc), np.nan, dtype="float64")
            vals[r, c] = pdf[cv].to_numpy(dtype="float64")
            mask = np.isnan(vals)
            tile = Tile(np.ma.masked_array(
                np.where(mask, 0, vals).astype(ct.dtype), mask=mask), ct)
            out[name] = [tile.to_row()]
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(make, schema=out_schema)


# -- cell-type conversion (transformers/SetCellType.scala:56-96 etc.) --------


def rf_convert_cell_type(tile, cell_type: str) -> Column:
    """Convert cells + NoData semantics (SetCellType.scala:56-96)."""
    ct = CellType.parse(cell_type)

    @pandas_udf(TILE_SCHEMA)
    def udf(t: pd.DataFrame) -> pd.DataFrame:
        tiles = decode_struct_pdf(t)
        out = []
        for tl in tiles:
            if tl is None:
                out.append(None)
            else:
                out.append(Tile(tl.masked(), ct))
        return tiles_to_struct_pdf(out)

    return udf(col_or_name(tile))


def rf_interpret_cell_type_as(tile, cell_type: str) -> Column:
    """Reinterpret raw bits without value conversion (InterpretAs.scala:51-92)."""
    ct = CellType.parse(cell_type)

    @pandas_udf(TILE_SCHEMA)
    def udf(t: pd.DataFrame) -> pd.DataFrame:
        tiles = decode_struct_pdf(t)
        out = []
        for tl in tiles:
            if tl is None:
                out.append(None)
            else:
                raw = tl.masked().data.view(ct.dtype) if tl.cell_type.dtype.itemsize == ct.dtype.itemsize else tl.masked().data.astype(ct.dtype)
                out.append(Tile(np.ma.masked_array(raw, mask=ct.mask_of(raw)), ct))
        return tiles_to_struct_pdf(out)

    return udf(col_or_name(tile))


def rf_with_no_data(tile, nodata_value) -> Column:
    """Set a new NoData value; cells equal to it become NoData
    (SetNoDataValue.scala:47-82)."""
    nd = nodata_value

    @pandas_udf(TILE_SCHEMA)
    def udf(t: pd.DataFrame) -> pd.DataFrame:
        tiles = decode_struct_pdf(t)
        out = []
        for tl in tiles:
            if tl is None:
                out.append(None)
                continue
            ct = CellType.from_numpy(tl.cell_type.dtype, nd)
            a = tl.masked()
            newmask = np.ma.getmaskarray(a) | (np.asarray(a.data) == ct.nodata)
            out.append(Tile(np.ma.masked_array(a.data, mask=newmask), ct))
        return tiles_to_struct_pdf(out)

    return udf(col_or_name(tile))
