"""Spark-ML integration (SURVEY.md §2.13).

- ``TileExploder``: pyspark.ml Transformer turning tile columns into
  per-cell rows (column_index, row_index, <band>...) so VectorAssembler /
  KMeans / RandomForest pipelines consume cells as features
  (``core/.../ml/TileExploder.scala:30-60``).
- ``NoDataFilter``: drops rows with null/NoData in the given columns
  (``core/.../ml/NoDataFilter.scala:45-55`` — literally dataset.na.drop).
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param.shared import Param, Params
from pyspark.sql import DataFrame, functions as F

__all__ = ["TileExploder", "NoDataFilter"]


class TileExploder(Transformer):
    """Explode tile columns to one row per cell."""

    tileCols = Param(Params._dummy(), "tileCols", "tile columns to explode")

    @keyword_only
    def __init__(self, tileCols: list[str] | None = None):
        super().__init__()
        self._setDefault(tileCols=None)
        self._set(tileCols=tileCols)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from rasterframes_spark.functions.constructors import explode_tiles
        from rasterframes_spark.tile import TILE_SCHEMA

        cols = self.getOrDefault(self.tileCols)
        if cols is None:
            cols = [
                f.name for f in dataset.schema.fields
                if str(f.dataType) == str(TILE_SCHEMA)
            ]
        out = explode_tiles(dataset, cols)
        # drop rows where every exploded cell is null (NoData padding)
        cond = None
        for c in cols:
            p = F.col(c).isNotNull() & ~F.isnan(F.col(c))
            cond = p if cond is None else (cond | p)
        return out.where(cond) if cond is not None else out


class NoDataFilter(Transformer):
    """Drop rows with nulls in the given columns (ml/NoDataFilter.scala)."""

    filterCols = Param(Params._dummy(), "filterCols", "columns to require non-null")

    @keyword_only
    def __init__(self, filterCols: list[str] | None = None):
        super().__init__()
        self._setDefault(filterCols=None)
        self._set(filterCols=filterCols or [])

    def _transform(self, dataset: DataFrame) -> DataFrame:
        cols = self.getOrDefault(self.filterCols) or dataset.columns
        return dataset.na.drop(subset=cols)
