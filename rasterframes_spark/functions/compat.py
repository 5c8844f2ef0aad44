"""Reference-spelling aliases so pyrasterframes user code runs verbatim.

The reference's Python API (`python/pyrasterframes/rasterfunctions.py`)
exports some operators under names this engine spells differently, plus
typed scalar overloads (`_int`/`_double`) that exist in Scala for overload
resolution. Each alias below delegates to the canonical implementation —
no new semantics, just the reference's exact export surface.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from rasterframes_spark.functions import aggregates as _agg
from rasterframes_spark.functions import constructors as _ctor
from rasterframes_spark.functions import focal as _focal
from rasterframes_spark.functions import local as _local
from rasterframes_spark.tile import CELL_TYPES

__all__ = [
    "rf_agg_local_stats", "rf_agg_local_min", "rf_agg_local_max",
    "rf_agg_local_mean", "rf_agg_local_data_cells", "rf_agg_local_no_data_cells",
    "rf_assemble_tile", "rf_explode_tiles", "rf_explode_tiles_sample",
    "rf_cell_types", "rf_focal_std_dev", "rf_moransI",
    "rf_local_add_double", "rf_local_add_int",
    "rf_local_subtract_double", "rf_local_subtract_int",
    "rf_local_multiply_double", "rf_local_multiply_int",
    "rf_local_divide_double", "rf_local_divide_int",
    "rf_local_less_double", "rf_local_less_int",
    "rf_local_less_equal_double", "rf_local_less_equal_int",
    "rf_local_greater_double", "rf_local_greater_int",
    "rf_local_greater_equal_double", "rf_local_greater_equal_int",
    "rf_local_equal_double", "rf_local_equal_int",
    "rf_local_unequal_double", "rf_local_unequal_int",
]

# DataFrame-level aggregates/generators (the reference exposes these as
# Catalyst aggregate/generator expressions; this engine's canonical forms
# take the DataFrame explicitly — same computation, Spark-first shape).
rf_agg_local_stats = _agg.agg_local_stats
rf_agg_local_min = _agg.agg_local_min
rf_agg_local_max = _agg.agg_local_max
rf_agg_local_mean = _agg.agg_local_mean
rf_agg_local_data_cells = _agg.agg_local_data_cells
rf_agg_local_no_data_cells = _agg.agg_local_no_data_cells
rf_assemble_tile = _ctor.assemble_tiles
rf_explode_tiles = _ctor.explode_tiles


def rf_explode_tiles_sample(df, tile_cols, sample_fraction: float,
                            seed: int | None = None, keep_cols=None):
    """reference rasterfunctions.py rf_explode_tiles_sample."""
    return _ctor.explode_tiles(df, tile_cols, keep_cols=keep_cols,
                               sample_fraction=sample_fraction, seed=seed)


def rf_cell_types() -> list:
    """Supported cell type names (reference rf_cell_types returns the
    GeoTrellis CellType catalog; ours is the engine's CellType.parse set
    plus user-defined-NoData forms like 'uint16ud255')."""
    return list(CELL_TYPES)


rf_focal_std_dev = _focal.rf_focal_stddev
rf_moransI = _focal.rf_focal_moransi


def _typed(op, caster):
    def f(tile, scalar) -> Column:
        return op(tile, caster(scalar))
    return f


# Typed scalar overloads: the Scala API distinguishes Int/Double rhs for
# overload resolution; cell math is identical (numpy promotes), so the
# _int forms truncate the scalar and the _double forms float it.
rf_local_add_double = _typed(_local.rf_local_add, float)
rf_local_add_int = _typed(_local.rf_local_add, int)
rf_local_subtract_double = _typed(_local.rf_local_subtract, float)
rf_local_subtract_int = _typed(_local.rf_local_subtract, int)
rf_local_multiply_double = _typed(_local.rf_local_multiply, float)
rf_local_multiply_int = _typed(_local.rf_local_multiply, int)
rf_local_divide_double = _typed(_local.rf_local_divide, float)
rf_local_divide_int = _typed(_local.rf_local_divide, int)
rf_local_less_double = _typed(_local.rf_local_less, float)
rf_local_less_int = _typed(_local.rf_local_less, int)
rf_local_less_equal_double = _typed(_local.rf_local_less_equal, float)
rf_local_less_equal_int = _typed(_local.rf_local_less_equal, int)
rf_local_greater_double = _typed(_local.rf_local_greater, float)
rf_local_greater_int = _typed(_local.rf_local_greater, int)
rf_local_greater_equal_double = _typed(_local.rf_local_greater_equal, float)
rf_local_greater_equal_int = _typed(_local.rf_local_greater_equal, int)
rf_local_equal_double = _typed(_local.rf_local_equal, float)
rf_local_equal_int = _typed(_local.rf_local_equal, int)
rf_local_unequal_double = _typed(_local.rf_local_unequal, float)
rf_local_unequal_int = _typed(_local.rf_local_unequal, int)
