"""Masking functions (SURVEY.md §2.7) — a RasterFrames specialty.

Reference parity: ``core/.../expressions/transformers/Mask*.scala`` and the
bit-mask compositions in ``core/.../functions/LocalFunctions.scala:174-210``.
Semantics: the result keeps the data tile's cell type (promoted to a
NoData-capable variant if needed); cells become NoData where the mask
condition holds.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column

from rasterframes_spark.functions._kernel import binary_tile_op, col_or_name
from rasterframes_spark.functions.local import rf_local_extract_bits

__all__ = [
    "rf_mask", "rf_inverse_mask",
    "rf_mask_by_value", "rf_inverse_mask_by_value", "rf_mask_by_values",
    "rf_mask_by_bit", "rf_mask_by_bits",
]


def _masked_where(a, cond):
    return np.ma.masked_array(a, mask=np.ma.getmaskarray(a) | cond)


def _connect_literal_value(v) -> float:
    """Connect-mode literal introspection: a genuine ``lit()`` column's
    ``_expr`` is a LiteralExpression carrying its value.  Repr parsing
    is NOT a safe substitute — ``F.col('2')`` (a column literally named
    '2') reprs as ``Column<'2'>`` and would silently become the scalar
    2.0; here it has a ColumnReference expr and is rejected."""
    expr = getattr(v, "_expr", None)
    if expr is not None and type(expr).__name__ == "LiteralExpression":
        val = getattr(expr, "_value", None)
        if isinstance(val, (int, float, bool)):
            return float(val)
    raise TypeError(
        "mask_value must be a python scalar or a lit() Column "
        "(per-row mask values are not supported)")


def _literal_value(v) -> float:
    """Accept python scalars AND `F.lit(x)` Columns for mask values — the
    reference API form (`rf_mask_by_value('x', 'x', lit(1))`,
    nodata-handling.pymd).  Only foldable literals qualify: the kernels
    specialize on the scalar, per-row mask values are not supported."""
    if isinstance(v, Column):
        # Spark 4 classic columns wrap ColumnNodes: a genuine lit() is an
        # internal.Literal node carrying its value.
        try:
            node = v._jc.node()
            if node.getClass().getSimpleName() == "Literal":
                return float(node.value())
        except AttributeError:
            # no JVM node to introspect (connect-mode column): use
            # connect's own expression introspection
            return _connect_literal_value(v)
        raise TypeError(
            "mask_value must be a python scalar or a lit() Column "
            "(per-row mask values are not supported)")
    return float(v)


# transformers/MaskByDefined.scala:43-71 — NoData where mask tile is NoData
_mask_plain = binary_tile_op(lambda a, m: _masked_where(a, np.ma.getmaskarray(m)))

# transformers/InverseMaskByDefined.scala:44-72 — NoData where mask HAS data
rf_inverse_mask = binary_tile_op(lambda a, m: _masked_where(a, ~np.ma.getmaskarray(m)))


def rf_mask(tile, mask_tile, inverse: bool = False) -> Column:
    """NoData where the mask tile is NoData; ``inverse=True`` flips to
    NoData where the mask HAS data (the reference python signature,
    rasterfunctions.py:633-640)."""
    if inverse:
        return rf_inverse_mask(tile, mask_tile)
    return _mask_plain(tile, mask_tile)


def rf_mask_by_value(tile, mask_tile, mask_value,
                     inverse: bool = False) -> Column:
    """NoData where mask == value (transformers/MaskByValue.scala:48-85);
    ``inverse=True`` = NoData where mask != value (reference
    rasterfunctions.py:649-668)."""
    if inverse:
        return rf_inverse_mask_by_value(tile, mask_tile, mask_value)
    v = _literal_value(mask_value)
    op = binary_tile_op(lambda a, m: _masked_where(a, np.asarray(m.data, dtype="float64") == v))
    return op.tile_tile(col_or_name(tile), col_or_name(mask_tile))


def rf_inverse_mask_by_value(tile, mask_tile, mask_value) -> Column:
    """NoData where mask != value (transformers/InverseMaskByValue.scala:48-85)."""
    v = _literal_value(mask_value)
    op = binary_tile_op(lambda a, m: _masked_where(a, np.asarray(m.data, dtype="float64") != v))
    return op.tile_tile(col_or_name(tile), col_or_name(mask_tile))


def rf_mask_by_values(tile, mask_tile, values) -> Column:
    """NoData where mask ∈ values (transformers/MaskByValues.scala:49-86)."""
    vals = np.asarray(list(values), dtype="float64")
    op = binary_tile_op(
        lambda a, m: _masked_where(a, np.isin(np.asarray(m.data, dtype="float64"), vals))
    )
    return op.tile_tile(col_or_name(tile), col_or_name(mask_tile))


def rf_mask_by_bit(tile, mask_tile, bit_position, value_to_mask) -> Column:
    """Extract one bit from the mask tile, mask where it equals value
    (functions/LocalFunctions.scala:174-189)."""
    return rf_mask_by_bits(tile, mask_tile, bit_position, 1, [int(value_to_mask)])


def rf_mask_by_bits(tile, mask_tile, start_bit, num_bits, values_to_mask) -> Column:
    """Extract a bitfield from the mask tile and mask-by-values
    (functions/LocalFunctions.scala:191-210) — QA-band workflows."""
    bits = rf_local_extract_bits(mask_tile, start_bit, num_bits)
    return rf_mask_by_values(tile, bits, values_to_mask)
