"""Space-filling-curve spatial indexing (SURVEY.md §2.11).

Reference: GeoMesa Z2/XZ2 SFCs wrapped by ``transformers/Z2Indexer.scala:57-97``
and ``XZ2Indexer.scala:56-102``; default resolutions 31 (Z2) and 18 (XZ2),
WGS84 domain. Pure bit-interleave math — vectorized numpy, no dependencies.

Z2: interleave normalized (x, y) bits — for points / extent centroids.
XZ2: extended Z-curve for *extents* (GeoMesa XZ2 paper: Böhm et al. XZ-ordering);
here implemented as the standard large-object variant: the index of the
smallest enclosing quadrant cell, encoded as a prefix code — preserves the
"intersecting extents share index prefixes" property used for pre-joins.
"""

from __future__ import annotations

import numpy as np

WGS84_BOUNDS = (-180.0, -90.0, 180.0, 90.0)


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each int64 so bit i -> bit 2i."""
    v = v.astype(np.int64) & 0xFFFFFFFF
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def z2_index(x: np.ndarray, y: np.ndarray, resolution: int = 31,
             bounds=WGS84_BOUNDS) -> np.ndarray:
    """Morton/Z2 index of points at `resolution` bits per dimension.
    Null/NaN coordinates propagate as None (an object array when any are
    present) — NaN previously encoded to index 0, colliding with the
    legitimate corner-cell index and spuriously equi-joining null rows."""
    resolution = int(resolution)
    if not 1 <= resolution <= 31:
        # 32+ would push y's top interleaved bit into the int64 sign bit:
        # negative indexes that break z2 range-prefix joins
        raise ValueError(f"z2_index: resolution must be in [1, 31], "
                         f"got {resolution}")
    xa = np.asarray(x, dtype="float64")
    ya = np.asarray(y, dtype="float64")
    bad = ~(np.isfinite(xa) & np.isfinite(ya))
    xmin, ymin, xmax, ymax = bounds
    nx = np.clip((np.nan_to_num(xa, nan=xmin) - xmin) / (xmax - xmin), 0, 1)
    ny = np.clip((np.nan_to_num(ya, nan=ymin) - ymin) / (ymax - ymin), 0, 1)
    scale = (1 << resolution) - 1
    xi = np.minimum((nx * (1 << resolution)).astype(np.int64), scale)
    yi = np.minimum((ny * (1 << resolution)).astype(np.int64), scale)
    out = (_spread_bits32(xi) | (_spread_bits32(yi) << 1)).astype(np.int64)
    if bad.any():
        res = out.astype(object)
        res[bad] = None
        return res
    return out


def xz2_index(xmin, ymin, xmax, ymax, resolution: int = 18,
              bounds=WGS84_BOUNDS) -> np.ndarray:
    """XZ2-style index for extents: quadtree cell id of the smallest
    quadrant fully containing the (doubled, per XZ 'extended element')
    extent, at max depth `resolution`.

    Intersecting extents land in cells on the same root-to-leaf path, so an
    equi-join on truncated indexes + exact post-filter reproduces GeoMesa's
    XZ2 pre-join semantics (used by raster_join's prefilter).
    """
    resolution = int(resolution)
    if not 1 <= resolution <= 28:
        # the prefix code occupies 2*resolution bits plus a 6-bit depth
        # tag; 29+ overflows into the int64 sign bit
        raise ValueError(f"xz2_index: resolution must be in [1, 28], "
                         f"got {resolution}")
    bx0, by0, bx1, by1 = bounds
    w, h = bx1 - bx0, by1 - by0
    xa0 = np.asarray(xmin, dtype="float64")
    ya0 = np.asarray(ymin, dtype="float64")
    xa1 = np.asarray(xmax, dtype="float64")
    ya1 = np.asarray(ymax, dtype="float64")
    bad = ~(np.isfinite(xa0) & np.isfinite(ya0)
            & np.isfinite(xa1) & np.isfinite(ya1))
    x0 = np.clip((np.nan_to_num(xa0, nan=bx0) - bx0) / w, 0, 1)
    y0 = np.clip((np.nan_to_num(ya0, nan=by0) - by0) / h, 0, 1)
    x1 = np.clip((np.nan_to_num(xa1, nan=bx0) - bx0) / w, 0, 1)
    y1 = np.clip((np.nan_to_num(ya1, nan=by0) - by0) / h, 0, 1)

    # depth of the smallest cell that can hold the extent (XZ doubling rule)
    ext = np.maximum(x1 - x0, y1 - y0)
    with np.errstate(divide="ignore"):
        depth = np.where(ext <= 0, resolution, np.floor(-np.log2(np.maximum(ext, 1e-300)))).astype(np.int64)
    depth = np.clip(depth, 0, resolution)

    # cell coordinates at that depth, from the extent's lower-left corner
    size = np.power(2.0, depth)
    cx = np.minimum((x0 * size).astype(np.int64), (size - 1).astype(np.int64))
    cy = np.minimum((y0 * size).astype(np.int64), (size - 1).astype(np.int64))
    morton = _spread_bits32(cx) | (_spread_bits32(cy) << 1)
    # prefix-code: shift morton to a fixed 2*resolution-bit field + depth tag
    idx = (morton << (2 * (resolution - depth))).astype(np.int64)
    out = (idx << 6) | depth  # 6 bits of depth tag keeps indexes unique per level
    if bad.any():
        res = out.astype(object)
        res[bad] = None  # null extents propagate as null, not index 0+tag
        return res
    return out


def z2_ranges(xmin, ymin, xmax, ymax, resolution: int = 31, max_depth: int = 8,
              bounds=WGS84_BOUNDS) -> list[tuple[int, int]]:
    """Decompose a query extent into Z2 index ranges (quadtree descent).

    Returns [(lo, hi)] such that every point inside the extent has a Z2
    index (at `resolution`) within one of the ranges — the filter-pushdown
    primitive: ``WHERE z2 BETWEEN lo AND hi OR ...`` prunes Parquet row
    groups / partitions of a Z2-sorted layer (SURVEY.md §4: the reference's
    spatial pushdown is stubbed; a sorted column + ranges gets it free).
    """
    bx0, by0, bx1, by1 = bounds
    qx0 = max((xmin - bx0) / (bx1 - bx0), 0.0)
    qy0 = max((ymin - by0) / (by1 - by0), 0.0)
    qx1 = min((xmax - bx0) / (bx1 - bx0), 1.0)
    qy1 = min((ymax - by0) / (by1 - by0), 1.0)
    out: list[tuple[int, int]] = []

    def cell_range(prefix: int, depth: int) -> tuple[int, int]:
        shift = 2 * (resolution - depth)
        lo = prefix << shift
        return lo, lo + (1 << shift) - 1

    def descend(prefix: int, depth: int, cx0: float, cy0: float, size: float):
        cx1, cy1 = cx0 + size, cy0 + size
        if cx0 > qx1 or cx1 < qx0 or cy0 > qy1 or cy1 < qy0:
            return
        if (qx0 <= cx0 and cx1 <= qx1 and qy0 <= cy0 and cy1 <= qy1) or depth >= max_depth:
            out.append(cell_range(prefix, depth))
            return
        half = size / 2
        for qy in (0, 1):
            for qx in (0, 1):
                descend((prefix << 2) | (qy << 1) | qx, depth + 1,
                        cx0 + qx * half, cy0 + qy * half, half)

    descend(0, 0, 0.0, 0.0, 1.0)
    # merge adjacent ranges
    out.sort()
    merged = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def grid_cells(xmin, ymin, xmax, ymax, cell_size: float) -> list[int]:
    """All fixed-grid cell ids an extent overlaps (cell = floor(coord/size)
    pair packed into one int64). The spatial-join bucketing primitive: both
    sides explode to their covering cells, equi-join on cell id, then apply
    the exact predicate — turns a BNLJ into a shuffle hash join (SURVEY.md §4
    'join strategy' improvement opportunity)."""
    cx0 = int(np.floor(xmin / cell_size))
    cx1 = int(np.floor(xmax / cell_size))
    cy0 = int(np.floor(ymin / cell_size))
    cy1 = int(np.floor(ymax / cell_size))

    def pack(cx: int, cy: int) -> int:
        v = ((cx & 0xFFFFFFFF) << 32) | (cy & 0xFFFFFFFF)
        return v - (1 << 64) if v >= (1 << 63) else v  # two's-complement int64

    return [pack(cx, cy) for cx in range(cx0, cx1 + 1) for cy in range(cy0, cy1 + 1)]
