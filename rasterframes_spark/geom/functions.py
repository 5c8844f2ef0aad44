"""The st_* vector function surface (SURVEY.md §2.12, §2.2) plus
extent/geometry converters (§2.11) and SFC indexes.

Geometry columns are WKB ``BinaryType`` (the reference's Python side also
round-trips WKB through its GeometryUDT, ``python/geomesa_pyspark/types.py``).
All kernels are Arrow-vectorized pandas UDFs over the pure-python geometry
core. Extent-typed args are ``struct{xmin,ymin,xmax,ymax}``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F

from rasterframes_spark.functions._kernel import col_or_name, lazy_pandas_udf
from rasterframes_spark.geom import core as G
from rasterframes_spark.geom import proj as P
from rasterframes_spark.geom import relate as R
from rasterframes_spark.geom import sfc

__all__ = [
    "st_point", "st_make_point", "st_geom_from_wkt", "st_geom_from_wkb",
    "st_as_text", "st_as_binary", "st_geometry_type",
    "st_x", "st_y", "st_centroid", "st_envelope",
    "st_area", "st_length", "st_distance", "st_distance_sphere",
    "st_intersects", "st_contains", "st_within", "st_disjoint",
    "st_covers", "st_covered_by", "st_touches", "st_crosses", "st_overlaps",
    "st_relate", "st_relate_bool",
    "st_equals", "st_translate", "st_buffer_point",
    "st_geohash", "st_reproject", "st_extent", "st_geometry",
    "st_geom_from_geohash", "st_exterior_ring", "st_num_points",
    "st_is_valid", "st_length_sphere", "st_closest_point", "st_as_geojson",
    "rf_z2_index", "rf_xz2_index", "rf_spatial_grid_cells", "rf_mk_crs",
    "extent_struct",
]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _geoms(s: pd.Series):
    return [None if b is None else G.wkb_loads(bytes(b)) for b in s.values]


def _wkb_series(geoms) -> pd.Series:
    return pd.Series([None if g is None else G.wkb_dumps(g) for g in geoms], dtype=object)


def _unary_scalar(fn, rtype):
    @lazy_pandas_udf(rtype)
    def udf(s: pd.Series) -> pd.Series:
        return pd.Series([None if g is None else fn(g) for g in _geoms(s)], dtype=object)
    return udf


def _binary_pred(fn):
    @lazy_pandas_udf("boolean")
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        ga, gb = _geoms(a), _geoms(b)
        return pd.Series(
            [None if (x is None or y is None) else bool(fn(x, y)) for x, y in zip(ga, gb)],
            dtype=object,
        )
    return udf


def extent_struct(xmin, ymin, xmax, ymax) -> Column:
    return F.struct(
        col_or_name(xmin).cast("double").alias("xmin"),
        col_or_name(ymin).cast("double").alias("ymin"),
        col_or_name(xmax).cast("double").alias("xmax"),
        col_or_name(ymax).cast("double").alias("ymax"),
    )


# ---------------------------------------------------------------------------
# constructors / casts / serializers
# ---------------------------------------------------------------------------


@lazy_pandas_udf("binary")
def _point_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(
        [None if (a is None or b is None) else G.wkb_dumps(("Point", (float(a), float(b))))
         for a, b in zip(x.values, y.values)],
        dtype=object,
    )


def st_point(x, y) -> Column:
    """Point constructor (geomesa st_point / st_makePoint)."""
    return _point_udf(col_or_name(x).cast("double"), col_or_name(y).cast("double"))


st_make_point = st_point


@lazy_pandas_udf("binary")
def _from_wkt_udf(s: pd.Series) -> pd.Series:
    return pd.Series(
        [None if t is None else G.wkb_dumps(G.wkt_loads(t)) for t in s.values], dtype=object
    )


def st_geom_from_wkt(wkt) -> Column:
    return _from_wkt_udf(col_or_name(wkt))


def st_geom_from_wkb(wkb) -> Column:
    """WKB is the native format — identity passthrough (validity unchecked)."""
    return col_or_name(wkb)


def st_as_binary(geom) -> Column:
    return col_or_name(geom)


_as_text = _unary_scalar(G.wkt_dumps, "string")


def st_as_text(geom) -> Column:
    return _as_text(col_or_name(geom))


_geom_type = _unary_scalar(lambda g: g[0], "string")


def st_geometry_type(geom) -> Column:
    return _geom_type(col_or_name(geom))


# ---------------------------------------------------------------------------
# accessors / measures
# ---------------------------------------------------------------------------

_x = _unary_scalar(lambda g: float(g[1][0]) if g[0] == "Point" else None, "double")
_y = _unary_scalar(lambda g: float(g[1][1]) if g[0] == "Point" else None, "double")


def st_x(geom) -> Column:
    return _x(col_or_name(geom))


def st_y(geom) -> Column:
    return _y(col_or_name(geom))


_centroid = _unary_scalar(lambda g: G.wkb_dumps(("Point", G.centroid(g))), "binary")


def st_centroid(geom) -> Column:
    return _centroid(col_or_name(geom))


@lazy_pandas_udf("struct<xmin:double,ymin:double,xmax:double,ymax:double>")
def _envelope_udf(s: pd.Series) -> pd.DataFrame:
    rows = []
    for g in _geoms(s):
        if g is None:
            rows.append((None,) * 4)
        else:
            rows.append(tuple(float(v) for v in G.envelope(g)))
    return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])


def st_envelope(geom) -> Column:
    """Bounding box as an extent struct (geomesa st_envelope returns a
    geometry; the extent struct is this engine's canonical bbox — use
    st_geometry to polygonize)."""
    return _envelope_udf(col_or_name(geom))


st_extent = st_envelope  # transformers/GeometryToExtent.scala:40

_area = _unary_scalar(lambda g: float(G.area(g)), "double")
_length = _unary_scalar(lambda g: float(G.length(g)), "double")


def st_area(geom) -> Column:
    return _area(col_or_name(geom))


def st_length(geom) -> Column:
    return _length(col_or_name(geom))


@lazy_pandas_udf("double")
def _distance_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ga, gb = _geoms(a), _geoms(b)
    return pd.Series(
        [None if (x is None or y is None) else float(G.distance(x, y)) for x, y in zip(ga, gb)],
        dtype=object,
    )


def st_distance(a, b) -> Column:
    return _distance_udf(col_or_name(a), col_or_name(b))


@lazy_pandas_udf("double")
def _distance_sphere_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ga, gb = _geoms(a), _geoms(b)
    out = []
    for x, y in zip(ga, gb):
        if x is None or y is None or x[0] != "Point" or y[0] != "Point":
            out.append(None)
        else:
            out.append(float(G.distance_sphere(x[1], y[1])))
    return pd.Series(out, dtype=object)


def st_distance_sphere(a, b) -> Column:
    """Haversine meters between lon/lat points (geomesa st_distanceSphere)."""
    return _distance_sphere_udf(col_or_name(a), col_or_name(b))


# ---------------------------------------------------------------------------
# predicates (SpatialRelation.scala:74-114 re-expressed; DE-9IM semantics
# from geom/relate.py)
# ---------------------------------------------------------------------------

_intersects = _binary_pred(G.intersects)
_contains = _binary_pred(R.contains)
_within = _binary_pred(R.within)
_disjoint = _binary_pred(G.disjoint)
_equals = _binary_pred(G.equals)
_covers = _binary_pred(R.covers)
_covered_by = _binary_pred(R.covered_by)
_touches = _binary_pred(R.touches)
_crosses = _binary_pred(R.crosses)
_overlaps = _binary_pred(R.overlaps)


@lazy_pandas_udf("string")
def _relate_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ga, gb = _geoms(a), _geoms(b)
    return pd.Series(
        [None if (x is None or y is None) else R.relate_matrix(x, y)
         for x, y in zip(ga, gb)],
        dtype=object,
    )


def st_intersects(a, b) -> Column:
    return _intersects(col_or_name(a), col_or_name(b))


def st_contains(a, b) -> Column:
    """Strict OGC contains: a geometry lying wholly in the boundary is
    covered but not contained (SpatialRelation.scala:84)."""
    return _contains(col_or_name(a), col_or_name(b))


def st_within(a, b) -> Column:
    return _within(col_or_name(a), col_or_name(b))


def st_disjoint(a, b) -> Column:
    return _disjoint(col_or_name(a), col_or_name(b))


def st_covers(a, b) -> Column:
    """Boundary-inclusive containment (SpatialRelation.scala:88)."""
    return _covers(col_or_name(a), col_or_name(b))


def st_covered_by(a, b) -> Column:
    return _covered_by(col_or_name(a), col_or_name(b))


def st_touches(a, b) -> Column:
    """Boundaries meet, interiors do not (SpatialRelation.scala:98)."""
    return _touches(col_or_name(a), col_or_name(b))


def st_crosses(a, b) -> Column:
    """Interiors meet in a lower dimension than the higher-dimensional
    argument (SpatialRelation.scala:92)."""
    return _crosses(col_or_name(a), col_or_name(b))


def st_overlaps(a, b) -> Column:
    """Same-dimension interiors partially overlap (SpatialRelation.scala:96)."""
    return _overlaps(col_or_name(a), col_or_name(b))


def st_relate(a, b) -> Column:
    """The DE-9IM matrix as a 9-char string (geomesa st_relate)."""
    return _relate_udf(col_or_name(a), col_or_name(b))


def st_relate_bool(a, b, pattern: str) -> Column:
    """DE-9IM pattern predicate (geomesa st_relateBool)."""
    pat = str(pattern)
    udf = _binary_pred(lambda x, y: R.relate_pattern(x, y, pat))
    return udf(col_or_name(a), col_or_name(b))


def st_equals(a, b) -> Column:
    return _equals(col_or_name(a), col_or_name(b))


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def st_translate(geom, dx, dy) -> Column:
    fx, fy = float(dx), float(dy)
    udf = _unary_scalar(lambda g: G.wkb_dumps(G.translate(g, fx, fy)), "binary")
    return udf(col_or_name(geom))


def st_buffer_point(geom, radius) -> Column:
    r = float(radius)
    udf = _unary_scalar(
        lambda g: G.wkb_dumps(G.buffer_point(g[1], r)) if g[0] == "Point" else None, "binary"
    )
    return udf(col_or_name(geom))


def st_geohash(geom, precision=12) -> Column:
    p = int(precision)
    udf = _unary_scalar(
        lambda g: G.geohash(G.centroid(g)[0], G.centroid(g)[1], p), "string"
    )
    return udf(col_or_name(geom))


def st_reproject(geom, src_crs: str, dst_crs: str) -> Column:
    """Reproject geometry between CRSs (transformers/ReprojectGeometry.scala:52-105).
    CRS args are literal strings (column-valued CRS: see raster_join which
    handles per-row CRS inside its merge kernel)."""
    s, d = str(src_crs), str(dst_crs)
    udf = _unary_scalar(lambda g: G.wkb_dumps(P.transform_geom(g, s, d)), "binary")
    return udf(col_or_name(geom))


def st_geometry(extent) -> Column:
    """Extent struct -> polygon geometry (transformers/ExtentToGeometry.scala:41)."""

    @lazy_pandas_udf("binary")
    def udf(e: pd.DataFrame) -> pd.Series:
        out = []
        for i in range(len(e)):
            if e["xmin"].values[i] is None or (isinstance(e["xmin"].values[i], float) and np.isnan(e["xmin"].values[i])):
                out.append(None)
            else:
                out.append(G.wkb_dumps(G.box_polygon(
                    float(e["xmin"].values[i]), float(e["ymin"].values[i]),
                    float(e["xmax"].values[i]), float(e["ymax"].values[i]))))
        return pd.Series(out, dtype=object)

    return udf(col_or_name(extent))


def rf_mk_crs(crs: str) -> Column:
    return F.lit(str(crs))


# -- additional geomesa-parity accessors/serializers -------------------------

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def st_geom_from_geohash(geohash_col, precision: int | None = None) -> Column:
    """Geohash string -> its bounding-box polygon (geomesa st_geomFromGeoHash)."""

    @lazy_pandas_udf("binary")
    def udf(s: pd.Series) -> pd.Series:
        out = []
        for gh in s.values:
            if gh is None:
                out.append(None)
                continue
            lat = [-90.0, 90.0]
            lon = [-180.0, 180.0]
            even = True
            for ch in gh:
                bits = _GEOHASH32.index(ch)
                for b in (16, 8, 4, 2, 1):
                    r = lon if even else lat
                    mid = (r[0] + r[1]) / 2
                    if bits & b:
                        r[0] = mid
                    else:
                        r[1] = mid
                    even = not even
            out.append(G.wkb_dumps(G.box_polygon(lon[0], lat[0], lon[1], lat[1])))
        return pd.Series(out, dtype=object)

    return udf(col_or_name(geohash_col))


_exterior_ring = _unary_scalar(
    lambda g: G.wkb_dumps(("LineString", g[1][0])) if g[0] == "Polygon" else None,
    "binary",
)


def st_exterior_ring(geom) -> Column:
    return _exterior_ring(col_or_name(geom))


_num_points = _unary_scalar(lambda g: len(G._points(g)), "int")


def st_num_points(geom) -> Column:
    return _num_points(col_or_name(geom))


def _is_valid(g) -> bool:
    if g[0] in ("Polygon", "MultiPolygon"):
        for rings in G._polygons(g):
            for r in rings:
                if len(r) < 4 or tuple(r[0]) != tuple(r[-1]):
                    return False
                if abs(G._ring_area(r)) == 0:
                    return False
    return True


_is_valid_udf = _unary_scalar(_is_valid, "boolean")


def st_is_valid(geom) -> Column:
    """Basic validity: rings closed, >= 4 points, non-zero area (full OGC
    self-intersection checking is out of scope for the engine's surface)."""
    return _is_valid_udf(col_or_name(geom))


def _length_sphere(g) -> float:
    total = 0.0
    for line in (G._lines(g) if g[0] in ("LineString", "MultiLineString") else []):
        for a, b in zip(line[:-1], line[1:]):
            total += G.distance_sphere(a, b)
    return total


_length_sphere_udf = _unary_scalar(_length_sphere, "double")


def st_length_sphere(geom) -> Column:
    """Haversine length of lon/lat linestrings (geomesa st_lengthSphere)."""
    return _length_sphere_udf(col_or_name(geom))


@lazy_pandas_udf("binary")
def _closest_point_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ga, gb = _geoms(a), _geoms(b)
    out = []
    for x, y in zip(ga, gb):
        if x is None or y is None:
            out.append(None)
            continue
        # closest point ON x to y: sample x's segments/vertices
        best, bd = None, float("inf")
        import numpy as _np
        ys = G._all_lines_or_points(y)
        for kind, data in G._all_lines_or_points(x):
            pts = data[None, :] if kind == "pt" else data
            for p in pts:
                d = G.distance(("Point", tuple(p)), y)
                if d < bd:
                    bd, best = d, tuple(float(v) for v in p)
        out.append(G.wkb_dumps(("Point", best)) if best else None)
    return pd.Series(out, dtype=object)


def st_closest_point(a, b) -> Column:
    """Vertex of `a` closest to `b` (vertex-resolution approximation of
    geomesa st_closestPoint)."""
    return _closest_point_udf(col_or_name(a), col_or_name(b))


def _as_geojson(g):
    import json as _json

    gtype, body = g
    if gtype == "Point":
        coords = list(body)
    elif gtype in ("LineString", "MultiPoint"):
        coords = [list(p) for p in body]
    elif gtype in ("Polygon", "MultiLineString"):
        coords = [[list(p) for p in part] for part in body]
    elif gtype == "MultiPolygon":
        coords = [[[list(p) for p in r] for r in poly] for poly in body]
    else:
        return _json.dumps({"type": "GeometryCollection",
                            "geometries": [_json.loads(_as_geojson(x)) for x in body]})
    return _json.dumps({"type": gtype, "coordinates": coords})


_as_geojson_udf = _unary_scalar(_as_geojson, "string")


def st_as_geojson(geom) -> Column:
    return _as_geojson_udf(col_or_name(geom))


# ---------------------------------------------------------------------------
# SFC indexes (transformers/XZ2Indexer.scala, Z2Indexer.scala)
# ---------------------------------------------------------------------------


@lazy_pandas_udf("long")
def _z2_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(sfc.z2_index(x.values.astype("float64"), y.values.astype("float64")))


def rf_z2_index(x_or_extent, y=None, resolution: int = 31) -> Column:
    """Z2 index of a point (x, y) or of an extent struct's centroid."""
    if y is not None:
        return _z2_udf(col_or_name(x_or_extent).cast("double"), col_or_name(y).cast("double"))
    e = col_or_name(x_or_extent)
    cx = (e.getField("xmin") + e.getField("xmax")) / 2
    cy = (e.getField("ymin") + e.getField("ymax")) / 2
    return _z2_udf(cx, cy)


@lazy_pandas_udf("long")
def _xz2_udf(e: pd.DataFrame) -> pd.Series:
    return pd.Series(sfc.xz2_index(
        e["xmin"].values.astype("float64"), e["ymin"].values.astype("float64"),
        e["xmax"].values.astype("float64"), e["ymax"].values.astype("float64"),
    ))


def rf_xz2_index(extent, resolution: int = 18) -> Column:
    """XZ2-style index of an extent struct."""
    return _xz2_udf(col_or_name(extent))


def rf_spatial_grid_cells(extent, cell_size: float) -> Column:
    """array<long> of fixed-grid cells the extent overlaps — explode + equi-join
    for scalable spatial joins."""
    cs = float(cell_size)

    @lazy_pandas_udf("array<long>")
    def udf(e: pd.DataFrame) -> pd.Series:
        out = []
        xm, ym, xM, yM = (e[c].values for c in ("xmin", "ymin", "xmax", "ymax"))
        for i in range(len(e)):
            if xm[i] is None or (isinstance(xm[i], float) and np.isnan(xm[i])):
                out.append(None)
            else:
                out.append(np.array(sfc.grid_cells(xm[i], ym[i], xM[i], yM[i], cs), dtype="int64"))
        return pd.Series(out, dtype=object)

    return udf(col_or_name(extent))
