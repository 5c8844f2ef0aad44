from rasterframes_spark.operators.raster_join import (  # noqa: F401
    raster_join, release_raster_join_cache, spatial_join)

# generic alias: releases any result carrying a _rf_cached_inputs handle
release_cache = release_raster_join_cache
from rasterframes_spark.operators.zonal import zonal_stats  # noqa: F401
from rasterframes_spark.operators.pyramid import pyramid_up, build_pyramid  # noqa: F401
from rasterframes_spark.operators.vector_join import st_join, st_knn_join  # noqa: F401

__all__ = ["raster_join", "release_raster_join_cache", "release_cache",
           "spatial_join",
           "zonal_stats", "pyramid_up",
           "build_pyramid", "st_join", "st_knn_join"]
