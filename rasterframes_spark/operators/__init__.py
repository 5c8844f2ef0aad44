from rasterframes_spark.operators.raster_join import (  # noqa: F401
    raster_join, release_raster_join_cache, spatial_join)
from rasterframes_spark.operators.zonal import zonal_stats  # noqa: F401
from rasterframes_spark.operators.pyramid import pyramid_up, build_pyramid  # noqa: F401
from rasterframes_spark.operators.vector_join import st_join, st_knn_join  # noqa: F401

__all__ = ["raster_join", "release_raster_join_cache", "spatial_join",
           "zonal_stats", "pyramid_up",
           "build_pyramid", "st_join", "st_knn_join"]
