from rasterframes_spark.sources.raster_reader import (  # noqa: F401
    read_raster, realize_tiles, with_spatial_index,
)
from rasterframes_spark.sources.sinks import (  # noqa: F401
    write_geotiff, write_tiles, read_geojson, write_slippy,
)

__all__ = [
    "read_raster", "realize_tiles", "with_spatial_index",
    "write_geotiff", "write_tiles", "read_geojson", "write_slippy",
]
