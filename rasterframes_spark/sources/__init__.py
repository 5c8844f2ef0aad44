from rasterframes_spark.sources.raster_reader import (  # noqa: F401
    read_raster, realize_tiles, with_spatial_index, raster_from_array,
)
from rasterframes_spark.sources.sinks import (  # noqa: F401
    write_geotiff, write_tiles, read_geojson, write_geojson, write_slippy,
    write_slippy_pyramid,
)
from rasterframes_spark.sources.cog import write_cog  # noqa: F401
from rasterframes_spark.sources.netcdf import (  # noqa: F401
    read_netcdf, read_netcdf_info, read_netcdf_var, write_netcdf,
)
from rasterframes_spark.sources.stac import (  # noqa: F401
    read_stac_items, stac_api_search, stac_asset_catalog,
)
from rasterframes_spark.sources.mrf import write_mrf  # noqa: F401
from rasterframes_spark.sources.geotrellis import (  # noqa: F401
    read_geotrellis_layer, read_geotrellis_catalog, write_geotrellis_layer,
    geotrellis_layer_ids,
)
from rasterframes_spark.sources.layer import (  # noqa: F401
    write_tile_layer, read_tile_layer, layer_metadata,
    write_tile_layer_table, read_tile_layer_table, read_layer_catalog,
)

__all__ = [
    "read_raster", "realize_tiles", "with_spatial_index", "raster_from_array",
    "write_geotiff", "write_tiles", "read_geojson", "write_geojson",
    "write_slippy",
    "write_slippy_pyramid", "write_cog",
    "read_netcdf", "read_netcdf_info", "read_netcdf_var", "write_netcdf",
    "read_stac_items", "stac_api_search", "stac_asset_catalog",
    "write_tile_layer", "read_tile_layer", "layer_metadata",
    "write_tile_layer_table", "read_tile_layer_table", "read_layer_catalog",
    "write_mrf",
    "read_geotrellis_layer", "read_geotrellis_catalog",
    "write_geotrellis_layer", "geotrellis_layer_ids",
]
