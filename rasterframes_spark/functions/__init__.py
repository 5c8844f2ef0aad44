"""The rf_* / st_* function surface (SURVEY.md §2)."""

from rasterframes_spark.functions.local import *  # noqa: F401,F403
from rasterframes_spark.functions.tilestats import *  # noqa: F401,F403
from rasterframes_spark.functions.mask import *  # noqa: F401,F403
from rasterframes_spark.functions.constructors import *  # noqa: F401,F403
from rasterframes_spark.functions.aggregates import *  # noqa: F401,F403
from rasterframes_spark.functions.focal import *  # noqa: F401,F403
from rasterframes_spark.functions.proj_raster import *  # noqa: F401,F403
from rasterframes_spark.functions.compat import *  # noqa: F401,F403

from rasterframes_spark.functions import focal as _focal
from rasterframes_spark.functions import proj_raster as _proj_raster
from rasterframes_spark.functions import local as _local
from rasterframes_spark.functions import tilestats as _tilestats
from rasterframes_spark.functions import mask as _mask
from rasterframes_spark.functions import constructors as _constructors
from rasterframes_spark.functions import aggregates as _aggregates
from rasterframes_spark.functions import compat as _compat

__all__ = (
    list(_local.__all__)
    + list(_tilestats.__all__)
    + list(_mask.__all__)
    + list(_constructors.__all__)
    + list(_aggregates.__all__)
    + list(_focal.__all__)
    + list(_proj_raster.__all__)
    + list(_compat.__all__)
)
