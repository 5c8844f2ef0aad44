from rasterframes_spark.geom.functions import *  # noqa: F401,F403
from rasterframes_spark.geom import functions as _functions

__all__ = list(_functions.__all__)
