"""LLM training-data pipeline operators: dedup, similarity search,
text analysis, multimodal columns."""

from rasterframes_spark.pipeline.dedup import *  # noqa: F401,F403
from rasterframes_spark.pipeline.similarity import *  # noqa: F401,F403
from rasterframes_spark.pipeline.text import *  # noqa: F401,F403
from rasterframes_spark.pipeline.multimodal import *  # noqa: F401,F403
from rasterframes_spark.pipeline.audio import *  # noqa: F401,F403
from rasterframes_spark.pipeline.skew import *  # noqa: F401,F403
from rasterframes_spark.pipeline.curation import *  # noqa: F401,F403
from rasterframes_spark.pipeline.scrub import *  # noqa: F401,F403
from rasterframes_spark.pipeline.bpe import *  # noqa: F401,F403
from rasterframes_spark.pipeline.lm_quality import *  # noqa: F401,F403

from rasterframes_spark.pipeline import curation as _curation
from rasterframes_spark.pipeline import dedup as _dedup
from rasterframes_spark.pipeline import similarity as _similarity
from rasterframes_spark.pipeline import text as _text
from rasterframes_spark.pipeline import multimodal as _multimodal
from rasterframes_spark.pipeline import audio as _audio
from rasterframes_spark.pipeline import skew as _skew
from rasterframes_spark.pipeline import scrub as _scrub
from rasterframes_spark.pipeline import bpe as _bpe
from rasterframes_spark.pipeline import lm_quality as _lmq

__all__ = (
    list(_dedup.__all__) + list(_similarity.__all__)
    + list(_text.__all__) + list(_multimodal.__all__)
    + list(_audio.__all__) + list(_skew.__all__) + list(_curation.__all__)
    + list(_scrub.__all__) + list(_bpe.__all__) + list(_lmq.__all__)
)
