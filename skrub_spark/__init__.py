"""skrub_spark: a PySpark-native engine with the data-cleaning /
encoding / joining capabilities of skrub, plus LLM-scale pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing). See SURVEY.md for the full inventory."""

from .session import get_session  # noqa: F401
from .base import SparkTransformer  # noqa: F401
from .operators.agg_joiner import AggJoiner, AggTarget, MultiAggJoiner  # noqa: F401
from .operators.joiner import Joiner, fuzzy_join  # noqa: F401
from .operators.session_encoder import (  # noqa: F401
    SessionEncoder,
    session_features,
    sessionize,
)

__version__ = "0.1.0"
