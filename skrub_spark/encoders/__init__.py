from .dtypes import (  # noqa: F401
    CleanNullStrings,
    DurationToFloat,
    ToCategorical,
    ToDatetime,
    ToFloat,
    ToStr,
    to_datetime,
)
from .datetime_encoder import DatetimeEncoder  # noqa: F401
from .minhash_encoder import MinHashEncoder  # noqa: F401
from .similarity_encoder import SimilarityEncoder  # noqa: F401
from .squashing_scaler import SquashingScaler  # noqa: F401
from .string_encoder import StringEncoder  # noqa: F401
from .gap_encoder import GapEncoder  # noqa: F401
from .text_encoder import TextEncoder  # noqa: F401
