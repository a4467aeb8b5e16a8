from .table_report import TableReport  # noqa: F401
from .associations import column_associations  # noqa: F401
