"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship AggJoiner pipeline at sf0.001;
``queries``/``oracle_sql`` enumerate every implemented operator from
SURVEY.md §2 with DuckDB oracles (see skrub_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# location-independent import: the driver may load this file from a
# different working directory
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from skrub_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_agg_join_customer_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
