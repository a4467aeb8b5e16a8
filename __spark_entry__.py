"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship AggJoiner pipeline at sf0.001;
``queries``/``oracle_sql`` enumerate every implemented operator from
SURVEY.md §2 with DuckDB oracles (see skrub_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from skrub_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_agg_join_customer_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
