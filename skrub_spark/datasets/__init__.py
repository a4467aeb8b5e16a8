"""Dataset access — parity with skrub/datasets/ fetchers.

The reference downloads benchmark datasets; here the catalog is the
driver-provided local warehouse (TESTDATA.md). Each ``fetch_*``
returns the DataFrame (plus the TPC-H-ish star schema helpers)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sources import ALL_TABLES, load_all, load_table

DEFAULT_DATA_DIR = os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
)


def get_data_dir() -> str:
    return DEFAULT_DATA_DIR


def fetch_table(
    spark: SparkSession, name: str, data_dir: str | None = None
) -> DataFrame:
    if name not in ALL_TABLES:
        raise ValueError(f"unknown table {name!r}; options: {ALL_TABLES}")
    return load_table(spark, data_dir or DEFAULT_DATA_DIR, name)


def fetch_documents(spark, data_dir=None) -> DataFrame:
    return fetch_table(spark, "documents", data_dir)


def fetch_embeddings(spark, data_dir=None) -> DataFrame:
    return fetch_table(spark, "embeddings", data_dir)


def fetch_events(spark, data_dir=None) -> DataFrame:
    return fetch_table(spark, "events", data_dir)


def fetch_star_schema(spark, data_dir=None) -> dict[str, DataFrame]:
    return load_all(spark, data_dir or DEFAULT_DATA_DIR)
