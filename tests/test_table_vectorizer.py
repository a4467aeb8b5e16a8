"""Tests for selectors, SelectCols/ApplyToCols, TableVectorizer."""

from __future__ import annotations

from pyspark.sql import functions as F

import skrub_spark.selectors as s
from skrub_spark import (
    ApplyToCols,
    DropCols,
    SelectCols,
    SquashingScaler,
    TableVectorizer,
    ToFloat,
    tabular_pipeline,
)


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, 2.5, "x", "2024-01-01 00:00:00", "HOUSE"),
            (2, 3.5, "y", "2024-06-01 00:00:00", "AUTO"),
        ],
        "id int, val double, name string, ts string, seg string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_selectors(spark):
    df = _frame(spark)
    assert s.numeric().expand(df) == ["id", "val"]
    assert s.string().expand(df) == ["name", "seg"]
    assert s.any_date().expand(df) == ["ts"]
    assert (s.numeric() & ~s.cols("id")).expand(df) == ["val"]
    assert s.glob("s*").expand(df) == ["seg"]
    assert s.regex("^(id|ts)$").expand(df) == ["id", "ts"]
    assert (s.all() - s.string()).expand(df) == ["id", "val", "ts"]


def test_select_drop_cols(spark):
    df = _frame(spark)
    assert SelectCols(s.numeric()).fit_transform(df).columns == ["id", "val"]
    assert DropCols(["ts"]).fit_transform(df).columns == [
        "id",
        "val",
        "name",
        "seg",
    ]


def test_apply_to_cols(spark):
    df = spark.createDataFrame([("1", "2")], "a string, b string")
    out = ApplyToCols(ToFloat(), s.all()).fit_transform(df)
    assert dict(out.dtypes) == {"a": "double", "b": "double"}


def test_table_vectorizer(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "AUTO", "a very long unique string one", "2024-01-01"),
            (2, 20.0, "HOUSE", "another long unique string two", "2024-02-01"),
            (3, 30.0, "AUTO", "yet another long unique text three", "2024-03-01"),
        ],
        "id int, amount double, seg string, desc string, day string",
    )
    tv = TableVectorizer(cardinality_threshold=2)
    out = tv.fit(df).transform(df)
    cols = set(out.columns)
    # numeric passthrough
    assert {"id", "amount"} <= cols
    # low-card seg -> one-hot
    assert {"seg_AUTO", "seg_HOUSE"} <= cols
    # day parsed by cleaner -> datetime features
    assert "day_year" in cols
    # high-card desc -> minhash features
    assert "desc_0" in cols
    # all numeric output for feature columns
    row = out.orderBy("id").first()
    assert row["seg_AUTO"] == 1.0 and row["seg_HOUSE"] == 0.0
    names = tv.get_feature_names_out()
    assert set(names) <= cols


def test_tabular_pipeline(spark):
    df = _frame(spark)
    out, names = tabular_pipeline(df, target_col=None, numeric=SquashingScaler())
    assert out.count() == 2
    assert len(names) >= 4


def test_table_vectorizer_specific_transformers(spark):
    from skrub_spark import MinHashEncoder

    df = spark.createDataFrame(
        [(1, "AUTO"), (2, "HOUSE"), (3, "AUTO")], "id int, seg string"
    )
    # override: force minhash on a low-cardinality column
    tv = TableVectorizer(
        cardinality_threshold=10,
        specific_transformers={"seg": MinHashEncoder("seg", n_components=4)},
    )
    out = tv.fit(df).transform(df)
    assert "seg_0" in out.columns and "seg_AUTO" not in out.columns
