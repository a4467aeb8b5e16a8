"""IO helpers, remaining dtype coercions, misc API coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import skrub_spark.selectors as s
from skrub_spark import SkrubLearner, ToStr, var
from skrub_spark.encoders.dtypes import DurationToFloat
from skrub_spark.sources import read_csv, read_json, write_parquet


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id int, k string, v double"
    )
    path = str(tmp_path / "part_out")
    write_parquet(df, path, partition_by=["k"])
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning: filter on the partition column reads one dir
    pruned = back.filter(F.col("k") == "a")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_read_csv_json(spark, tmp_path):
    csv_path = tmp_path / "t.csv"
    csv_path.write_text("id,name\n1,x\n2,y\n")
    df = read_csv(spark, str(csv_path))
    assert df.count() == 2 and set(df.columns) == {"id", "name"}

    json_path = tmp_path / "t.jsonl"
    json_path.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": 3.5}\n')
    dj = read_json(spark, str(json_path))
    assert dj.count() == 2
    assert dj.filter("id = 2").first()["v"] == 3.5


def test_to_str_and_duration(spark):
    df = spark.createDataFrame([(1, 2.5)], "a int, b double")
    out = ToStr(["a", "b"]).fit_transform(df)
    assert dict(out.dtypes) == {"a": "string", "b": "string"}

    dur = spark.sql(
        "select interval '1 02:00:00' day to second as d"
    )
    r = DurationToFloat("d").fit_transform(dur).first()
    assert r["d"] == pytest.approx(26 * 3600.0)


def test_selectors_data_dependent(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, "b", 6.0)], "id int, k string, v double"
    )
    assert s.cardinality_below(3).expand(df) == ["k", "v"]  # 2 distinct each
    assert s.has_nulls().expand(df) == ["v"]
    assert s.categorical(10).expand(df) == ["k"]
    assert s.integer().expand(df) == ["id"]
    assert s.float_().expand(df) == ["v"]


def test_skrub_learner(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 50.0)], "id int, v double")
    plan = var("X").filter("v > 10").count()
    learner = SkrubLearner(plan)
    assert learner.fit_transform({"X": df}) == 1


def test_table_report_json(spark):
    import json

    from skrub_spark import TableReport

    df = spark.createDataFrame([(1, "a")], "id int, s string")
    j = json.loads(TableReport(df, title="t").to_json())
    assert j["title"] == "t" and j["n_rows"] == 1


def test_duration_to_float_fractional_seconds(spark):
    """Regression (ADVICE r1): sub-second precision must survive
    (skrub's _duration_to_float returns fractional seconds)."""
    dur = spark.sql(
        "select interval '0 00:00:01.5' day to second as d"
    )
    r = DurationToFloat("d").fit_transform(dur).first()
    assert r["d"] == pytest.approx(1.5)
