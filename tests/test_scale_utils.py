"""Tests for salting helpers, datasets, display hooks, fuzzy-join
ref_dist variants."""

from __future__ import annotations

from pyspark.sql import functions as F

from skrub_spark import (
    fuzzy_join,
    patch_display,
    salted_groupby_agg,
    salted_join,
    unpatch_display,
)


def test_salted_groupby_agg(spark):
    df = spark.createDataFrame(
        [("hot", 1.0)] * 50 + [("cold", 2.0)] * 3, "k string, v double"
    )
    out = salted_groupby_agg(
        df,
        ["k"],
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        n_salts=4,
    )
    rows = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    assert rows["hot"] == (50, 50.0)
    assert rows["cold"] == (3, 6.0)


def test_salted_join(spark):
    left = spark.createDataFrame(
        [("a", i) for i in range(20)] + [("b", 99)], "k string, x int"
    )
    right = spark.createDataFrame([("a", 1.5), ("b", 2.5)], "k string, w double")
    out = salted_join(left, right, on="k", n_salts=4)
    assert out.count() == 21
    assert out.filter("k = 'a'").select(F.min("w")).first()[0] == 1.5


def test_fuzzy_join_second_neighbor(spark):
    left = spark.createDataFrame([(1, "appel")], "id int, fruit string")
    right = spark.createDataFrame(
        [(10, "apple"), (20, "appxx"), (30, "zzzzzz")], "rid int, name string"
    )
    out = fuzzy_join(
        left, right, left_on="fruit", right_on="name",
        ref_dist="second_neighbor", add_match_info=True, tiebreak_cols=["rid"],
    ).first()
    # best = apple (dist 2 with swap = levenshtein 2), second = appxx (2)
    assert out["name"] == "apple"
    assert out["skrub_Joiner_rescaled_distance"] == out[
        "skrub_Joiner_distance"
    ] / 2.0 or out["skrub_Joiner_rescaled_distance"] == 1.0


def test_datasets(spark):
    from skrub_spark import datasets

    df = datasets.fetch_documents(spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    tables = datasets.fetch_star_schema(spark, "/root/testdata/sf0.001")
    assert set(tables) >= {"lineitem", "orders", "customer"}


def test_display_patch(spark):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    patch_display()
    try:
        html = df._repr_html_()
        assert "TableReport" in html or "<table>" in html
    finally:
        unpatch_display()


def test_bucketed_join_shuffle_free(spark, tmp_path):
    from skrub_spark import bucketed_join, join_is_shuffle_free, write_bucketed

    # spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    left = spark.range(0, 1000).withColumnRenamed("id", "k")
    right = left.selectExpr("k", "k * 2 as w")
    write_bucketed(left, "t_left", "k", n_buckets=4, sort_cols="k")
    write_bucketed(right, "t_right", "k", n_buckets=4, sort_cols="k")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path so the bucketed scan is used
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_left", "t_right", on="k")
        assert joined.count() == 1000
        assert join_is_shuffle_free(joined)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")
