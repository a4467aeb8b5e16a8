"""Round-10 contracts: ADVICE-r9 fixes + new round-10 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------- ADVICE r9: sorted_neighborhood schema
def test_sorted_neighborhood_empty_string_ids_schema(spark):
    from skrub_spark.operators.matching import sorted_neighborhood_pairs

    df = spark.createDataFrame([], "id string, k double")
    out = sorted_neighborhood_pairs(df, "id", "k", window=2)
    assert out.count() == 0
    types = dict((f.name, f.dataType.simpleString()) for f in out.schema)
    assert types == {"id_a": "string", "id_b": "string", "pos_dist": "int"}


def test_sorted_neighborhood_empty_matches_nonempty_schema(spark):
    from skrub_spark.operators.matching import sorted_neighborhood_pairs

    empty = spark.createDataFrame([], "id string, k double")
    full = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "id string, k double"
    )
    e = sorted_neighborhood_pairs(empty, "id", "k", window=2)
    f = sorted_neighborhood_pairs(full, "id", "k", window=2)
    # the empty branch must union cleanly with the non-empty branch
    assert e.unionByName(f).count() == f.count()


# ----------------------- ADVICE r9: two-group contract guards
def test_permutation_test_three_groups_raises(spark):
    from skrub_spark.report.permutation import permutation_test_means

    rows = [(float(i), "abc"[i % 3], i) for i in range(30)]
    df = spark.createDataFrame(rows, "x double, g string, k long")
    with pytest.raises(Exception, match="exactly 2 group"):
        permutation_test_means(df, "x", "g", "k", n_perm=10).collect()


def test_cuped_three_variants_raises(spark):
    from skrub_spark.report.experiment import cuped_adjust

    rows = [
        (float(i), float(i) * 0.5 + 1.0, "abc"[i % 3]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "y double, x double, g string")
    with pytest.raises(Exception, match="exactly 2 variant"):
        cuped_adjust(df, "y", "x", "g").collect()


def test_permutation_test_two_groups_still_green(spark):
    from skrub_spark.report.permutation import permutation_test_means

    rows = [(float(i % 7), "ab"[i % 2], i) for i in range(40)]
    df = spark.createDataFrame(rows, "x double, g string, k long")
    r = permutation_test_means(df, "x", "g", "k", n_perm=20).first()
    assert r["group_a"] == "a" and r["group_b"] == "b"
    assert 0.0 < r["p_value"] <= 1.0


# --------------------------- ADVICE r9: ALS bounded over-fetch
def test_als_recommend_heavy_tail_bounded(spark):
    """One heavy user must not inflate everyone's fetch; every user
    still gets exactly top_k novel items when the catalog allows."""
    from skrub_spark.operators.recommend import als_recommend

    rows = []
    # 30 light users with 2 seen items each, 1 heavy user with 40.
    for u in range(30):
        for it in (u % 5, (u + 1) % 5):
            rows.append((u, it, 3.0))
    for it in range(40):
        rows.append((99, it, 2.0))
    df = spark.createDataFrame(rows, "u int, i int, r double")
    out = als_recommend(
        df, "u", "i", "r", top_k=3, max_iter=4, rank=4
    )
    got = out.groupBy("user").count().collect()
    by_user = {r["user"]: r["count"] for r in got}
    for u in range(30):
        assert by_user.get(u) == 3
    # heavy user: 40 seen of 40 items -> nothing novel remains
    assert by_user.get(99, 0) == 0
    # no recommended item was already seen
    seen = df.select(
        F.col("u").alias("user"), F.col("i").alias("item")
    ).distinct()
    assert out.join(seen, ["user", "item"], "inner").count() == 0
