"""Tests for the third-session round-8 additions (survival curves,
Gini concentration, Theil-Sen robust trend, skyline, A/B tests,
FD profiling, BFS distances, n-gram novelty, unpivot, RFM)."""

import pytest

from pyspark.sql import functions as F


# ----------------------------------------------------- Kaplan-Meier


def test_kaplan_meier_hand_computed(spark):
    from skrub_spark.report.survival import kaplan_meier

    # group a: 5 subjects — t=1 one event (S=4/5), t=2 one censored
    # (S unchanged, n_risk drops), t=3 two events of the 3 at risk
    # (S = 0.8 * 1/3).
    rows = [
        ("a", 1, 1),
        ("a", 2, 0),
        ("a", 3, 1),
        ("a", 3, 1),
        ("a", 4, 0),
    ]
    df = spark.createDataFrame(rows, "g string, t long, e int")
    out = {r["t"]: r for r in kaplan_meier(df, "g", "t", "e").collect()}
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert out[1]["survival"] == pytest.approx(0.8)
    assert out[2]["n_risk"] == 4 and out[2]["n_censored"] == 1
    assert out[2]["survival"] == pytest.approx(0.8)
    assert out[3]["n_risk"] == 3 and out[3]["n_events"] == 2
    assert out[3]["survival"] == pytest.approx(0.8 / 3.0, abs=1e-5)
    assert out[4]["n_risk"] == 1
    assert out[4]["survival"] == pytest.approx(0.8 / 3.0, abs=1e-5)


def test_kaplan_meier_wipeout_zeroes_curve(spark):
    from skrub_spark.report.survival import kaplan_meier

    rows = [("b", 1, 1), ("b", 1, 1), ("b", 2, 0)]
    # t=1: both at-risk-at-1... n_risk=3, d=2 -> S=1/3; then t=2
    # censored only. Wipeout: all three event at t=1.
    df = spark.createDataFrame(
        [("b", 1, 1), ("b", 1, 1), ("b", 1, 1)], "g string, t long, e int"
    )
    out = kaplan_meier(df, "g", "t", "e").collect()
    assert len(out) == 1
    assert out[0]["survival"] == 0.0
    del rows


# ------------------------------------------------------------- Gini


def _gini_of(spark, vals):
    from skrub_spark.report.concentration import gini_concentration

    df = spark.createDataFrame(
        [("g", i, str(v)) for i, v in enumerate(vals)],
        "g string, id long, v string",
    ).select("g", "id", F.col("v").cast("decimal(12,2)").alias("v"))
    return gini_concentration(df, "g", "v", "id").collect()[0]


def test_gini_equal_values_is_zero(spark):
    r = _gini_of(spark, [10, 10, 10, 10])
    assert r["gini"] == 0.0
    assert r["total"] == 40.0


def test_gini_single_holder(spark):
    # all value in one hand: G = (n-1)/n
    r = _gini_of(spark, [0, 0, 0, 100])
    assert r["gini"] == pytest.approx(0.75)


def test_gini_known_example(spark):
    # values 1,2,3,4: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40
    r = _gini_of(spark, [1, 2, 3, 4])
    assert r["gini"] == pytest.approx(0.25)


def test_gini_zero_total_null(spark):
    r = _gini_of(spark, [0, 0])
    assert r["gini"] is None


# -------------------------------------------------------- Theil-Sen


def test_theil_sen_robust_to_outlier(spark):
    from skrub_spark.report.trend import theil_sen

    # y = 2x except one corrupted point; OLS would tilt, the median
    # pairwise slope stays 2.
    pts = [(x, 2 * x) for x in range(10)]
    pts[5] = (5, 500)
    df = spark.createDataFrame(
        [("g", x, str(y)) for x, y in pts], "g string, x long, y string"
    ).select("g", "x", F.col("y").cast("decimal(12,2)").alias("y"))
    r = theil_sen(df, "g", "x", "y").collect()[0]
    assert r["n_points"] == 10
    assert r["n_pairs"] == 45
    assert r["slope"] == pytest.approx(2.0)


def test_theil_sen_single_point_null(spark):
    from skrub_spark.report.trend import theil_sen

    df = spark.createDataFrame(
        [("g", 1, 5.0)], "g string, x long, y double"
    )
    r = theil_sen(df, "g", "x", "y").collect()[0]
    assert r["n_pairs"] == 0 and r["slope"] is None
