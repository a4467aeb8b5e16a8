"""Tests for the late-round-8 additions (privacy gates, drift KS,
readability, tf-idf keywords, KMV source similarity, zipf fit,
shard compaction, label propagation)."""

import pytest

from pyspark.sql import functions as F


# ----------------------------------------------------- privacy gates


def _people(spark):
    # (zip, age_band) quasi; disease sensitive. Class sizes:
    # (z1,a1)=3 rows 2 diseases; (z1,a2)=1 row; (z2,a1)=5 rows but
    # only 1 distinct disease.
    rows = [
        (1, "z1", "a1", "flu"),
        (2, "z1", "a1", "flu"),
        (3, "z1", "a1", "cold"),
        (4, "z1", "a2", "flu"),
        (5, "z2", "a1", "cold"),
        (6, "z2", "a1", "cold"),
        (7, "z2", "a1", "cold"),
        (8, "z2", "a1", "cold"),
        (9, "z2", "a1", "cold"),
    ]
    return spark.createDataFrame(
        rows, "id long, zip string, age string, disease string"
    )


def test_k_anonymity_report_counts_and_flags(spark):
    from skrub_spark.report.privacy import k_anonymity_report

    rep = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_report(
            _people(spark), ["zip", "age"], k=3,
            sensitive_col="disease", l=2,
        ).collect()
    }
    assert rep[("z1", "a1")]["cnt"] == 3
    assert rep[("z1", "a1")]["n_sensitive"] == 2
    assert not rep[("z1", "a1")]["risky_k"]
    assert not rep[("z1", "a1")]["risky_l"]
    # singleton class: k-risky and l-risky
    assert rep[("z1", "a2")]["cnt"] == 1
    assert rep[("z1", "a2")]["risky_k"] and rep[("z1", "a2")]["risky_l"]
    # big but homogeneous class: k-safe yet l-risky
    assert rep[("z2", "a1")]["cnt"] == 5
    assert not rep[("z2", "a1")]["risky_k"]
    assert rep[("z2", "a1")]["risky_l"]


def test_suppress_rare_nulls_quasi_keeps_payload(spark):
    from skrub_spark.report.privacy import suppress_rare

    out = suppress_rare(_people(spark), ["zip", "age"], k=3)
    assert out.columns == ["id", "zip", "age", "disease"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[4]["zip"] is None and rows[4]["age"] is None
    assert rows[4]["disease"] == "flu"  # payload untouched
    assert rows[1]["zip"] == "z1" and rows[1]["age"] == "a1"
    assert len(rows) == 9


def test_suppress_rare_preserves_types(spark):
    from skrub_spark.report.privacy import suppress_rare

    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 10, "x"), (3, 20, "y")],
        "id long, band long, payload string",
    )
    out = suppress_rare(df, ["band"], k=2)
    assert dict(out.dtypes)["band"] == "bigint"
    got = {r["id"]: r["band"] for r in out.collect()}
    assert got == {1: 10, 2: 10, 3: None}


def test_privacy_rejects_empty_quasi(spark):
    from skrub_spark.report.privacy import (
        k_anonymity_report,
        suppress_rare,
    )

    df = _people(spark)
    with pytest.raises(ValueError):
        k_anonymity_report(df, [])
    with pytest.raises(ValueError):
        suppress_rare(df, [])
