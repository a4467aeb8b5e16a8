"""Tests for the encoder suite."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from skrub_spark import (
    Cleaner,
    DatetimeEncoder,
    DropSimilar,
    DropUninformative,
    GapEncoder,
    MinHashEncoder,
    SimilarityEncoder,
    SquashingScaler,
    StringEncoder,
    TextEncoder,
    ToCategorical,
    ToDatetime,
    ToFloat,
    to_datetime,
)


def test_to_float(spark):
    df = spark.createDataFrame([("1.5",), ("x",), (None,)], "v string")
    out = ToFloat("v").fit_transform(df).collect()
    assert [r["v"] for r in out] == [1.5, None, None]


def test_to_datetime(spark):
    df = spark.createDataFrame(
        [("2024-01-02",), ("2024-01-02 10:11:12",), ("02/03/2024",), ("junk",)],
        "d string",
    )
    out = to_datetime(df, "d").collect()
    vals = [r["d"] for r in out]
    assert vals[0].year == 2024 and vals[0].day == 2
    assert vals[1].hour == 10
    assert vals[2].month == 3 and vals[2].day == 2  # dd/MM/yyyy wins
    assert vals[3] is None


def test_to_categorical(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",)], "v string")
    out = ToCategorical("v").fit_transform(df).collect()
    m = {r["v"]: r["v_cat"] for r in out}
    assert m == {"a": 0, "b": 1}


def test_datetime_encoder(spark):
    df = spark.createDataFrame(
        [(1, "2024-06-15 08:30:00")], "id int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    enc = DatetimeEncoder(resolution="hour", add_weekday=True)
    out = enc.fit_transform(df)
    r = out.first()
    assert "ts" not in out.columns
    assert r["ts_year"] == 2024 and r["ts_hour"] == 8 and r["ts_weekday"] == 6
    assert set(enc.get_feature_names_out()) <= set(out.columns)


def test_minhash_encoder(spark):
    df = spark.createDataFrame(
        [(1, "london"), (2, "londonn"), (3, "tokyo")], "id int, city string"
    )
    out = MinHashEncoder("city", n_components=8).fit_transform(df)
    rows = {r["id"]: [r[f"city_{i}"] for i in range(8)] for r in out.collect()}
    shared12 = sum(a == b for a, b in zip(rows[1], rows[2]))
    shared13 = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert shared12 > shared13


def test_similarity_encoder(spark):
    df = spark.createDataFrame([("london",), ("paris",)], "city string")
    enc = SimilarityEncoder("city")
    out = enc.fit_transform(df)
    r = {row["city_london"]: row for row in out.collect()}
    assert 1.0 in r  # exact match similarity 1
    assert enc.get_feature_names_out() == ["city_london", "city_paris"]


def test_squashing_scaler(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (100.0,)], "x double"
    )
    out = SquashingScaler("x", max_absolute_value=3.0).fit_transform(df)
    vals = [r["x"] for r in out.collect()]
    assert all(abs(v) <= 3.0 for v in vals)
    assert vals[-1] > vals[0]  # monotone


def test_string_encoder(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(["apple pie", "apple tart", "steel beam", "steel rod"] * 3)],
        "id int, t string",
    )
    enc = StringEncoder("t", n_components=2, hash_dim=64)
    out = enc.fit_transform(df)
    rows = {r["id"]: (r["t_0"], r["t_1"]) for r in out.collect()}

    def dist(a, b):
        return math.dist(rows[a], rows[b])

    assert dist(0, 1) < dist(0, 2)  # apple* closer than steel*


def test_gap_encoder(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(["police nyc", "police london", "firefighter nyc", "firefighter la"] * 2)],
        "id int, t string",
    )
    enc = GapEncoder("t", n_components=2, hash_dim=128)
    out = enc.fit_transform(df)
    assert len(out.columns) == 3  # id + 2 topics
    assert out.count() == 8


def test_text_encoder_stub(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "hello"), (3, "bye")], "id int, t string")
    out = TextEncoder("t", n_components=4).fit_transform(df)
    rows = {r["id"]: [r[f"t_{i}"] for i in range(4)] for r in out.collect()}
    assert rows[1] == rows[2]  # deterministic
    assert rows[1] != rows[3]


def test_cleaner(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01", "1.5", "N/A", "const"),
            ("2024-02-01", "2.5", "x", "const"),
        ],
        "d string, num string, mixed string, c string",
    )
    out = Cleaner().fit_transform(df)
    assert "c" not in out.columns  # constant dropped
    dt = dict(out.dtypes)
    assert dt["d"].startswith("timestamp")
    assert dt["num"] == "double"
    rows = out.orderBy("num").collect()
    assert rows[0]["mixed"] is None  # N/A -> null


def test_drop_uninformative(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, "a")], "x int, allnull int, const string"
    )
    out = DropUninformative().fit_transform(df)
    assert out.columns == ["x"]


def test_drop_similar(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b"), (3, 3, "c")], "x int, x_copy int, s string"
    )
    out = DropSimilar().fit_transform(df)
    assert out.columns == ["x", "s"]


def test_encoders_null_robustness(spark):
    """Null strings must not crash any string encoder."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")], "id int, t string"
    )
    out = MinHashEncoder("t", n_components=4).fit_transform(df)
    assert out.count() == 3
    out2 = TextEncoder("t", n_components=4).fit_transform(df)
    assert out2.count() == 3
    enc = GapEncoder("t", n_components=2, hash_dim=64)
    out3 = enc.fit(df).transform(df)
    assert out3.count() == 3
    enc4 = StringEncoder("t", n_components=2, hash_dim=64)
    out4 = enc4.fit(df).transform(df)
    assert out4.count() == 3


def test_similarity_encoder_short_values(spark):
    """Regression (ADVICE r1): values shorter than the n-gram size
    have an empty gram set; exact match must still score 1.0."""
    df = spark.createDataFrame([("ab",), ("cd",), ("london",)], "city string")
    enc = SimilarityEncoder("city")
    out = enc.fit_transform(df.select("city").withColumn("c2", F.col("city")))
    rows = {r["c2"]: r for r in out.collect()}
    assert rows["ab"]["city_ab"] == 1.0
    assert rows["cd"]["city_ab"] == 0.0
    assert rows["london"]["city_london"] == 1.0


def test_to_categorical_large_vocab_schema_parity(spark):
    """Both vocab branches (chained CASE vs broadcast join) must emit
    identical schemas/orderings; 101 categories takes the join path."""
    vals = [(f"cat_{i:03d}",) for i in range(101)]
    big = spark.createDataFrame(vals, "v string")
    small = spark.createDataFrame(vals[:5], "v string")
    out_big = ToCategorical("v").fit_transform(big)
    out_small = ToCategorical("v").fit_transform(small)
    assert out_big.columns == out_small.columns == ["v", "v_cat"]
    m = {r["v"]: r["v_cat"] for r in out_big.collect()}
    assert m["cat_000"] == 0 and m["cat_100"] == 100 and len(m) == 101


def test_to_categorical_cardinality_guard(spark):
    """Fit counts distinct BEFORE collecting and raises above
    max_categories (driver-OOM guard); at the boundary it still fits."""
    import pytest

    vals = [(f"cat_{i:03d}",) for i in range(101)]
    df = spark.createDataFrame(vals, "v string")
    # boundary: exactly max_categories distinct -> fits
    ok = ToCategorical("v", max_categories=101).fit_transform(df)
    assert ok.count() == 101
    # one over -> clear error, nothing collected
    with pytest.raises(ValueError, match="max_categories"):
        ToCategorical("v", max_categories=100).fit(df)


def test_gap_encoder_topics_separate(spark):
    """Gamma-Poisson fit separates two obvious topic families: values
    sharing a word must land on the same dominant topic."""
    words = ["police nyc", "police london", "police paris",
             "firefighter nyc", "firefighter la", "firefighter rio"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words * 3)], "id int, t string"
    )
    enc = GapEncoder("t", n_components=2, hash_dim=128, random_state=3)
    out = enc.fit_transform(df)
    dom = {
        r["id"]: max(range(2), key=lambda i: r[f"t_topic_{i}"])
        for r in out.collect()
    }
    assert dom[0] == dom[1] == dom[2]      # police cluster
    assert dom[3] == dom[4] == dom[5]      # firefighter cluster
    assert dom[0] != dom[3]


def test_gap_encoder_distributed_fit_matches_partitioning(spark):
    """fit_strategy='distributed': topic matrix must not depend on the
    input partitioning (aggregation order is commutative)."""
    words = ["police nyc", "police london", "firefighter nyc",
             "firefighter la"] * 5
    df1 = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id int, t string"
    ).repartition(1)
    df8 = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id int, t string"
    ).repartition(8)

    import numpy as np

    e1 = GapEncoder("t", n_components=2, hash_dim=64,
                    fit_strategy="distributed", random_state=1)
    e1.fit(df1)
    e8 = GapEncoder("t", n_components=2, hash_dim=64,
                    fit_strategy="distributed", random_state=1)
    e8.fit(df8)
    assert np.allclose(e1._H, e8._H, atol=1e-9)

    out = e8.transform(df8)
    assert out.count() == 20
    # proportions sum to ~1
    r = out.first()
    assert abs(r["t_topic_0"] + r["t_topic_1"] - 1.0) < 1e-6


def test_gap_encoder_partial_fit(spark):
    """partial_fit accumulates topics across batches (reference
    online loop): after two disjoint batches the encoder transforms
    values from both."""
    b1 = spark.createDataFrame(
        [(i, "police precinct") for i in range(4)], "id int, t string"
    )
    b2 = spark.createDataFrame(
        [(i, "firefighter station") for i in range(4)], "id int, t string"
    )
    enc = GapEncoder("t", n_components=2, hash_dim=64, random_state=0)
    enc.partial_fit(b1)
    H1 = enc._H.copy()
    enc.partial_fit(b2)
    import numpy as np

    assert not np.allclose(H1, enc._H)  # second batch moved the topics
    out = enc.transform(b1.union(b2))
    assert out.count() == 8


def test_string_encoder_from_frozen_matches_fresh_fit(spark):
    """from_frozen(idf, components) must reproduce a freshly-fit
    md5-hash encoder's transform exactly when handed the same fit
    state (guards the frozen-oracle path against drift in the
    transform plumbing)."""
    from pyspark.sql import functions as F

    from skrub_spark.encoders.string_encoder import StringEncoder
    from skrub_spark.sources import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part").select(
        "p_partkey", "p_name"
    )
    enc = StringEncoder("p_name", n_components=3, hash_dim=32, hash="md5")
    enc.fit(part)
    frozen = StringEncoder.from_frozen(
        "p_name", [float(v) for v in enc._idf],
        [[float(x) for x in row] for row in enc._components],
    )
    a = {
        r["p_partkey"]: tuple(round(r[f"p_name_{i}"], 9) for i in range(3))
        for r in enc.transform(part).collect()
    }
    b = {
        r["p_partkey"]: tuple(round(r[f"p_name_{i}"], 9) for i in range(3))
        for r in frozen.transform(part).collect()
    }
    assert a == b
