"""Round-9 second-session tests: HLL sketches and the other r9b
operator families."""

import pytest

from pyspark.sql import functions as F


# ----------------------------------------------------- HyperLogLog


def _hll_parts(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def test_hll_accuracy_raw_regime(spark):
    """p=12 over 50k distinct values: classic HLL error ~1.04/64."""
    from skrub_spark.functions.sketches import hll_estimate, hll_registers

    df = _hll_parts(spark, 50_000)
    est = hll_estimate(hll_registers(df, "v", p=12), p=12).first()
    assert est["est_small"] is None  # raw regime
    assert abs(est["hll_est"] - 50_000) / 50_000 < 0.10


def test_hll_linear_counting_regime(spark):
    """Small cardinality lands in the est_small column, accurately."""
    from skrub_spark.functions.sketches import hll_estimate, hll_registers

    df = _hll_parts(spark, 80)
    est = hll_estimate(hll_registers(df, "v", p=12), p=12).first()
    assert est["est_small"] is not None
    assert abs(est["est_small"] - 80) / 80 < 0.10


def test_hll_merge_identity(spark):
    """max-merge of two shard sketches == sketch of the union,
    register-for-register (the persistence pattern's exactness)."""
    from skrub_spark.functions.sketches import hll_merge, hll_registers

    a = _hll_parts(spark, 3_000)
    b = _hll_parts(spark, 3_000, start=2_000)  # overlapping shards
    merged = hll_merge(
        hll_registers(a, "v", p=10), hll_registers(b, "v", p=10)
    )
    whole = hll_registers(a.unionByName(b), "v", p=10)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_partition_invariance_and_duplicates(spark):
    """Registers are content-addressed: repartitioning and duplicate
    rows change nothing."""
    from skrub_spark.functions.sketches import hll_registers

    df = _hll_parts(spark, 5_000)
    base = hll_registers(df, "v", p=10)
    shuffled = hll_registers(
        df.unionByName(df).repartition(17), "v", p=10
    )
    assert base.exceptAll(shuffled).count() == 0
    assert shuffled.exceptAll(base).count() == 0


def test_hll_grouped_and_register_bounds(spark):
    """Grouped sketches: bucket in [0, m), reg in [1, 61-p]."""
    from skrub_spark.functions.sketches import hll_estimate, hll_registers

    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("g"),
        F.concat(F.lit("x"), F.col("id")).alias("v"),
    )
    regs = hll_registers(df, "v", ["g"], p=8)
    bad = regs.filter(
        (F.col("bucket") < 0)
        | (F.col("bucket") >= 256)
        | (F.col("reg") < 1)
        | (F.col("reg") > 53)
    )
    assert bad.count() == 0
    est = hll_estimate(regs, ["g"], p=8)
    rows = {r["g"]: r for r in est.collect()}
    assert set(rows) == {0, 1, 2, 3}
    for g, r in rows.items():
        assert abs(r["hll_est"] - 5_000) / 5_000 < 0.15


def test_hll_p_validation(spark):
    from skrub_spark.functions.sketches import hll_registers

    with pytest.raises(ValueError):
        hll_registers(_hll_parts(spark, 10), "v", p=2)


# ------------------------------------------------- Jaro-Winkler


def test_jaro_winkler_known_values():
    from skrub_spark.functions.text import jaro_winkler_py as jw

    assert abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15
    assert abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15
    assert jw("abc", "abc") == 1.0
    assert jw("", "") == 0.0  # DuckDB convention: empty -> 0
    assert jw(None, "x") == 0.0
    assert jw("abc", "xyz") == 0.0


def test_jaro_winkler_matches_duckdb_bitexact():
    """The oracle relies on bit-identity with DuckDB's builtin —
    pin it over a random sweep (seeded, fast)."""
    import random
    import string

    import duckdb

    from skrub_spark.functions.text import jaro_winkler_py as jw

    con = duckdb.connect()
    random.seed(42)
    for _ in range(1500):
        alpha = random.choice(["ab", string.ascii_lowercase + " '#"])
        a = "".join(
            random.choice(alpha) for _ in range(random.randint(0, 25))
        )
        b = "".join(
            random.choice(alpha) for _ in range(random.randint(0, 25))
        )
        got = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert got == jw(a, b), (a, b)


def test_jaro_winkler_join_self(spark):
    from skrub_spark.dedup.strings import jaro_winkler_join

    df = spark.createDataFrame(
        [("red widget",), ("red widgets",), ("red widget",), ("blue bolt",)],
        "name string",
    )
    out = jaro_winkler_join(df, df, "name", "name", threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["name_a"], r["name_b"]) == ("red widget", "red widgets")
    assert r["jw"] > 0.9
    # self/duplicate pairs dropped, a < b ordering enforced
    assert all(x["name_a"] < x["name_b"] for x in out)


def test_jaro_winkler_join_two_sided_blocking(spark):
    from skrub_spark.dedup.strings import jaro_winkler_join

    a = spark.createDataFrame([("acme corp",), ("zeta ltd",)], "n string")
    b = spark.createDataFrame(
        [("acme corporation",), ("acme inc",), ("beta llc",)], "m string"
    )
    rows = jaro_winkler_join(a, b, "n", "m", threshold=0.8).collect()
    got = {(r["name_a"], r["name_b"]) for r in rows}
    # 'zeta ltd' and 'beta llc' share no block key with anything
    assert got == {("acme corp", "acme corporation"), ("acme corp", "acme inc")}


def test_jaro_winkler_column_udf(spark):
    from skrub_spark.functions.text import jaro_winkler, jaro_winkler_py

    df = spark.createDataFrame(
        [("martha", "marhta"), ("dixon", "dicksonx"), (None, "x")],
        "a string, b string",
    )
    rows = df.select("a", "b", jaro_winkler("a", "b").alias("jw")).collect()
    for r in rows:
        assert r["jw"] == jaro_winkler_py(r["a"], r["b"])


# ------------------------------------------ weighted group quantiles


def test_weighted_quantiles_hand_computed(spark):
    from skrub_spark.operators.winsorize import weighted_group_quantiles

    # g=a: values 1,2,3 with weights 1,1,8 -> W=10
    #   q50: smallest v with cum >= 5  -> 3 (cum: 1,2,10)
    #   q25: smallest v with cum >= ceil(2.5)=3 -> 3
    # g=b: 10 w5, 20 w5 -> q50: cum >= 5 -> 10
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 8),
         ("b", 10.0, 5), ("b", 20.0, 5)],
        "g string, v double, w long",
    )
    out = {
        r["g"]: r
        for r in weighted_group_quantiles(
            df, "g", "v", "w", probs=(0.25, 0.5), names=["q25", "q50"]
        ).collect()
    }
    assert out["a"]["w_total"] == 10
    assert out["a"]["q25"] == 3.0 and out["a"]["q50"] == 3.0
    assert out["b"]["q50"] == 10.0


def test_weighted_quantiles_unit_weights_match_unweighted(spark):
    from skrub_spark.operators.winsorize import (
        group_quantiles,
        weighted_group_quantiles,
    )

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 7 % 101).cast("double").alias("v"),
        F.lit(1).alias("w"),
    )
    a = {
        r["g"]: (r["p5"], r["p95"])
        for r in group_quantiles(
            df, "g", "v", probs=(0.5, 0.95), names=["p5", "p95"]
        ).collect()
    }
    b = {
        r["g"]: (r["p5"], r["p95"])
        for r in weighted_group_quantiles(
            df, "g", "v", "w", probs=(0.5, 0.95), names=["p5", "p95"]
        ).collect()
    }
    assert a == b


def test_weighted_quantiles_null_and_zero_weight_excluded(spark):
    from skrub_spark.operators.winsorize import weighted_group_quantiles

    df = spark.createDataFrame(
        [("a", 1.0, 0), ("a", 5.0, 3), ("a", None, 9), ("a", 9.0, None)],
        "g string, v double, w long",
    )
    out = weighted_group_quantiles(df, "g", "v", "w", probs=(0.5,),
                                   names=["q50"]).collect()
    assert len(out) == 1
    assert out[0]["w_total"] == 3 and out[0]["q50"] == 5.0


# ------------------------------------------------- phrase search


def test_phrase_search_counts_and_positions(spark):
    from skrub_spark.operators.bm25 import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),   # "the cat" x2, first at 0
            (2, "cat the cat the"),              # "the cat" x1 at pos 1
            (3, "the dog"),                      # no match
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in phrase_search(docs, "the cat").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_matches"] == 2 and out[1]["first_pos"] == 0
    assert out[2]["n_matches"] == 1 and out[2]["first_pos"] == 1


def test_phrase_search_repeated_word_phrase(spark):
    from skrub_spark.operators.bm25 import phrase_search

    docs = spark.createDataFrame(
        [(1, "go go go stop"), (2, "go stop go")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in phrase_search(docs, "go go").collect()}
    # "go go go" contains "go go" at positions 0 and 1
    assert out[1]["n_matches"] == 2 and out[1]["first_pos"] == 0
    assert 2 not in out


def test_phrase_search_three_words_and_punctuation(spark):
    from skrub_spark.operators.bm25 import phrase_search

    docs = spark.createDataFrame(
        [(1, "A fast, SORT-key scan"), (2, "fast sort. key!")],
        "doc_id long, text string",
    )
    # tokenizer splits on non-alnum: both become ... fast sort key ...
    out = phrase_search(docs, "fast sort key").collect()
    assert {r["doc_id"] for r in out} == {1, 2}


def test_phrase_search_empty_phrase_raises(spark):
    from skrub_spark.operators.bm25 import phrase_search

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_search(docs, "!!!")


# ------------------------------------------------ Poisson bootstrap


def test_poisson_weights_distribution(spark):
    """Draws behave like Poisson(1): mean ~1, var ~1, deterministic."""
    from skrub_spark.report.bootstrap import poisson_weight

    df = spark.range(20_000).select(
        poisson_weight(F.col("id"), F.lit(1)).alias("w")
    )
    row = df.agg(
        F.avg("w").alias("mu"),
        F.var_pop("w").alias("v"),
        F.max("w").alias("mx"),
    ).first()
    assert abs(row["mu"] - 1.0) < 0.03
    assert abs(row["v"] - 1.0) < 0.05
    assert row["mx"] <= 8


def test_bootstrap_ci_covers_true_mean(spark):
    """CI from a uniform[0,100] sample should bracket the sample
    mean and be ordered lo <= point <= hi."""
    from skrub_spark.report.bootstrap import bootstrap_mean_ci

    df = spark.range(5_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37 % 101)).cast("double").alias("v"),
    )
    r = bootstrap_mean_ci(df, "v", "k", n_boot=80).first()
    assert r["ci_lo"] <= r["point"] <= r["ci_hi"]
    # half-width of a mean of 5k uniform[0,100] draws ~ 2.3*1.96/2
    assert (r["ci_hi"] - r["ci_lo"]) < 4.0
    assert r["n_rows"] == 5_000


def test_bootstrap_ci_partition_invariance(spark):
    from skrub_spark.report.bootstrap import bootstrap_mean_ci

    df = spark.range(2_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    a = bootstrap_mean_ci(df, "v", "k", ["g"], n_boot=30).collect()
    b = bootstrap_mean_ci(
        df.repartition(23), "v", "k", ["g"], n_boot=30
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bootstrap_width_shrinks_with_n(spark):
    from skrub_spark.report.bootstrap import bootstrap_mean_ci

    small = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    big = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    ws = bootstrap_mean_ci(small, "v", "k", n_boot=60).first()
    wb = bootstrap_mean_ci(big, "v", "k", n_boot=60).first()
    assert (wb["ci_hi"] - wb["ci_lo"]) < (ws["ci_hi"] - ws["ci_lo"])


# ------------------------------------------------- gazetteer tagging


def test_gazetteer_single_and_multi_token(spark):
    from skrub_spark.operators.gazetteer import gazetteer_match

    docs = spark.createDataFrame(
        [
            (1, "I moved to New York City from York"),
            (2, "york is not new"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["entity"]): (r["n_matches"], r["first_pos"])
        for r in gazetteer_match(
            docs, ["new york", "new york city", "york"]
        ).collect()
    }
    # overlapping entities all match independently
    assert out[(1, "new york")] == (1, 3)
    assert out[(1, "new york city")] == (1, 3)
    assert out[(1, "york")] == (2, 4)
    assert out[(2, "york")] == (1, 0)
    assert (2, "new york") not in out


def test_gazetteer_tokenizer_view(spark):
    from skrub_spark.operators.gazetteer import gazetteer_match

    docs = spark.createDataFrame(
        [(1, "A SORT-key; then sort  key again")],
        "doc_id long, text string",
    )
    out = gazetteer_match(docs, ["Sort Key"]).collect()
    assert len(out) == 1
    assert out[0]["n_matches"] == 2  # punctuation/case-insensitive


def test_gazetteer_empty_entity_raises(spark):
    from skrub_spark.operators.gazetteer import gazetteer_match

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        gazetteer_match(docs, ["!!!"])
