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
