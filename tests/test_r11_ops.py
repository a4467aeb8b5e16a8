"""Round-11 operator contracts: DoReMi-lite mixture reweighting,
ALS frozen serving twin, order-n Kneser-Ney, delta-join IVM,
streaming late-data side output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# DoReMi-lite
# ---------------------------------------------------------------------------


def _loss_frame(spark, rows):
    return spark.createDataFrame(
        rows, "domain string, loss double, ref_loss double"
    )


def test_doremi_upweights_undertrained_domain(spark):
    """Planted domain shift: the domain whose proxy loss is furthest
    above its reference (most learning headroom) must get the
    LARGEST weight; a domain at/below reference (excess clips to 0)
    must end BELOW uniform."""
    from skrub_spark.operators.doremi import doremi_weights

    rows = (
        # webA: large excess (under-trained)
        [("webA", 3.0, 2.0)] * 40
        # books: modest excess
        + [("books", 2.4, 2.0)] * 40
        # code: proxy already matches reference -> excess 0
        + [("code", 1.9, 2.0)] * 40
    )
    w = {
        r["domain"]: (r["weight"], r["excess_loss"])
        for r in doremi_weights(
            _loss_frame(spark, rows), "domain", "loss", "ref_loss"
        ).collect()
    }
    assert w["webA"][1] == pytest.approx(1.0)
    assert w["books"][1] == pytest.approx(0.4)
    assert w["code"][1] == 0.0  # clipped, never negative
    assert w["webA"][0] > w["books"][0] > w["code"][0]
    assert w["webA"][0] > 1 / 3  # above uniform
    assert w["code"][0] < 1 / 3  # below uniform
    assert sum(v[0] for v in w.values()) == pytest.approx(1.0, abs=1e-4)


def test_doremi_per_example_clipping(spark):
    """Clipping is PER EXAMPLE (the paper's rule): a domain with
    mixed +1/-1 excess examples keeps the +1 mass (mean 0.5), it is
    not cancelled to zero by the negative half."""
    from skrub_spark.operators.doremi import doremi_weights

    rows = [("m", 3.0, 2.0)] * 10 + [("m", 1.0, 2.0)] * 10 + [
        ("flat", 2.0, 2.0)
    ] * 10
    w = {
        r["domain"]: r["excess_loss"]
        for r in doremi_weights(
            _loss_frame(spark, rows), "domain", "loss", "ref_loss"
        ).collect()
    }
    assert w["m"] == pytest.approx(0.5)
    assert w["flat"] == 0.0


def test_doremi_smoothing_floor_and_determinism(spark):
    """Uniform smoothing keeps every domain above ~c/D even when one
    domain dominates; two runs (different partitioning) are
    bit-identical."""
    from skrub_spark.operators.doremi import doremi_weights

    rows = [("hot", 10.0, 2.0)] * 30 + [("cold", 2.0, 2.0)] * 30
    df = _loss_frame(spark, rows)
    out1 = sorted(
        (r["domain"], r["weight"])
        for r in doremi_weights(
            df, "domain", "loss", "ref_loss", smoothing=0.1
        ).collect()
    )
    out2 = sorted(
        (r["domain"], r["weight"])
        for r in doremi_weights(
            df.repartition(7), "domain", "loss", "ref_loss", smoothing=0.1
        ).collect()
    )
    assert out1 == out2
    cold = dict(out1)["cold"]
    assert cold >= 0.1 / 2 * 0.9  # ~c/D floor survives the hot domain


def test_doremi_targets_budget(spark):
    """doremi_targets converts weights to integer row targets that
    sum to <= budget and track the weights proportionally."""
    from skrub_spark.operators.doremi import doremi_targets, doremi_weights

    rows = [("a", 4.0, 2.0)] * 20 + [("b", 2.5, 2.0)] * 20 + [
        ("c", 2.0, 2.0)
    ] * 20
    w = doremi_weights(_loss_frame(spark, rows), "domain", "loss", "ref_loss")
    t = doremi_targets(w, 1000)
    assert set(t) == {"a", "b", "c"}
    assert sum(t.values()) <= 1000
    assert t["a"] > t["b"] > t["c"] >= 0


def test_doremi_smoothing_validation(spark):
    from skrub_spark.operators.doremi import doremi_weights

    with pytest.raises(ValueError, match="smoothing"):
        doremi_weights(
            _loss_frame(spark, [("a", 1.0, 0.5)]),
            "domain",
            "loss",
            "ref_loss",
            smoothing=1.0,
        )
