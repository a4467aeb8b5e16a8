"""Fellegi–Sunter record linkage: gamma ladders, EM fit contracts,
end-to-end resolution accuracy, and the no-cartesian plan audit.

The EM fit is deterministic but iterative (driver loop over pattern
counts), so the battery oracles freeze its output; these tests are
the fit's own correctness surface: it must RECOVER the planted
perturbation rates of the demo fixture (nation bumped for 1/7 of
rows → m_nation[agree] ≈ 6/7, segment wiped for 1/5 → ≈ 4/5,
balance shifted for 1/3 → m_bal[exact] ≈ 2/3) without ever seeing a
label."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skrub_spark.operators.linkage import (
    Comparison,
    candidate_pairs,
    comparison_columns,
    em_fit,
    link_records,
    match_columns,
)
from skrub_spark.queries import (
    _linkage_comparisons,
    _linkage_rules,
    _linkage_sides,
)

SF = "/root/testdata/sf0.001"


def _gammas(spark):
    left, right = _linkage_sides(spark, SF)
    pairs = candidate_pairs(left, right, _linkage_rules())
    return comparison_columns(pairs, _linkage_comparisons())


def test_gamma_levels_unit(spark):
    df = spark.createDataFrame(
        [
            ("abc", "abc", 5.0, 5.0),      # exact / exact
            ("abc", "ABC", 5.0, 5.5),      # case-fold exact / within tol
            ("abcdef", "abcdxf", 1.0, 3.0),  # lev 1 / disagree
            ("abc", "zzzzzz", None, 2.0),  # disagree / null -> 0
            (None, "abc", 2.0, 2.0),       # null -> 0 / exact
        ],
        "l_s string, r_s string, l_v double, r_v double",
    )
    comps = [
        Comparison("s", "l_s", "r_s", kind="string", fuzzy_max=2),
        Comparison("v", "l_v", "r_v", kind="numeric", tol=1.0),
    ]
    rows = comparison_columns(df, comps).select("g_s", "g_v").collect()
    assert [(r.g_s, r.g_v) for r in rows] == [
        (2, 2),
        (2, 1),
        (1, 0),
        (0, 0),
        (0, 2),
    ]


def test_em_recovers_planted_rates(spark):
    g = _gammas(spark)
    model = em_fit(g, _linkage_comparisons())
    # planted perturbation rates (md5-rule, scale-free):
    # nation agrees on 6/7 of true pairs, segment on 4/5,
    # balance exact on 2/3 (else within-tol +0.5)
    assert model["m"]["nation"][1] == pytest.approx(6 / 7, abs=0.08)
    assert model["m"]["segment"][1] == pytest.approx(4 / 5, abs=0.08)
    assert model["m"]["acctbal"][2] == pytest.approx(2 / 3, abs=0.10)
    # every field: agreeing at the top level is match evidence
    for nm in model["cols"]:
        top = model["levels"][nm] - 1
        assert model["m"][nm][top] > model["u"][nm][top]
        assert model["ratio"][nm][top] > 1.0
    # lambda ~ true-pair share of candidates: positive, well under 1
    assert 0.01 < model["lambda"] < 0.5


def test_em_deterministic(spark):
    g = _gammas(spark)
    comps = _linkage_comparisons()
    assert em_fit(g, comps) == em_fit(g, comps)


def test_end_to_end_resolution_accuracy(spark):
    from skrub_spark._frozen import LINKAGE_MODEL

    left, right = _linkage_sides(spark, SF)
    n_left = left.count()
    resolved = link_records(
        left,
        right,
        _linkage_comparisons(),
        _linkage_rules(),
        LINKAGE_MODEL,
        threshold=0.9,
        one_to_one=True,
    ).collect()
    # one row per resolved left id
    ids = [r.l_id for r in resolved]
    assert len(ids) == len(set(ids))
    # coverage: >= 90% of left rows find a confident match
    assert len(resolved) >= 0.90 * n_left
    # precision: the perturbed copy shares ids with the original,
    # so a correct link is l_id == r_id
    correct = sum(1 for r in resolved if r.l_id == r.r_id)
    assert correct >= 0.99 * len(resolved)


def test_match_columns_bit_exact_python_replay(spark):
    """The Column scoring must equal a pure-Python replay of the
    same fixed-order literal arithmetic — the property the SQL
    oracle's exactness rests on."""
    from skrub_spark._frozen import LINKAGE_MODEL as M

    g = _gammas(spark)
    w, p = match_columns(M)
    rows = (
        g.select("l_id", "r_id", "g_name", "g_nation", "g_segment",
                 "g_acctbal", w, p)
        .orderBy("l_id", "r_id")
        .limit(200)
        .collect()
    )
    for r in rows:
        gl = {"name": r.g_name, "nation": r.g_nation,
              "segment": r.g_segment, "acctbal": r.g_acctbal}
        wexp = 0.0
        k = M["prior_factor"]
        for nm in M["cols"]:
            wexp = wexp + M["log2_ratio"][nm][gl[nm]]
            k = k * M["ratio"][nm][gl[nm]]
        assert r.match_weight == wexp  # bit-exact, not approx
        assert r.posterior == k / (1.0 + k)


def test_no_cartesian_in_plan(spark):
    left, right = _linkage_sides(spark, SF)
    pairs = candidate_pairs(left, right, _linkage_rules())
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocking_union_dedupes(spark):
    left, right = _linkage_sides(spark, SF)
    pairs = candidate_pairs(left, right, _linkage_rules())
    n = pairs.count()
    nd = pairs.select("l_id", "r_id").distinct().count()
    assert n == nd
