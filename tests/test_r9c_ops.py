"""Round-9 third-session tests: bloom semi-join reduction, matching
primitives, and the other r9c operator families."""

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------ bloom_semi_join


def _fact_dim(spark):
    fact = spark.createDataFrame(
        [(i, i % 37) for i in range(500)] + [(9991, None)],
        "rid long, k long",
    )
    dim = spark.createDataFrame(
        [(3,), (11,), (36,), (99,)], "k long"
    )
    return fact, dim


def test_bloom_semi_matches_plain_semi(spark):
    from skrub_spark.operators.semi_join import bloom_semi_join

    fact, dim = _fact_dim(spark)
    got = bloom_semi_join(fact, dim, "k", how="semi").select("rid", "k")
    want = fact.join(dim, "k", "left_semi").select("rid", "k")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_anti_matches_plain_anti_including_nulls(spark):
    from skrub_spark.operators.semi_join import bloom_semi_join

    fact, dim = _fact_dim(spark)
    got = bloom_semi_join(fact, dim, "k", how="anti").select("rid", "k")
    want = fact.join(dim, "k", "left_anti").select("rid", "k")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the NULL-key row is a definite non-match and must survive
    assert got.where(F.col("rid") == 9991).count() == 1


def test_bloom_inner_matches_plain_inner(spark):
    from skrub_spark.operators.semi_join import bloom_semi_join

    fact, dim = _fact_dim(spark)
    dimv = dim.withColumn("payload", F.col("k") * 10)
    got = bloom_semi_join(fact, dimv, "k", how="inner").select(
        "rid", "payload"
    )
    want = fact.join(dimv, "k", "inner").select("rid", "payload")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_no_false_negatives(spark):
    """Every dim key passes the prefilter — the exactness invariant."""
    from skrub_spark.functions.bloom import (
        bloom_maybe_contains,
        bloom_size_bits,
        build_bloom_bits,
    )

    keys = spark.range(200).select(F.col("id").alias("k"))
    m = bloom_size_bits(200)
    bits = build_bloom_bits(keys, "k", m)
    missed = keys.where(
        ~bloom_maybe_contains(
            F.col("k"), F.expr("array(" + ",".join(f"{b}L" for b in bits) + ")"), m
        )
    ).count()
    assert missed == 0


def test_bloom_rejects_bad_how(spark):
    from skrub_spark.operators.semi_join import bloom_semi_join

    fact, dim = _fact_dim(spark)
    with pytest.raises(ValueError):
        bloom_semi_join(fact, dim, "k", how="full")


# --------------------------------------------- mutual_best_match


def test_mutual_best_match_symmetry(spark):
    from skrub_spark.operators.matching import mutual_best_match

    # l1's best is r1 and vice versa; l2's best is r1 but r1 prefers
    # l1 -> l2 unmatched.
    pairs = spark.createDataFrame(
        [
            ("l1", "r1", 0.9),
            ("l1", "r2", 0.5),
            ("l2", "r1", 0.8),
            ("l2", "r2", 0.4),
        ],
        "l string, r string, s double",
    )
    got = {
        (r["l"], r["r"])
        for r in mutual_best_match(pairs, "l", "r", "s").collect()
    }
    assert got == {("l1", "r1")}


def test_mutual_best_match_ascending_and_ties(spark):
    from skrub_spark.operators.matching import mutual_best_match

    # distance mode; tie on (l1,r1) vs (l1,r2) breaks to the smaller
    # partner id deterministically.
    pairs = spark.createDataFrame(
        [("l1", "r1", 2.0), ("l1", "r2", 2.0), ("l2", "r2", 1.0)],
        "l string, r string, s double",
    )
    got = {
        (r["l"], r["r"])
        for r in mutual_best_match(
            pairs, "l", "r", "s", ascending=True
        ).collect()
    }
    assert got == {("l1", "r1"), ("l2", "r2")}


# --------------------------------------- sorted_neighborhood_pairs


def _brute_snm(rows, window):
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    out = set()
    for i, (ida, _) in enumerate(order):
        for j in range(i + 1, min(i + window + 1, len(order))):
            out.add((ida, order[j][0], j - i))
    return out


@pytest.mark.parametrize("window,buckets", [(3, 4), (1, 2), (5, 7)])
def test_snm_matches_brute_force(spark, window, buckets):
    from skrub_spark.operators.matching import sorted_neighborhood_pairs

    rows = [(i, (i * 37) % 101) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, k long")
    got = {
        (r["id_a"], r["id_b"], r["pos_dist"])
        for r in sorted_neighborhood_pairs(
            df, "id", "k", window=window, num_buckets=buckets
        ).collect()
    }
    assert got == _brute_snm(rows, window)


def test_snm_bucket_invariance_and_tiny_buckets(spark):
    """Same pair set whatever the bucket count — including buckets
    smaller than the window (the merge path)."""
    from skrub_spark.operators.matching import sorted_neighborhood_pairs

    rows = [(i, i % 7) for i in range(25)]  # heavy ties too
    df = spark.createDataFrame(rows, "id long, k long")
    ref = _brute_snm(rows, 4)
    for nb in (1, 3, 13):
        got = {
            (r["id_a"], r["id_b"], r["pos_dist"])
            for r in sorted_neighborhood_pairs(
                df, "id", "k", window=4, num_buckets=nb
            ).collect()
        }
        assert got == ref, f"num_buckets={nb}"


def test_snm_null_keys_excluded_and_window_validation(spark):
    from skrub_spark.operators.matching import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 11)], "id long, k long"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "id", "k", window=2
        ).collect()
    }
    assert got == {(1, 3)}
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "k", window=0)


# ----------------------------------------- permutation_test_means


def test_permutation_null_case_large_p(spark):
    """Same distribution in both groups -> p nowhere near 0."""
    from skrub_spark.report.permutation import permutation_test_means

    rows = [(i, "a" if i % 2 == 0 else "b", float((i // 2) % 10)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, x double")
    r = permutation_test_means(df, "x", "g", "k", n_perm=50).first()
    assert r["group_a"] == "a" and r["group_b"] == "b"
    assert r["n_a"] == 200 and r["n_b"] == 200
    assert r["p_value"] > 0.2


def test_permutation_shifted_means_small_p(spark):
    from skrub_spark.report.permutation import permutation_test_means

    rows = [(i, "a", float(i % 5)) for i in range(200)] + [
        (1000 + i, "b", 50.0 + (i % 5)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k long, g string, x double")
    r = permutation_test_means(df, "x", "g", "k", n_perm=50).first()
    assert abs(r["diff_obs"] + 50.0) < 1e-9
    # no permuted relabeling can beat a 50-point shift
    assert r["n_ge"] == 0
    assert abs(r["p_value"] - 1.0 / 51.0) < 1e-5


def test_permutation_deterministic_across_partitionings(spark):
    from skrub_spark.report.permutation import permutation_test_means

    rows = [(i, "a" if i % 3 == 0 else "b", float((i * 7) % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, g string, x double")
    r1 = permutation_test_means(df, "x", "g", "k", n_perm=40).first()
    r2 = permutation_test_means(
        df.repartition(17), "x", "g", "k", n_perm=40
    ).first()
    assert r1.asDict() == r2.asDict()


# ------------------------------------- conformal_mean_intervals


def test_conformal_coverage_guarantee(spark):
    """Marginal coverage on the held-out test split ~ >= 1 - alpha
    (exchangeable data; allow small-sample slack)."""
    from skrub_spark.report.conformal import conformal_mean_intervals

    rows = [(i, "g", float((i * 131) % 97)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, g string, y double")
    r = conformal_mean_intervals(df, "y", "k", ["g"], alpha=0.1).first()
    assert r["n_train"] + r["n_cal"] + r["n_test"] == 2000
    assert r["coverage"] >= 0.85
    assert abs((r["hi"] - r["lo"]) / 2 - r["qhat"]) < 1e-9


def test_conformal_empty_calibration_yields_null(spark):
    from skrub_spark.report.conformal import conformal_mean_intervals

    # 3 rows whose md5 buckets all land in train/test is unlikely;
    # force it: cal_pct=0 guarantees an empty calibration split.
    rows = [(i, "g", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, g string, y double")
    r = conformal_mean_intervals(
        df, "y", "k", ["g"], alpha=0.1, cal_pct=0
    ).first()
    assert r["qhat"] is None and r["coverage"] is None


def test_conformal_qhat_is_calibration_order_statistic(spark):
    from skrub_spark.report.conformal import conformal_mean_intervals

    rows = [(i, "g", float((i * 17) % 29)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, g string, y double")
    r = conformal_mean_intervals(df, "y", "k", ["g"], alpha=0.2).first()
    # recompute driver-side
    import hashlib

    def bucket(k):
        return int(hashlib.md5(f"conf{k}".encode()).hexdigest()[:15], 16) % 100

    train = [y for k, _, y in rows if bucket(k) >= 50]
    cal = [y for k, _, y in rows if 20 <= bucket(k) < 50]
    pred = round(sum(train) / len(train), 6)
    res = sorted(abs(y - pred) for y in cal)
    rank = min((8000 * (len(cal) + 1) + 9999) // 10000, len(cal))
    assert abs(r["qhat"] - res[rank - 1]) < 1e-9


# ------------------------------------------------ pmi_collocations


def test_pmi_planted_collocation_wins(spark):
    from skrub_spark.operators.collocations import pmi_collocations

    # "zig zag" always adjacent; "foo"/"bar" common but independent.
    docs = [
        (i, "foo bar zig zag " + ("foo " * (i % 3)) + "bar") for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = pmi_collocations(df, "text", "doc_id", min_count=5, top_k=3).collect()
    assert (top[0]["w1"], top[0]["w2"]) == ("zig", "zag")


def test_pmi_min_count_filters_hapax(spark):
    from skrub_spark.operators.collocations import pmi_collocations

    docs = [(1, "rare pairx"), (2, "common word common word common word")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_collocations(df, "text", "doc_id", min_count=2, top_k=10).collect()
    assert all((r["w1"], r["w2"]) != ("rare", "pairx") for r in rows)


def test_pmi_score_matches_hand_computation(spark):
    from skrub_spark.operators.collocations import pmi_collocations

    df = spark.createDataFrame(
        [(i, "aa bb") for i in range(7)], "doc_id long, text string"
    )
    r = pmi_collocations(df, "text", "doc_id", min_count=5, top_k=5).first()
    # N=14, c_xy=7, c_aa=7, c_bb=7 -> 14*7*1e6 // 49 = 2000000
    assert r["pair_count"] == 7 and r["score_scaled"] == 2_000_000


# ------------------------------------------------ link_prediction


def _lp_edges(spark):
    # two triangles sharing a node + a pendant
    return spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6)],
        "src long, dst long",
    )


def test_link_prediction_scores(spark):
    from skrub_spark.operators.graph import link_prediction

    got = {
        (r["node_a"], r["node_b"]): r
        for r in link_prediction(_lp_edges(spark)).collect()
    }
    # 1-4: share neighbor 3 (deg 4); not adjacent
    r = got[(1, 4)]
    assert r["common_neighbors"] == 1
    assert r["ra_scaled"] == 1000000000000 // 4
    # deg(1)=2, deg(4)=2 -> jaccard = 1 / (2 + 2 - 1)
    assert abs(r["jaccard"] - round(1 / 3, 6)) < 1e-9
    # adjacent pairs never appear
    assert (1, 2) not in got and (3, 5) not in got


def test_link_prediction_max_degree_drops_hub_wedges(spark):
    from skrub_spark.operators.graph import link_prediction

    full = {
        (r["node_a"], r["node_b"])
        for r in link_prediction(_lp_edges(spark)).collect()
    }
    capped = {
        (r["node_a"], r["node_b"])
        for r in link_prediction(_lp_edges(spark), max_degree=3).collect()
    }
    # node 3 (deg 4) wedges vanish under the cap
    assert (1, 4) in full and (1, 4) not in capped
    assert capped <= full


# ------------------------------------------ degree_assortativity


def test_assortativity_star_is_negative(spark):
    from skrub_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = degree_assortativity(star).first()
    assert r["n_stubs"] == 10
    assert r["assortativity"] == -1.0


def test_assortativity_regular_graph_null(spark):
    from skrub_spark.operators.graph import degree_assortativity

    cycle = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    r = degree_assortativity(cycle).first()
    assert r["assortativity"] is None


# ------------------------------------------------- rolling_hampel


def test_rolling_hampel_flags_planted_spike(spark):
    from skrub_spark.operators.sequence import rolling_hampel

    import datetime as dt

    rows = [
        ("a", dt.date(2024, 1, 1) + dt.timedelta(days=i),
         100 + (i % 3) + (900 if i == 10 else 0))
        for i in range(21)
    ]
    df = spark.createDataFrame(rows, "g string, day date, cnt long")
    out = {r["period"]: r for r in rolling_hampel(
        df, ["g"], "day", "cnt", half_window=3
    ).collect()}
    spike_day = dt.date(2024, 1, 11)
    assert out[spike_day]["is_outlier"] is True
    flagged = [p for p, r in out.items() if r["is_outlier"]]
    assert flagged == [spike_day]


def test_rolling_hampel_zero_mad_rule(spark):
    from skrub_spark.operators.sequence import rolling_hampel

    import datetime as dt

    rows = [("a", dt.date(2024, 1, 1) + dt.timedelta(days=i),
             5 if i != 4 else 6) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, day date, cnt long")
    out = {r["period"]: r for r in rolling_hampel(
        df, ["g"], "day", "cnt", half_window=2
    ).collect()}
    # constant frame -> mad 0; the lone 6 deviates -> flagged
    assert out[dt.date(2024, 1, 5)]["is_outlier"] is True
    assert out[dt.date(2024, 1, 1)]["is_outlier"] is False


# ------------------------------------------------ term_burstiness


def test_burstiness_clumped_vs_spread(spark):
    from skrub_spark.operators.keywords import term_burstiness

    docs = [(1, "cat cat cat dog"), (2, "dog mouse cat"), (3, "dog bird"),
            (4, "dog fish"), (5, "dog owl"), (6, "dog hen")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["term"]: r for r in term_burstiness(
        df, "text", "doc_id", min_df=2, top_k=10
    ).collect()}
    # cat: N=6,T=4,S=10 -> (60-16)/20 = 2.2 ; dog uniform -> 0
    assert abs(out["cat"]["vmr"] - 2.2) < 1e-9
    assert out["dog"]["vmr"] == 0.0
    assert out["cat"]["doc_freq"] == 2 and out["cat"]["total_count"] == 4


# --------------------------------------------- compression_ratio


def test_compression_ratio_matches_direct_zlib(spark):
    import zlib

    from skrub_spark.functions.text import compression_ratio

    texts = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "x9$k2@pQ!7zR#mW5&vT1*nB8^cL4)jH6(fD3",
        "",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, t string")
    got = {r["id"]: r["r"] for r in df.select(
        "id", compression_ratio(F.col("t")).alias("r")).collect()}
    for i, t in enumerate(texts):
        if not t:
            assert got[i] is None
        else:
            b = t.encode()
            assert abs(got[i] - round(len(zlib.compress(b, 6)) / len(b), 6)) < 1e-12
    # prose repeats compress much better than random-ish noise
    assert got[0] < 0.2 and got[1] < 0.4 and got[2] > 0.8


# ------------------------------------------ seasonal_naive_backtest


def test_seasonal_backtest_perfect_weekly_series(spark):
    import datetime as dt

    from skrub_spark.operators.sequence import seasonal_naive_backtest

    # strict weekly pattern -> seasonal MAE 0, naive MAE > 0
    rows = [("a", dt.date(2024, 1, 1) + dt.timedelta(days=i),
             [10, 20, 30, 40, 50, 60, 70][i % 7]) for i in range(28)]
    df = spark.createDataFrame(rows, "g string, day date, cnt long")
    r = seasonal_naive_backtest(df, ["g"], "day", "cnt", season=7).first()
    assert r["n_eval"] == 21
    assert r["mae_seasonal"] == 0.0 and r["mae_naive"] > 0
    assert r["skill"] == 0.0 and r["wape_seasonal"] == 0.0


# ------------------------------------------------ cross_correlation


def test_cross_correlation_planted_lead(spark):
    from skrub_spark.operators.sequence import cross_correlation

    # b is a shifted copy of a: b_{t+2} = a_t -> peak ccf at lag +2
    vals = [(i * 17) % 23 for i in range(40)]
    a = spark.createDataFrame(
        [(i, vals[i]) for i in range(40)], "x long, y long"
    )
    b = spark.createDataFrame(
        [(i + 2, vals[i]) for i in range(40)], "x long, y long"
    )
    out = {r["lag"]: r["ccf"] for r in cross_correlation(
        a, b, "x", "y", max_lag=3
    ).collect()}
    assert out[2] == max(out.values())
    # full-series normalization (the repo's acf convention) keeps
    # even a perfect shifted copy below 1 on short windows
    assert out[2] > 0.85


# ------------------------------------------------ quantile_normalize


def test_quantile_normalize_group_distributions_align(spark):
    from skrub_spark.functions.ranknorm import quantile_normalize

    # group a: 1..10, group b: 101..110 -> after qnorm both groups
    # take values from the pooled set with matching rank profiles
    rows = [(i, "a", i) for i in range(1, 11)] + [
        (100 + i, "b", 100 + i) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalize(df, "v", "g", "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["qnorm"])
    assert sorted(by_g["a"]) == sorted(by_g["b"])
    pooled = sorted([r[2] for r in rows])
    # rank r of 10 -> pooled idx ceil(r*20/10) = 2r -> even positions
    assert sorted(by_g["a"]) == [pooled[2 * r - 1] for r in range(1, 11)]


def test_quantile_normalize_identity_single_group(spark):
    from skrub_spark.functions.ranknorm import quantile_normalize

    rows = [(i, "g", (i * 13) % 31) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalize(df, "v", "g", "id").collect()
    # one group: the mapping is rank-preserving onto itself
    assert sorted(r["qnorm"] for r in out) == sorted(r["v"] for r in out)


# --------------------------------------------------------- bh_fdr


def test_bh_fdr_textbook_example(spark):
    from skrub_spark.report.multitest import bh_fdr

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "t string, p double"
    )
    out = {r["t"]: r for r in bh_fdr(
        df, "p", alpha=0.05, group_col="t"
    ).collect()}
    # step-up at alpha=.05: k=2 (p_2=.008 <= 2*.05/8; p_3=.039 > .01875)
    rejected = {t for t, r in out.items() if r["reject"]}
    assert rejected == {"t0", "t1"}
    # at alpha=.25 the step-up reaches k=8 (p_8=.205 <= .25): all reject
    out25 = bh_fdr(df, "p", alpha=0.25, group_col="t").collect()
    assert all(r["reject"] for r in out25)
    assert out["t0"]["q_value"] == 0.008
    assert out["t7"]["m_tests"] == 8 and out["t7"]["p_rank"] == 8


def test_bh_fdr_no_rejections(spark):
    from skrub_spark.report.multitest import bh_fdr

    df = spark.createDataFrame(
        [(f"t{i}", 0.5 + i / 100) for i in range(5)], "t string, p double"
    )
    out = bh_fdr(df, "p", alpha=0.05, group_col="t").collect()
    assert all(not r["reject"] for r in out)
    assert all(r["q_value"] <= 1.0 for r in out)


def test_group_deviation_pvalues_flag_planted_group(spark):
    from skrub_spark.report.multitest import permutation_group_deviation

    rows = [(i, "g%d" % (i % 4), float(i % 7)) for i in range(400)]
    rows += [(1000 + i, "hot", 100.0 + (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, g string, x double")
    out = {r["group"]: r for r in permutation_group_deviation(
        df, "x", "g", "k", n_perm=30
    ).collect()}
    # the planted group is extreme -> smallest possible p
    assert out["hot"]["p_value"] <= 1.0 / 31.0 + 1e-9
    assert abs(out["hot"]["diff_obs"]) == max(
        abs(r["diff_obs"]) for r in out.values()
    )
    # homogeneous groups alone -> no signal anywhere
    df0 = spark.createDataFrame(rows[:400], "k long, g string, x double")
    out0 = permutation_group_deviation(df0, "x", "g", "k", n_perm=30)
    assert all(r["p_value"] > 0.1 for r in out0.collect())


# ---------------------------------------------- attribution_markov


def test_markov_attribution_symmetric_channels(spark):
    import datetime as dt

    from skrub_spark.operators.intervals import attribution_markov

    # two interchangeable channels A/B before every conversion ->
    # equal removal effects and a 0.5/0.5 split
    rows = []
    eid = 0
    for u in range(40):
        t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=u)
        first, second = ("A", "B") if u % 2 == 0 else ("B", "A")
        for i, st in enumerate([first, second, "buy"]):
            rows.append((u, t0 + dt.timedelta(minutes=i), eid, st))
            eid += 1
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, eid long, state string"
    )
    out = {r["channel"]: r for r in attribution_markov(
        df, "u", "ts", "eid", "state", conversion="buy"
    ).collect()}
    assert set(out) == {"A", "B"}
    # K=8 finite horizon + per-iteration floor -> slightly below 1
    assert out["A"]["base_cvr"] == out["B"]["base_cvr"] > 0.995
    assert abs(out["A"]["attribution"] - 0.5) < 1e-9
    assert abs(out["B"]["attribution"] - 0.5) < 1e-9
    # the chain is memoryless: removing A still leaves START->B->buy
    assert out["A"]["removed_cvr"] == out["B"]["removed_cvr"]
    assert out["A"]["removed_cvr"] < out["A"]["base_cvr"]


def test_markov_attribution_gatekeeper_channel(spark):
    import datetime as dt

    from skrub_spark.operators.intervals import attribution_markov

    # C is on EVERY converting path; D on half -> C's removal effect
    # strictly larger
    rows, eid = [], 0
    for u in range(40):
        t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=u)
        path = ["C", "D", "buy"] if u % 2 == 0 else ["C", "buy"]
        for i, st in enumerate(path):
            rows.append((u, t0 + dt.timedelta(minutes=i), eid, st))
            eid += 1
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, eid long, state string"
    )
    out = {r["channel"]: r for r in attribution_markov(
        df, "u", "ts", "eid", "state", conversion="buy"
    ).collect()}
    assert out["C"]["removal_effect"] > out["D"]["removal_effect"]
    assert out["C"]["removed_cvr"] == 0.0
    assert abs(
        out["C"]["attribution"] + out["D"]["attribution"] - 1.0
    ) < 1e-6


def test_markov_attribution_journeys_cut_at_first_conversion(spark):
    import datetime as dt

    from skrub_spark.operators.intervals import attribution_markov

    # channel E only ever appears AFTER the first conversion ->
    # it must not appear in the output at all
    rows, eid = [], 0
    for u in range(10):
        t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=u)
        for i, st in enumerate(["A", "buy", "E", "E"]):
            rows.append((u, t0 + dt.timedelta(minutes=i), eid, st))
            eid += 1
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, eid long, state string"
    )
    out = attribution_markov(
        df, "u", "ts", "eid", "state", conversion="buy"
    ).collect()
    assert {r["channel"] for r in out} == {"A"}


# -------------------------------------------------------- sentences


def test_sentences_basic_segmentation(spark):
    from skrub_spark.functions.text import sentences

    df = spark.createDataFrame(
        [(1, "Hello there. How are you? Fine! Trailing"),
         (2, "One sentence only"),
         (3, "Ends with period."),
         (4, "")],
        "id long, t string",
    )
    got = {r["id"]: r["s"] for r in df.select(
        "id", sentences(F.col("t")).alias("s")).collect()}
    assert got[1] == ["Hello there.", "How are you?", "Fine!", "Trailing"]
    assert got[2] == ["One sentence only"]
    assert got[3] == ["Ends with period."]
    assert got[4] == []


def test_sentences_multi_punct_runs(spark):
    from skrub_spark.functions.text import sentences

    df = spark.createDataFrame([(1, "Wow!!! Really?! Yes.")], "id long, t string")
    got = df.select(sentences(F.col("t")).alias("s")).first()["s"]
    assert got == ["Wow!!!", "Really?!", "Yes."]


# ------------------------------------------- point-in-time features


def test_point_in_time_no_leakage(spark):
    """Every feature value must be computable from strictly-earlier
    events: replay driver-side and compare."""
    import skrub_spark.queries as Q

    out = Q.q_point_in_time_features(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    truth = {
        r[0]: r
        for r in con.execute(
            """
        SELECT event_id,
          (SELECT count(*) FROM events e2
           WHERE e2.user_id = e.user_id
             AND (epoch_us(e2.ts), e2.event_id)
                 < (epoch_us(e.ts), e.event_id)) AS n_prior
        FROM events e WHERE event_type = 'purchase'
        """
        ).fetchall()
    }
    assert len(rows) > 0
    for r in rows:
        assert r["n_prior"] == truth[r["event_id"]][1]


# ----------------------------------------------------- experiment


def test_cuped_reduces_to_raw_when_uncorrelated(spark):
    from skrub_spark.report.experiment import cuped_adjust

    # x constant -> theta undefined/0-variance path is excluded by
    # construction; use x independent of y: theta ~ 0, adjusted lift
    # ~ raw lift
    rows = [(i, "a" if i % 2 == 0 else "b",
             float(i % 10), float((i * 7) % 3)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, y double, x double")
    r = cuped_adjust(df, "y", "x", "g").first()
    assert r["variant_a"] == "a" and r["variant_b"] == "b"
    assert abs(r["lift_cuped"] - r["lift_raw"]) < 0.2
    assert r["var_reduction_pct"] < 5


def test_cuped_perfect_covariate_kills_variance(spark):
    from skrub_spark.report.experiment import cuped_adjust

    # y = x exactly -> rho^2 = 1 -> 100% variance reduction, theta=1
    rows = [(i, "a" if i % 2 == 0 else "b", float(i % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, x double").withColumn(
        "y", F.col("x")
    )
    r = cuped_adjust(df, "y", "x", "g").first()
    assert abs(r["theta"] - 1.0) < 1e-9
    assert abs(r["var_reduction_pct"] - 100.0) < 1e-6
    # with y==x the adjustment removes ALL between-variant noise
    assert abs(r["lift_cuped"]) < 1e-6


def test_covariate_balance_flags_planted_imbalance(spark):
    from skrub_spark.report.experiment import covariate_balance

    rows = [
        (i, "a" if i % 2 == 0 else "b",
         float(i % 7),                       # balanced
         float(i % 7) + (5.0 if i % 2 == 0 else 0.0))  # imbalanced
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, g string, bal double, imb double")
    out = {r["covariate"]: r for r in covariate_balance(
        df, ["bal", "imb"], "g"
    ).collect()}
    assert out["imb"]["imbalanced"] is True
    assert out["bal"]["imbalanced"] is False
    assert abs(out["bal"]["smd"]) < 0.1 < abs(out["imb"]["smd"])


def test_did_recovers_planted_effect(spark):
    from skrub_spark.report.experiment import did_estimate

    # control: 10 pre / 12 post (trend +2); treated: 11 pre / 18 post
    # (trend +2 plus effect +5)
    rows = []
    for i in range(400):
        t = i % 2 == 1
        p = i % 4 >= 2
        y = (11 if t else 10) + (2 if p else 0) + (5 if t and p else 0)
        rows.append((i, t, p, float(y)))
    df = spark.createDataFrame(rows, "id long, t boolean, p boolean, y double")
    r = did_estimate(df, "y", treated=F.col("t"), post=F.col("p")).first()
    assert r["did"] == 5.0
    assert r["diff_treated"] == 7.0 and r["diff_control"] == 2.0


# ---------------------------------------------------- nelson_aalen


def test_nelson_aalen_hand_computed(spark):
    from skrub_spark.report.survival import nelson_aalen

    # g: events at t=1 (2 of 5 at risk), t=2 (1 of 3), censor at 2
    rows = [
        ("g", 1, 1), ("g", 1, 1), ("g", 2, 1), ("g", 2, 0), ("g", 3, 0),
    ]
    df = spark.createDataFrame(rows, "grp string, t long, e long")
    out = {r["t"]: r for r in nelson_aalen(df, "grp", "t", "e").collect()}
    assert out[1]["n_risk"] == 5 and out[1]["hazard_inc"] == 0.4
    assert out[2]["n_risk"] == 3
    assert abs(out[2]["hazard_inc"] - round(1 / 3, 6)) < 1e-12
    assert abs(out[2]["cum_hazard"] - (0.4 + round(1 / 3, 6))) < 1e-12
    # censored-only time contributes nothing
    assert out[3]["hazard_inc"] == 0.0
    assert out[3]["cum_hazard"] == out[2]["cum_hazard"]


def test_nelson_aalen_vs_km_consistency(spark):
    """exp(-H) >= KM survival pointwise (standard inequality)."""
    from skrub_spark.report.survival import kaplan_meier, nelson_aalen

    rows = [("g", (i * 3) % 11, 1 if i % 4 else 0) for i in range(80)]
    df = spark.createDataFrame(rows, "grp string, t long, e long")
    km = {r["t"]: r["survival"] for r in kaplan_meier(
        df, "grp", "t", "e").collect()}
    na = {r["t"]: r["fh_survival"] for r in nelson_aalen(
        df, "grp", "t", "e").collect()}
    for t in km:
        assert na[t] >= km[t] - 1e-9


# ----------------------------------------------------- json_profile


def test_json_profile_type_lattice(spark):
    from skrub_spark.report.profiling import json_profile

    rows = [
        (1, '{"a": 1, "b": "x", "c": 1.5, "d": true, "e": null}'),
        (2, '{"a": 2, "b": "123", "c": -2.5e3, "d": false}'),
        (3, '{"a": -7, "b": "y"}'),
    ]
    df = spark.createDataFrame(rows, "id long, js string")
    out = {r["key"]: r for r in json_profile(df, "js").collect()}
    assert out["a"]["n_int"] == 3 and out["a"]["n_present"] == 3
    # "123" stringifies to 123 -> counted int (documented lattice)
    assert out["b"]["n_str"] == 2 and out["b"]["n_int"] == 1
    assert out["c"]["n_float"] == 2
    assert out["d"]["n_bool"] == 2
    assert out["e"]["n_null"] == 1 and out["e"]["n_present"] == 1
    assert out["a"]["n_distinct"] == 3


def test_json_profile_malformed_rows_ignored(spark):
    from skrub_spark.report.profiling import json_profile

    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, "not json"), (3, None)],
        "id long, js string",
    )
    out = json_profile(df, "js").collect()
    assert len(out) == 1 and out[0]["key"] == "a"


# ----------------------------------------------------- churn labels


def test_churn_labels_censoring_and_horizon(spark):
    import skrub_spark.queries as Q

    out = {r["event_type"]: r for r in Q.q_churn_labels(
        spark, "/root/testdata/sf0.001").collect()}
    assert out  # labelable rows exist
    for r in out.values():
        assert 0.0 <= r["churn_rate"] <= 1.0
        assert r["n_churned"] <= r["n_labeled"]


# ------------------------------------------------------- ipf_rake


def test_ipf_margins_converge(spark):
    from skrub_spark.operators.raking import ipf_rake

    cells = spark.createDataFrame(
        [(0, "A", 10), (0, "B", 30), (1, "A", 20), (1, "B", 40)],
        "r long, c string, w long",
    )
    rt = spark.createDataFrame([(0, 50), (1, 50)], "r long, t long")
    ct = spark.createDataFrame([("A", 60), ("B", 40)], "c string, t long")
    out = ipf_rake(cells, "r", "c", "w", rt, ct, n_iter=20).collect()
    rows = {}
    colsum = {}
    for x in out:
        rows[x["r"]] = rows.get(x["r"], 0) + x["weight_raked"]
        colsum[x["c"]] = colsum.get(x["c"], 0) + x["weight_raked"]
    assert abs(rows[0] - 50) < 0.01 and abs(rows[1] - 50) < 0.01
    assert abs(colsum["A"] - 60) < 0.01 and abs(colsum["B"] - 40) < 0.01


def test_ipf_structural_zeros_preserved(spark):
    from skrub_spark.operators.raking import ipf_rake

    cells = spark.createDataFrame(
        [(0, "A", 10), (1, "B", 10)], "r long, c string, w long"
    )
    rt = spark.createDataFrame([(0, 30), (1, 70)], "r long, t long")
    ct = spark.createDataFrame([("A", 30), ("B", 70)], "c string, t long")
    out = {(x["r"], x["c"]): x["weight_raked"] for x in ipf_rake(
        cells, "r", "c", "w", rt, ct, n_iter=15).collect()}
    # only the two existing cells come back, raked to their margins
    assert set(out) == {(0, "A"), (1, "B")}
    assert abs(out[(0, "A")] - 30) < 0.01
    assert abs(out[(1, "B")] - 70) < 0.01


def test_ipf_unrakeable_target_raises(spark):
    import pytest as _pytest

    from skrub_spark.operators.raking import ipf_rake

    cells = spark.createDataFrame([(0, "A", 10)], "r long, c string, w long")
    rt = spark.createDataFrame([(0, 10), (1, 90)], "r long, t long")
    ct = spark.createDataFrame([("A", 100)], "c string, t long")
    with _pytest.raises(ValueError):
        ipf_rake(cells, "r", "c", "w", rt, ct)


# ----------------------------------------------------------- ALS


def test_als_beats_global_mean_baseline(spark):
    from skrub_spark.operators.recommend import als_rmse

    rows = []
    # planted block structure: users 0-19 love items 0-9, users
    # 20-39 love items 10-19
    for u in range(40):
        for i in range(20):
            hot = (u < 20) == (i < 10)
            rows.append((u, i, 5.0 if hot else 1.0))
    df = spark.createDataFrame(rows, "u long, i long, r double")
    rmse, baseline = als_rmse(df, "u", "i", "r", rank=4, maxIter=10)
    assert rmse < 0.5 * baseline


def test_als_recommendations_exclude_seen(spark):
    from skrub_spark.operators.recommend import als_recommend

    rows = [(u, i, 3.0) for u in range(30) for i in range(15) if (u + i) % 3]
    df = spark.createDataFrame(rows, "u long, i long, r double")
    seen = {(u, i) for u, i, _ in rows}
    recs = als_recommend(df, "u", "i", "r", top_k=3, max_iter=5).collect()
    assert recs
    for r in recs:
        assert (r["user"], r["item"]) not in seen
        assert 1 <= r["rec_rank"] <= 3


# --------------------------------------------------- fightin_words


def test_fightin_words_planted_marker_term(spark):
    from skrub_spark.operators.keywords import fightin_words

    docs = [(i, "a", "alpha shared words here") for i in range(30)]
    docs += [(100 + i, "b", "beta shared words here") for i in range(30)]
    df = spark.createDataFrame(docs, "id long, g string, text string")
    out = fightin_words(df, "text", "g", "a", min_count=5, top_k=10).collect()
    by_term = {r["term"]: r for r in out}
    # 'alpha' is exclusive to corpus A -> top positive z;
    # common terms sit near zero
    assert out[0]["term"] == "alpha" and out[0]["z"] > 2
    assert abs(by_term["shared"]["z"]) < 1
    assert by_term["beta"]["z"] < -2


def test_fightin_words_counts_exact(spark):
    from skrub_spark.operators.keywords import fightin_words

    docs = [(1, "a", "x x x y y"), (2, "b", "x y y y y")]
    df = spark.createDataFrame(docs, "id long, g string, text string")
    out = {r["term"]: r for r in fightin_words(
        df, "text", "g", "a", min_count=4, top_k=10).collect()}
    assert out["x"]["count_a"] == 3 and out["x"]["count_b"] == 1
    assert out["y"]["count_a"] == 2 and out["y"]["count_b"] == 4


# ----------------------------------------------- neyman_allocation


def test_neyman_allocates_by_n_sigma(spark):
    from skrub_spark.operators.sampling import neyman_allocation

    rows = [(i, "low", float(5))             # zero variance
            for i in range(100)]
    rows += [(1000 + i, "hi", float(i % 100)) for i in range(100)]
    rows += [(2000 + i, "mid", float(i % 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, h string, v double")
    out = {r["h"]: r for r in neyman_allocation(
        df, "h", "v", n_total=90).collect()}
    assert out["low"]["n_alloc"] == 0 and out["low"]["stddev"] == 0.0
    assert out["hi"]["n_alloc"] > out["mid"]["n_alloc"] > 0
    assert sum(r["n_alloc"] for r in out.values()) <= 90
    assert abs(sum(r["alloc_weight"] for r in out.values()) - 1.0) < 1e-6


# ----------------------------------------- streaming_spike_flags


def test_streaming_spikes_cross_batch_baseline(spark, tmp_path):
    import glob as _glob
    import shutil as _shutil

    from skrub_spark.streaming.ops import streaming_spike_flags

    src = str(tmp_path / "src")
    import os as _os

    _os.makedirs(src)
    # batch 0: key 'a' baseline mean 10; batch 1: one 9 (no spike),
    # one 35 (>= 3x10 -> spike); key 'b' appears only in batch 1
    batches = [
        [(0, "a", 10.0), (2, "a", 10.0)],
        [(1, "a", 9.0), (3, "a", 35.0), (5, "b", 100.0)],
    ]
    for i, rows in enumerate(batches):
        d = str(tmp_path / f"w{i}")
        spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        dst = f"{src}/batch_{i}.parquet"
        _shutil.copyfile(_glob.glob(f"{d}/part-*.parquet")[0], dst)
        _os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_spike_flags(stream, "event_type", "event_id", "value")
        .writeStream.format("memory")
        .queryName("t_spikes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = {r["id"]: r for r in spark.table("t_spikes").collect()}
    assert out[0]["is_spike"] is None  # cold start
    assert out[1]["is_spike"] is False
    assert out[3]["is_spike"] is True
    assert out[3]["baseline_cnt"] == 2 and out[3]["baseline_sum6"] == 20_000_000
    assert out[5]["is_spike"] is None  # key unseen before batch 1


# -------------------------------------- sliding HLL / completions


def test_sliding_hll_window_equals_direct_sketch(spark):
    """The fanned 7-day merge must equal sketching each window's
    union directly (the hll_merge exactness property, windowed)."""
    from skrub_spark.functions.sketches import hll_registers

    rows = [((d * 31 + i) % 40, d) for d in range(10) for i in range(12)]
    df = spark.createDataFrame(rows, "uid long, day long")
    daily = hll_registers(df, "uid", ["day"], p=6)
    fanned = (
        daily.withColumn(
            "target_day", F.explode(F.sequence(F.col("day"), F.col("day") + 6))
        )
        .where(F.col("target_day") <= 9)
        .groupBy("target_day", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    got = {
        (r["target_day"], r["bucket"]): r["reg"] for r in fanned.collect()
    }
    for t in range(0, 10):
        win = df.where((F.col("day") >= t - 6) & (F.col("day") <= t))
        direct = hll_registers(win, "uid", p=6).collect()
        for r in direct:
            assert got[(t, r["bucket"])] == r["reg"], (t, r)


def test_prefix_completions_ranking(spark):
    import skrub_spark.queries as Q

    out = Q.q_prefix_completions(spark, "/root/testdata/sf0.001").collect()
    by_prefix = {}
    for r in out:
        by_prefix.setdefault(r["prefix"], []).append(r)
    for prefix, rows in by_prefix.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        freqs = [r["freq"] for r in rows]
        assert freqs == sorted(freqs, reverse=True)
        assert all(r["term"].startswith(prefix) for r in rows)


# -------------------------------------------------------- SFT ops


def _convos(spark):
    rows = [
        (1, "user\thi there\x1eassistant\thello friend how are you"),
        (2, "user\tq\x1eassistant\thello friend how are you"),
        (3, "assistant\tstarts wrong\x1eassistant\tdouble role here ok"),
        (4, "no tab record"),
    ]
    return spark.createDataFrame(rows, "doc_id long, convo string")


def test_parse_turns_and_stats(spark):
    from skrub_spark.operators.sft import conversation_stats, parse_turns

    turns = parse_turns(_convos(spark), "convo", "doc_id")
    stats = {r["conv_id"]: r for r in conversation_stats(turns).collect()}
    assert stats[1]["n_turns"] == 2 and stats[1]["alternates"] is True
    assert stats[1]["starts_with_user"] is True
    assert stats[3]["starts_with_user"] is False
    assert stats[3]["alternates"] is False  # assistant twice in a row
    assert stats[4]["n_malformed"] == 1 and stats[4]["n_user"] == 0
    assert stats[1]["assistant_chars"] == len("hello friend how are you")


def test_assistant_turn_dedup_cross_conversation(spark):
    from skrub_spark.operators.sft import assistant_turn_dedup, parse_turns

    turns = parse_turns(_convos(spark), "convo", "doc_id")
    dups = assistant_turn_dedup(turns, min_chars=10).collect()
    assert len(dups) == 1
    assert dups[0]["n_conversations"] == 2
    assert dups[0]["example_conv_id"] == 1


def test_preference_bias_planted(spark):
    from skrub_spark.operators.sft import preference_bias_report

    rows = [("longer chosen text", "short"), ("a", "bb"), ("xx", "yy")]
    df = spark.createDataFrame(rows, "chosen string, rejected string")
    r = preference_bias_report(df, "chosen", "rejected").first()
    assert r["n_pairs"] == 3
    assert r["n_chosen_longer"] == 1 and r["n_equal_len"] == 1
    assert abs(r["chosen_longer_rate"] - round(1 / 3, 6)) < 1e-12


# ------------------------------------------------------ gains_table


def test_gains_table_invariants(spark):
    import skrub_spark.queries as Q

    rows = Q.q_gains_table(spark, "/root/testdata/sf0.001").orderBy(
        F.col("decile").desc()
    ).collect()
    assert rows
    # cumulative columns are monotone from the best decile down and
    # the final row captures everything
    cum_n = [r["cum_n"] for r in rows]
    cum_pos = [r["cum_pos"] for r in rows]
    assert cum_n == sorted(cum_n) and cum_pos == sorted(cum_pos)
    assert abs(rows[-1]["cum_gain"] - 1.0) < 1e-9
    assert cum_n[-1] == sum(r["n"] for r in rows)
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0 and r["lift"] >= 0.0


# --------------------------------------- trimmed means / CCC


def test_trimmed_mean_drops_tails(spark):
    import skrub_spark.queries as Q

    out = {r["o_orderpriority"]: r for r in Q.q_trimmed_means(
        spark, "/root/testdata/sf0.001").collect()}
    for r in out.values():
        # 10% off each side
        assert r["n_kept"] == r["n_rows"] - 2 * (r["n_rows"] // 10)


def test_concordance_perfect_and_shifted(spark):
    from pyspark.sql import functions as F

    # reuse the query machinery through a local frame: CCC of y=x
    # is 1; a constant shift keeps pearson=1 but drops CCC
    import skrub_spark.queries as Q

    r = Q.q_concordance_ccc(spark, "/root/testdata/sf0.001").first()
    # the synthetic header total is independent of line revenue, so
    # the VALUE is near zero — pin the mathematical invariants:
    # CCC in [-1, 1] and |CCC| <= |Pearson| always
    assert -1.0 <= r["ccc"] <= 1.0
    assert abs(r["ccc"]) <= abs(r["pearson"]) + 1e-9


# ------------------------------------------------ jackknife ratio


def test_jackknife_se_shrinks_with_data(spark):
    from skrub_spark.report.experiment import jackknife_ratio_se

    def frame(n):
        rows = [(i, float((i * 7) % 13 + 1), float(1 + (i % 3 == 0)))
                for i in range(n)]
        return spark.createDataFrame(rows, "k long, num double, den double")

    small = jackknife_ratio_se(frame(200), "num", "den", "k").first()
    big = jackknife_ratio_se(frame(5000), "num", "den", "k").first()
    assert small["n_buckets"] == big["n_buckets"] == 20
    assert big["jk_se"] < small["jk_se"]
    assert big["jk_se"] > 0


def test_jackknife_constant_ratio_zero_se(spark):
    from skrub_spark.report.experiment import jackknife_ratio_se

    # num = 3*den everywhere -> every leave-one-out ratio is 3
    rows = [(i, 3.0 * (1 + i % 4), float(1 + i % 4)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, num double, den double")
    r = jackknife_ratio_se(df, "num", "den", "k").first()
    assert r["ratio"] == 3.0 and r["jk_se"] == 0.0
