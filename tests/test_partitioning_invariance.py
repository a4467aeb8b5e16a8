"""Battery-wide partitioning-invariance harness (r11, VERDICT r10
#4): the repo's central determinism claim — same results on any
cluster, any partitioning, any input layout — enforced as a FLEET
guarantee instead of per-op tests. ~30 exact-oracled queries sampled
across every family re-run under an adversarial layout (every table
deterministically repartitioned to 7 / coalesced to 1 / hash-
partitioned on its first column, which also permutes row order the
way a shuffled input-file order would) and must produce
BIT-IDENTICAL sorted rows vs the default run.

Floats are compared by repr (bit-exact): a query whose result moves
under repartitioning has an accumulation-order dependency — exactly
the class the integer-micro / DECIMAL-sum disciplines exist to
prevent."""

from __future__ import annotations

import pytest

from skrub_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"

# One+ per family: core agg/joins, temporal joins, dedup (minhash /
# simhash / jaccard / embedding / spans), search & similarity, text
# & curation, LM filters, encoders, target stats, robust stats &
# tests, survival, sequences & forecasting, graph, sampling &
# mixtures, IVM, reports, layout/sketches.
SAMPLED = [
    "pricing_summary",
    "agg_join_customer_orders",
    "fuzzy_join_customer_supplier",
    "asof_join",
    "range_join_incidents",
    "minhash_dedup_pairs",
    "simhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "embedding_dedup_pairs",
    "substring_dedup",
    "bm25_search",
    "more_like_this",
    "keywords_tfidf",
    "language_id",
    "quality_percentiles",
    "lm_perplexity_filter",
    "lm_perplexity_kn5",
    "target_encode",
    "woe_iv",
    "survival_km",
    "log_rank",
    "cmh_stratified",
    "holt_winters",
    "cusum_monitor",
    "theil_sen_trend",
    "markov_attribution",
    "ipf_raking",
    "domain_pagerank",
    "k_core",
    "knn_join",
    "quantile_bins",
    "weighted_median",
    "corpus_datasheet",
    "isotonic_quality",
    "doremi_weights",
    "doremi_mixture",
    "als_topk_frozen",
    "incremental_join",
    "ccnet_buckets",
    "unimax_allocation",
    "kcenter_coreset",
    "attribution_time_decay",
    "psm_pairs",
    "bfd_packing",
    "pii_checksum",
    "preference_pairs",
    "kn_frozen",
    "rouge_eval",
    "bleu_corpus",
    "reservoir_sample",
    "weighted_reservoir",
    "dl_name_pairs",
    "bradley_terry",
    "cohen_kappa",
    "fleiss_kappa",
    "clustering_ari",
    "krippendorff_alpha",
    "uplift_qini",
    "ipw_ate",
    "t_closeness",
    "dp_histogram",
    "rho_selection",
    "irt_rasch",
    "ab_power",
    "aipw_ate",
    "skipgram_pairs",
    "drift_wasserstein",
    "best_of_n",
    "fairness_report",
    "label_issues",
    "linkage_eval",
    "competing_risks",
]

_ORIG_LOAD = Q.load_table


def _adversarial_load(spark, sf_dir, name):
    """Deterministic per-table adversarial layout."""
    df = _ORIG_LOAD(spark, sf_dir, name)
    h = sum(ord(c) for c in name) % 3
    if h == 0:
        return df.repartition(7)
    if h == 1:
        return df.coalesce(1)
    return df.repartition(5, df.columns[0])


def _rows(df):
    return sorted(tuple(repr(v) for v in r) for r in df.collect())


def test_sampled_queries_registered():
    reg = Q.queries()
    missing = [n for n in SAMPLED if n not in reg]
    assert not missing, f"not in the battery: {missing}"


@pytest.mark.parametrize("name", SAMPLED)
def test_partitioning_invariance(spark, name, monkeypatch):
    fn = Q.queries()[name]
    base = _rows(fn(spark, SF_DIR))
    monkeypatch.setattr(Q, "load_table", _adversarial_load)
    try:
        alt = _rows(fn(spark, SF_DIR))
    finally:
        monkeypatch.setattr(Q, "load_table", _ORIG_LOAD)
    assert base == alt, (
        f"{name}: results moved under adversarial partitioning "
        f"({len(base)} vs {len(alt)} rows)"
    )
