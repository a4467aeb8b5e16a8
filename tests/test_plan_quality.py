"""Physical-plan audits: assert the optimizations the 100 TB design
depends on actually appear in the executed plans.

These catch regressions like a filter that stops reaching the
parquet scan or a dimension join that silently becomes a
sort-merge-join — the failures that are invisible at sf0.01 and
fatal at scale.
"""

from __future__ import annotations

import contextlib
import io

from skrub_spark.queries import (
    q_agg_join_customer_orders,
    q_pricing_summary,
    q_revenue_by_region,
    q_token_stats,
    q_top_orders,
)

SF = "/root/testdata/sf0.001"


def plan_of(df, execute: bool = False) -> str:
    if execute:
        # AQE finalizes (and codegens) the plan only on execution —
        # and only for THIS DataFrame's QueryExecution (count() would
        # execute a clone and leave this plan un-finalized)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    df = q_pricing_summary(spark, SF)
    plan = formatted(df)
    # the shipdate filter must be pushed into the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning(spark):
    df = q_token_stats(spark, SF)
    plan = formatted(df)
    # scan must read only doc_id + text, not the whole documents schema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_broadcast_joins_used(spark):
    for q in (q_top_orders, q_agg_join_customer_orders, q_revenue_by_region):
        plan = plan_of(q(spark, SF))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, q
        # dim joins must not fall back to sort-merge
    plan = plan_of(q_agg_join_customer_orders(spark, SF))
    assert "SortMergeJoin" not in plan


def test_whole_stage_codegen_active(spark):
    plan = plan_of(q_pricing_summary(spark, SF), execute=True)
    assert "*(" in plan or "WholeStageCodegen" in plan


def test_partial_aggregation_before_shuffle(spark):
    # groupBy aggregates must have a partial (map-side) phase
    plan = plan_of(q_pricing_summary(spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_no_cartesian_in_agg_join(spark):
    plan = plan_of(q_agg_join_customer_orders(spark, SF))
    assert "CartesianProduct" not in plan


def test_fuzzy_join_aggregates_not_window(spark):
    from skrub_spark.queries import q_fuzzy_join_customer_supplier

    plan = plan_of(q_fuzzy_join_customer_supplier(spark, SF))
    # argmin implemented as aggregate (partial-agg capable), not a
    # row_number window over every candidate pair
    assert "Window" not in plan
    assert "Aggregate" in plan  # Hash/Sort/ObjectHashAggregate all fine
    assert "partial_min" in plan  # map-side combine present


def test_minhash_partial_aggregation(spark):
    from skrub_spark.queries import q_minhash_dedup_pairs

    plan = plan_of(q_minhash_dedup_pairs(spark, SF))
    # the 64 min-hash aggregates must have a map-side partial phase
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_jaccard_no_cartesian(spark):
    from skrub_spark.queries import q_ngram_jaccard_pairs

    plan = plan_of(q_ngram_jaccard_pairs(spark, SF))
    assert "CartesianProduct" not in plan


def test_forecast_revenue_pushdown(spark):
    """TPC-H Q6 shape: the date/discount/quantity predicates must
    reach the parquet scan as PushedFilters."""
    from skrub_spark.queries import q_forecast_revenue

    plan = formatted(q_forecast_revenue(spark, SF))
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "l_discount" in pushed and "l_quantity" in pushed


def test_volume_shipping_broadcasts_dims(spark):
    """TPC-H Q7 shape: both nation roles and the customer/supplier
    dims broadcast — only the fact tables shuffle."""
    from skrub_spark.queries import q_volume_shipping

    plan = plan_of(q_volume_shipping(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_order_priority_semi_join(spark):
    """TPC-H Q4 shape: the EXISTS runs as a (left) semi join, no
    aggregation-based dedup of lineitem."""
    from skrub_spark.queries import q_order_priority

    plan = plan_of(q_order_priority(spark, SF))
    assert "LeftSemi" in plan


def test_asof_join_single_shuffle(spark):
    """The union-tag asof plan must shuffle ONCE (the window's
    hashpartitioning on the key) — no range-join pair explosion, no
    extra exchange for the union."""
    from pyspark.sql import functions as F

    from skrub_spark import asof_join
    from skrub_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    df = asof_join(purchases, views, by="user_id")
    # AQE prints final + initial plans; count shuffles in the final only
    plan = plan_of(df, execute=True).split("== Initial Plan ==")[0]
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, got {n_exchanges}:\n{plan}"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_join_lsh_no_cartesian(spark):
    """LSH-bucketed k-NN join must be an equi-join on (table, bucket)
    — never a cross join of the two sides."""
    from skrub_spark.queries import q_knn_join_lsh

    df = q_knn_join_lsh(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_partition_pruned(spark, tmp_path):
    """A written IVF index is probed with partition filters on the
    cell column — the scan must not read all cells."""
    from skrub_spark.similarity.index import (
        build_ivf_index, read_ivf_index, topk_cosine_ivf_indexed,
        write_ivf_index,
    )
    from skrub_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    qv = emb.filter("vec_id = 0").first()["embedding"]
    idx, cents = build_ivf_index(emb, "embedding", "vec_id", n_cells=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(idx, cents, path)
    back, c2 = read_ivf_index(spark, path)
    probe = topk_cosine_ivf_indexed(back, c2, qv, k=5, n_probe=1)
    plan = formatted(probe)
    assert "PartitionFilters" in plan and "__ivf_cell" in plan


def test_hash_sampling_no_shuffle(spark):
    """Deterministic sampling is a pure filter: zero exchanges, and
    the projection still prunes at the scan."""
    from skrub_spark import deterministic_sample
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    df = deterministic_sample(docs, "doc_id", 0.25)
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "FileScan" in plan


def test_gapfill_two_narrow_shuffles(spark):
    """Gapfill = aggregate shuffle + spine/join/window shuffles on
    the KEY only — the spine never re-shuffles fact-sized data. The
    final plan must contain no more than 3 hash exchanges (agg,
    bounds, join/window share partitioning)."""
    from skrub_spark.queries import q_gapfill_hourly

    df = q_gapfill_hourly(spark, SF)
    plan = plan_of(df, execute=True).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_fuzzy_join_narrow_argmin_plan(spark):
    """r5 perf shapes must not regress: the exact fuzzy join spreads
    the left side (RoundRobin repartition) before the broadcast cross
    join, and the argmin aggregate carries NO first() payload
    aggregates (payload joins back by right-row id after the min)."""
    from skrub_spark.queries import q_fuzzy_join_customer_supplier

    df = q_fuzzy_join_customer_supplier(spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "RoundRobinPartitioning" in plan
    assert "first(" not in plan  # old wide-argmin shape
    assert plan.count("min(") >= 1


def test_knn_join_window_sheds_vectors(spark):
    """The top-k window's sort shuffle must carry scalars only: the
    embedding arrays may not appear in any operator at or above the
    Window (they are consumed by the cosine projection below it)."""
    from skrub_spark.sources import load_table
    from skrub_spark.similarity.knn_join import cosine_knn_join

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    df = cosine_knn_join(emb, emb, k=3, method="exact")
    plan = plan_of(df)
    window_part = plan.split("Window")[0]  # text ABOVE the Window op
    assert "__lv" not in window_part and "__rv" not in window_part
    assert "RoundRobinPartitioning" in plan


def test_embedding_lsh_narrow_candidates(spark):
    """Embedding LSH dedup: the pair dedup (id_a, id_b) must not
    carry the vectors — they join back after (two extra joins in the
    plan below the final projection)."""
    from skrub_spark.dedup.embedding import embedding_near_duplicates
    from skrub_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    df = embedding_near_duplicates(
        emb, "embedding", "vec_id", threshold=0.35, n_planes=3, n_tables=4
    )
    plan = plan_of(df)
    # the dedup aggregate groups on ids only, above the vector joins
    dedup_part = plan.split("HashAggregate")[1] if "HashAggregate" in plan else ""
    assert "va" not in dedup_part.split("Join")[0]


def test_boilerplate_removal_map_only(spark):
    """Boilerplate line removal is a pure map stage: zero exchanges,
    straight Project over the scan (the HOF lambdas themselves sit
    outside codegen, which is expected for array lambdas)."""
    from skrub_spark.operators.boilerplate import remove_boilerplate_lines
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    df = remove_boilerplate_lines(docs, "text")
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "FileScan" in plan


def test_span_dedup_shuffles_hashed_keys(spark):
    """Both span-dedup paths shuffle 8-byte xxhash64 window keys —
    never the w-line / w-token strings (at corpus scale a raw w-item
    string key multiplies shuffle bytes by ~w x item length), and
    per-doc repetition stats add ZERO exchanges of their own
    (map-only array scans)."""
    from skrub_spark.operators.repetition import repetition_stats
    from skrub_spark.operators.span_dedup import dedup_spans, dedup_token_spans
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    for df in (
        dedup_spans(docs, "text", "doc_id", window=3),
        dedup_token_spans(docs, "text", "doc_id", window=20),
        dedup_token_spans(docs, "text", "doc_id", window=20, counts_only=True),
    ):
        plan = plan_of(df)
        # the window-key partitioning column is the bigint hash
        assert "hashpartitioning(wkey#" in plan
        assert "xxhash64" in plan
        # first-occurrence resolution is a window rank, not a
        # groupBy(min-struct) + self-join on the key frame
        assert "row_number" in plan

    stats = repetition_stats(docs, "text", "doc_id")
    assert "Exchange" not in plan_of(stats)


def test_mixture_sample_broadcasts_counts(spark):
    """The strata-counts side of the mixture-sample join is |strata|
    rows and must broadcast — the data itself never shuffles for the
    join (the only exchange is the counts aggregation's own)."""
    from skrub_spark.operators.sampling import sample_to_targets
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "source")
    df = sample_to_targets(docs, "source", {"src0": 5, "src1": 5}, key="doc_id")
    plan = plan_of(df, execute=True)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_scoring_no_cartesian_and_partial_agg(spark):
    """LM training/scoring is explode -> groupBy -> join -> groupBy:
    no cartesian/nested-loop anywhere, and both count aggregations
    partial-aggregate before their shuffle."""
    from skrub_spark.operators.lm_filter import (
        score_ngram_perplexity,
        train_ngram_lm,
    )
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lm = train_ngram_lm(docs, n=2)
    df = score_ngram_perplexity(docs, lm)
    plan = plan_of(df, execute=True)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan  # map-side combine before shuffle


def test_incremental_dedup_hash_antijoin(spark):
    """The seen side travels as distinct 8-byte hashes and the join
    is a hash anti-join — no payload comparison, no nested loop."""
    from skrub_spark.dedup.exact import dedup_incremental
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    seen = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    df = dedup_incremental(new, seen)
    plan = plan_of(df, execute=True)
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_shuffle_single_exchange(spark):
    """shuffle_order is ONE hash exchange (the shard partitioning)
    feeding the per-shard window sort — no second data shuffle."""
    from skrub_spark.sources.sharding import shuffle_order
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id")
    df = shuffle_order(docs, key="doc_id", n_shards=8)
    plan = plan_of(df, execute=True).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_decontaminate_semi_join_no_cartesian(spark):
    """Decontamination is inverted-index relational algebra: the
    survivors come back via a semi-join, with no cartesian or
    nested-loop join anywhere."""
    from skrub_spark.dedup.contamination import decontaminate_train
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    ev = docs.filter("source IN ('src0','src1')")
    tr = docs.filter("source NOT IN ('src0','src1')")
    df = decontaminate_train(tr, ev)
    plan = plan_of(df, execute=True)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_read_prunes_to_one_version(spark, tmp_path):
    """A pinned-version filter over the snapshot history reaches the
    scan as a partition filter — other versions are pruned, not
    read-and-discarded."""
    from skrub_spark.sources.snapshots import (
        read_all_snapshots,
        write_snapshot,
    )

    root = str(tmp_path / "snaps")
    d = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    write_snapshot(d, root)
    write_snapshot(d, root)
    df = read_all_snapshots(spark, root).filter("v = 2")
    plan = formatted(df)
    part = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "v" in part


def test_minhash_buckets_batch_shape(spark):
    """Incremental near-dedup signatures are batch-shaped: the
    n_components mins run as HashAggregates WITH a map-side partial
    phase (the shuffle carries partially-combined rows, not raw
    grams), and no interpreted per-row aggregate fold appears."""
    from skrub_spark.dedup.minhash import minhash_buckets
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = plan_of(minhash_buckets(docs))
    assert "partial_min" in plan
    assert plan.count("HashAggregate") >= 2
    # the signature math stays in codegen'd min() aggregates — the
    # streaming op's interpreted fold ('aggregate(') never appears
    assert "aggregate(" not in plan.lower().replace("hashaggregate(", "")


def test_canonical_url_map_only(spark):
    """URL canonicalization is a pure projection: zero exchanges."""
    from pyspark.sql import functions as F

    from skrub_spark.operators.domains import canonical_url
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id")
    url = F.concat(
        F.lit("https://Site.com:443/p?b="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_source=x&a=1#f"),
    )
    df = docs.select(canonical_url(url).alias("c"))
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "FileScan" in plan


def test_weighted_sample_no_shuffle(spark):
    """Weighted sampling is a pure filter over the scan: zero
    exchanges (the per-row threshold is a map-side expression)."""
    from pyspark.sql import functions as F

    from skrub_spark.operators.sampling import sample_weighted
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    w = docs.withColumn("w", F.length("text").cast("double") / 1000.0)
    df = sample_weighted(w, "w", "doc_id")
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "FileScan" in plan


def test_curation_funnel_releases_caches(spark):
    """The funnel materializes its bounded per-stage rows eagerly and
    unpersists BOTH cached frames before returning (VERDICT r6 #2: no
    full-text frame may outlive the report at corpus scale), and the
    returned report is a local one-row-per-stage frame."""
    from skrub_spark.report.funnel import curation_funnel
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = curation_funnel(docs)
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before, "curation_funnel leaked a persisted frame"
    assert out.count() == 5
    # already materialized: re-reading must not touch the corpus
    assert "FileScan" not in plan_of(out)


def test_bloom_prefilter_exact_and_selective(spark):
    """The Bloom-prefiltered decontamination path (r7) must be
    bit-identical to the plain path — false positives die at the
    exact semi-join, false negatives are impossible — while the
    bitset BUILD collects only m_bits/64 longs and the membership
    test is a constant-folded Column (no Python, no key collect)."""
    from skrub_spark.dedup.contamination import decontaminate_train
    from skrub_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    is_eval = F.col("source").isin("src0", "src1")
    train, ev = docs.filter(~is_eval), docs.filter(is_eval)
    plain = sorted(
        r["doc_id"]
        for r in decontaminate_train(
            train, ev, "text", "doc_id", ngram=13
        ).select("doc_id").collect()
    )
    bloomed = sorted(
        r["doc_id"]
        for r in decontaminate_train(
            train, ev, "text", "doc_id", ngram=13, bloom=True
        ).select("doc_id").collect()
    )
    assert plain == bloomed


def test_bloom_bits_roundtrip(spark):
    """Every inserted key tests positive; a disjoint key set tests
    mostly negative (measured fp ~0.6% at 16 bits/key; assert a
    generous < 10% so the prefilter is actually selective)."""
    from skrub_spark.functions.bloom import (
        bloom_maybe_contains, bloom_size_bits, build_bloom_bits,
    )
    from pyspark.sql import functions as F

    keys = spark.range(0, 2000).select(
        (F.col("id") * 2654435761).alias("h")
    )
    m = bloom_size_bits(2000)
    bits = build_bloom_bits(keys, "h", m)
    hit = keys.filter(bloom_maybe_contains(F.col("h"), bits, m)).count()
    assert hit == 2000  # no false negatives, ever
    probe = spark.range(0, 2000).select(
        (F.col("id") * 2654435761 + 1).alias("h")
    )
    fp = probe.filter(bloom_maybe_contains(F.col("h"), bits, m)).count()
    assert fp < 200, fp


def test_quality_scoring_broadcast_and_partial_agg(spark):
    """Frozen-weight scoring must broadcast the n_features-row weight
    table (never sort-merge a corpus against 256 rows) and keep a
    map-side partial phase on the per-doc aggregation."""
    from skrub_spark._frozen import QUALITY_MODEL
    from skrub_spark.operators.quality_classifier import score_quality
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = plan_of(score_quality(docs, QUALITY_MODEL))
    # the 256-row weight table must build-side broadcast; the FINAL
    # doc_id join (corpus vs its per-doc scores — two same-grain
    # sides) is correctly a co-partitioned sort-merge, so only the
    # weight join's strategy is pinned
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan and "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_scored_pipeline_plan_shape(spark):
    """The learned-stage-0 composed pipeline stays relational: no
    cartesian products, no row-at-a-time Python, and the packing
    window runs per-language (hash partitioning present)."""
    from skrub_spark.queries import q_scored_pipeline

    plan = plan_of(q_scored_pipeline(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-wise Python UDFs
    assert "Window" in plan  # the packing cumsum


def test_bloom_bitset_not_in_plan_text(spark):
    """The Bloom bitset must ride as broadcast DATA: the decontaminate
    plan string stays small (a 16k-word literal array would inflate
    it by ~100KB and cost ~1s of analysis per probe reference)."""
    from pyspark.sql import functions as F

    from skrub_spark.dedup.contamination import decontaminate_train
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    is_eval = F.col("source").isin("src0", "src1")
    df = decontaminate_train(
        docs.filter(~is_eval), docs.filter(is_eval), "text", "doc_id",
        ngram=13, bloom=True,
    )
    plan = plan_of(df)
    assert len(plan) < 200_000, len(plan)
    assert "__bloom_bits" in plan  # the data-borne bitset column


def test_dsir_scoring_single_shuffle_constant_ratios(spark):
    """DSIR frozen-ratio scoring is ONE explode + ONE map-side-
    combined per-doc sum: the ratio vector rides as a constant-folded
    literal array (element_at), so the plan has NO join at all for
    the weights — only the final doc_id join back to the corpus —
    and no Python."""
    from skrub_spark._frozen import DSIR_MODEL
    from skrub_spark.operators.dsir import dsir_log_weight
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = plan_of(dsir_log_weight(docs, DSIR_MODEL))
    assert "partial_sum" in plan  # map-side combine on the doc sum
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # exactly one join: scores back onto the corpus rows (the old
    # weight-table join is gone — constant-folded literal lookup)
    n_joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1, plan


def test_dsir_resample_plans_as_takeordered(spark):
    """Gumbel-top-k must plan as a distributed TakeOrdered (per-
    partition top-k merge), never a global Sort of the corpus."""
    from skrub_spark._frozen import DSIR_MODEL
    from skrub_spark.operators.dsir import dsir_resample
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = plan_of(dsir_resample(docs, DSIR_MODEL, 20))
    assert "TakeOrderedAndProject" in plan
    # a global sort would show an Exchange rangepartitioning
    assert "rangepartitioning" not in plan


def test_pagerank_no_python_no_cartesian(spark):
    """Each PageRank iteration is joins + partial-agg sums — pure
    JVM relational ops, one shuffle exchange per iteration plus the
    initial edge repartition, never a cartesian or Python stage."""
    from pyspark.sql import functions as F

    from skrub_spark.operators.graph import pagerank
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id")
    edges = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * 31 + 7) % 97).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    plan = plan_of(pagerank(edges, n_iter=3))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_sum" in plan  # map-side combine on contributions


def test_compiled_gbt_is_map_only(spark):
    """The compiled tree ensemble is a single projection over the
    scan: zero exchanges, zero joins, zero Python — the serving
    shape MLlib transform can't give you."""
    from pyspark.sql import functions as F

    from skrub_spark._frozen import GBT_REGRESSION
    from skrub_spark.functions.tree_compile import ensemble_margin
    from skrub_spark.sources import load_table

    cust = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    df = cust.select(
        "c_custkey",
        ensemble_margin(GBT_REGRESSION, [F.col("c_nationkey")]).alias("p"),
    )
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "FileScan" in plan


def test_tfidf_keywords_idf_broadcast_no_extra_shuffle(spark):
    """The idf frame must broadcast back onto tf — a second
    corpus-sized Exchange on term would double the shuffle bytes
    at 100 TB."""
    from skrub_spark.queries import q_keywords_tfidf

    df = q_keywords_tfidf(spark, SF)
    plan = plan_of(df, execute=True).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    # the persisted tf frame feeds BOTH branches (one InMemory scan,
    # not a second explode+groupBy of the corpus)
    assert "InMemoryTableScan" in plan
    # corpus-scale exchanges: tf groupBy, the vocab df reduce, the
    # per-doc window — never a fourth
    assert plan.count("Exchange hashpartitioning") <= 3


def test_readability_is_map_only(spark):
    """Readability is pure per-row arithmetic — any Exchange means
    something regressed into a shuffle."""
    from skrub_spark.queries import q_readability

    df = q_readability(spark, SF)
    plan = plan_of(df)
    assert "Exchange" not in plan


def test_topk_binary_no_vector_shuffle(spark):
    """Hamming top-k is a TakeOrdered over packed words — the
    float embedding column must not appear past the scan and no
    hash Exchange may exist."""
    from skrub_spark.queries import q_topk_binary

    df = q_topk_binary(spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_cap_per_group_partitioned_window_not_global_sort(spark):
    """The quota cap must be a window partitioned by the group key
    (parallel across groups), never a global ORDER BY."""
    from skrub_spark.queries import q_domain_cap

    df = q_domain_cap(spark, SF)
    plan = plan_of(df)
    assert "Window" in plan
    # the only Exchange is hashpartitioning on the group key; a
    # rangepartitioning Exchange would be the global-sort smell
    assert "rangepartitioning" not in plan


def test_suppress_rare_single_key_shuffle(spark):
    """Class sizes + the join back share the quasi-key
    partitioning — Catalyst must not add a range sort."""
    from skrub_spark.queries import q_k_suppression

    df = q_k_suppression(spark, SF)
    plan = plan_of(df, execute=True)
    assert "rangepartitioning" not in plan


def test_mad_outliers_group_windows_no_global_sort(spark):
    """Both rank passes are windows partitioned by the GROUP key;
    the med/mad join-backs broadcast — a rangepartitioning
    Exchange would mean a corpus-wide sort sneaked in."""
    from skrub_spark.queries import q_mad_outliers

    df = q_mad_outliers(spark, SF)
    plan = plan_of(df)
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_benford_single_reduce_map_side_combined(spark):
    """Benford is one map + a 9-key groupBy: partial aggregation
    must exist, and nothing may range-sort."""
    from skrub_spark.queries import q_benford_audit

    df = q_benford_audit(spark, SF)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2
    assert "rangepartitioning" not in plan


def test_target_encoders_broadcast_stats_back(spark):
    """Category stats and totals are |C|-sized — they must
    broadcast onto the row-level frame, never sort-merge."""
    from skrub_spark.queries import q_target_encode_loo

    plan = plan_of(q_target_encode_loo(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_association_rules_prefilter_before_pair_join(spark):
    """The frequent-item broadcast semi-filter must apply BEFORE
    the per-basket self-join (downward-closure pruning), and the
    pair groupBy must be map-side combined."""
    from skrub_spark.queries import q_association_rules

    df = q_association_rules(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_triangle_stats_no_cartesian_all_equijoins(spark):
    """Wedge formation and closing are hash equi-joins on node /
    edge keys; a CartesianProduct would be the naive adjacency
    blow-up."""
    from skrub_spark.queries import q_triangle_stats

    df = q_triangle_stats(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_sequence_anomaly_entity_window_and_broadcast_matrix(spark):
    """The lag window partitions by entity (bounded frames) and
    the |states|² matrix broadcasts back onto the transition
    frame."""
    from skrub_spark.queries import q_sequence_anomaly

    df = q_sequence_anomaly(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan


def test_skyline_group_windows_no_cartesian(spark):
    """The 2-D sweep is two group-partitioned range-frame windows —
    no join at all, and nothing may globally range-sort."""
    from skrub_spark.queries import q_skyline_parts

    plan = plan_of(q_skyline_parts(spark, SF))
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Join" not in plan  # pure window operator


def test_spatial_join_is_cell_equijoin(spark):
    """Grid bucketing must turn the distance join into a hash
    equi-join on cell ids — the cross join is exactly what the
    operator exists to avoid."""
    from skrub_spark.queries import q_spatial_join_grid

    plan = plan_of(q_spatial_join_grid(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_audience_overlap_packs_map_side(spark):
    """Bitmap packing is ONE map-side-combined (segment, word)
    groupBy; the pairwise stage touches bitmap frames only."""
    from skrub_spark.queries import q_audience_overlap

    plan = plan_of(q_audience_overlap(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_item_cooccurrence_equijoins_only(spark):
    """Pair formation is a basket-keyed equi-join of the distinct
    (basket, item) frame; item counts join back by key."""
    from skrub_spark.queries import q_item_cooccurrence

    plan = plan_of(q_item_cooccurrence(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_gini_and_survival_group_partitioned_windows(spark):
    """Rank/risk windows partition by the group key — a global
    range sort would single-task the corpus."""
    from skrub_spark.queries import q_gini_concentration, q_survival_km

    assert "rangepartitioning" not in plan_of(
        q_gini_concentration(spark, SF)
    )
    assert "rangepartitioning" not in plan_of(q_survival_km(spark, SF))


def test_impute_median_broadcasts_medians_back(spark):
    """The |groups|-sized median frame must broadcast onto the row
    frame, never sort-merge."""
    from skrub_spark.queries import q_impute_median

    plan = plan_of(q_impute_median(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_interval_and_attribution_entity_partitioned(spark):
    """Gaps-and-islands and attribution windows partition by the
    entity key — no global range sort, no join in attribution."""
    from skrub_spark.queries import (
        q_attribution_last_touch,
        q_interval_coverage,
    )

    p1 = plan_of(q_interval_coverage(spark, SF))
    assert "rangepartitioning" not in p1
    p2 = plan_of(q_attribution_last_touch(spark, SF))
    assert "rangepartitioning" not in p2
    assert "Join" not in p2  # pure window operator


def test_hard_negatives_broadcasts_anchors(spark):
    """The anchor batch must broadcast onto the corpus (a
    non-broadcast cartesian would shuffle the corpus |anchors|×)."""
    from skrub_spark.queries import q_hard_negatives

    plan = plan_of(q_hard_negatives(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_group_quantiles_distinct_value_frames(spark):
    """The cumsum window runs over per-group DISTINCT values (the
    counting groupBy must be map-side combined first) and nothing
    globally range-sorts."""
    from skrub_spark.queries import q_latency_sla

    plan = plan_of(q_latency_sla(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "rangepartitioning" not in plan


def test_kn_scoring_no_python_in_hot_path(spark):
    """KN trigram scoring must stay JVM-side: no Python eval
    operators anywhere in the scoring plan (the count frames join,
    the probability expression is pure Column arithmetic)."""
    from skrub_spark.operators.lm_filter import (
        score_kn_perplexity, train_kn_trigram,
    )
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lm = train_kn_trigram(docs, "text")
    plan = plan_of(score_kn_perplexity(docs, lm))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_datasheet_column_pruning(spark):
    """The datasheet touches text/lang/source but must NEVER read
    the props-free columns it doesn't use — scans stay pruned."""
    from skrub_spark.report.datasheet import corpus_datasheet
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    plan = formatted(corpus_datasheet(docs))
    for rs in plan.split("ReadSchema:")[1:]:
        head = rs.splitlines()[0]
        assert "n_chars" not in head  # stored column never needed


def test_unigram_stats_partial_aggregation(spark):
    """The (doc, word) join side aggregates with a partial
    (map-side) HashAggregate before the shuffle — the Zipf
    discipline the module docstring claims."""
    from skrub_spark._frozen import UNIGRAM_MODEL
    from skrub_spark.operators.unigram_lm import (
        UnigramModel, unigram_token_stats,
    )
    from skrub_spark.sources import load_table

    model = UnigramModel(
        pieces=dict(UNIGRAM_MODEL["pieces"]),
        max_piece_len=int(UNIGRAM_MODEL["max_piece_len"]),
    )
    docs = load_table(spark, SF, "documents")
    plan = plan_of(unigram_token_stats(docs, model))
    # partial_count markers appear in partial aggregates
    assert "partial_" in plan


def test_holt_winters_single_shuffle_to_groups(spark):
    """The HW daily aggregation shuffles ONCE on (group, day) and
    once more for the per-group recurrence — no extra exchanges
    sneak in."""
    from skrub_spark.operators.forecast import holt_winters_forecast
    from skrub_spark.sources import load_table

    orders = load_table(spark, SF, "orders")
    df = holt_winters_forecast(
        orders, "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    plan = plan_of(df)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan[:2000]


def test_quantile_ci_one_shuffle(spark):
    """row_number + count ride the SAME window partitioning — one
    exchange total."""
    from skrub_spark.operators.winsorize import quantile_ci
    from skrub_spark.sources import load_table

    cust = load_table(spark, SF, "customer")
    plan = plan_of(quantile_ci(cust, ["c_mktsegment"], "c_acctbal"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_psm_blocking_no_cartesian(spark):
    """psm_match candidates come from score-bucket blocking — the
    plan must contain an equi-join on the bucket, never a cartesian
    product of treated x control."""
    from skrub_spark.queries import q_psm_pairs

    plan = plan_of(q_psm_pairs(spark, SF))
    assert "CartesianProduct" not in plan


def test_refresh_join_battery_no_sort_merge_of_view(spark):
    """The delta-join IVM battery plan broadcasts the planted deltas
    and never cartesian-joins; the only sort-merge joins allowed are
    the ones BUILDING the (unmaterialized in-query) base view."""
    from skrub_spark.queries import q_incremental_join

    plan = plan_of(q_incremental_join(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_kcenter_plan_no_shuffle_in_update(spark):
    """Each k-center round is a map-only least() update over the
    cached frame — no Exchange between the cache scan and the
    argmax partial aggregate."""
    from skrub_spark.similarity.mining import kcenter_select

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5)]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_select(df, "vec_id", "embedding", k=3)
    # the returned frame is a tiny createDataFrame of the chosen
    # rows; correctness of the claim is in the per-round plans,
    # which ran eagerly — here we just pin that the operator's
    # output is driver-built (no lingering shuffle lineage)
    assert "Exchange" not in plan_of(out)


def test_ccnet_no_corpus_language_window(spark):
    """ccnet_buckets (r12 distributed-rank rewrite): the corpus
    frame must never see a window partitioned by language alone —
    at CCNet scale one language is ~half the corpus and a window
    partition cannot span tasks. The id tie-break row_number
    partitions by (lang, score); the lang-only windows run solely
    over the bounded distinct-score frame (they aggregate the __c
    count column, never corpus rows)."""
    from skrub_spark.operators.lm_filter import ccnet_buckets

    df = spark.createDataFrame(
        [(i, "en", float(i % 5)) for i in range(30)],
        "doc_id long, lang string, avg_nll double",
    )
    plan = plan_of(ccnet_buckets(df, "lang", "avg_nll", "doc_id"))
    saw_row_number = False
    for line in plan.splitlines():
        if "row_number()" in line:
            saw_row_number = True
            # partition spec (second bracket group) must include the
            # score column, not lang alone
            assert "avg_nll" in line.split("], [")[1]
        if "windowspecdefinition(__lang" in line:
            assert "sum(__c" in line
    assert saw_row_number


def test_pii_checksum_no_python_in_plan(spark):
    """Checksum PII is pure Column work — extraction, Luhn/IBAN
    integer folds, and the replace fold must all stay JVM-side (no
    BatchEvalPython / ArrowEvalPython nodes)."""
    from skrub_spark.functions.text import redact_pii_checksum

    df = spark.createDataFrame(
        [("pay 4111111111111111 iban DE89370400440532013000",)],
        "text string",
    )
    plan = plan_of(df.select(redact_pii_checksum("text").alias("r")))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bfd_pack_single_shuffle_to_shards(spark):
    """bfd_pack's packable branch: ONE hash exchange on the shard
    key feeding the Arrow-batched group map — no other shuffle."""
    from skrub_spark.operators.packing import bfd_pack

    df = spark.createDataFrame(
        [(i, (i * 37) % 90 + 5) for i in range(100)],
        "doc_id long, n_tok long",
    )
    plan = plan_of(
        bfd_pack(df.repartition(4), "n_tok", "doc_id",
                 capacity=96, n_shards=4)
    )
    assert "FlatMapGroupsInPandas" in plan
    # the packable branch shuffles once on shard; the union's rest
    # branch is map-only (its only Exchange is the input repartition)
    assert plan.count("Exchange hashpartitioning(shard") == 1


def test_kn_frozen_scoring_broadcasts_model(spark):
    """Frozen-KN serving: every model join must broadcast the
    codebook-sized table — a sort-merge join of the corpus against
    a 300-row literal frame means the broadcast threshold broke."""
    from skrub_spark._frozen import KN_MODEL
    from skrub_spark.operators.lm_filter import (
        kn_from_frozen, score_kn_ngram_perplexity,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the dog") for i in range(20)],
        "doc_id long, text string",
    )
    lm = kn_from_frozen(spark, KN_MODEL)
    plan = plan_of(score_kn_ngram_perplexity(docs, lm), execute=True)
    assert plan.count("BroadcastHashJoin") >= 5
    assert "BatchEvalPython" not in plan


def test_preference_pairs_windows_prompt_partitioned(spark):
    """preference_pairs' only window is the per-prompt (rank, text)
    row_number — never a corpus-wide unpartitioned window."""
    from skrub_spark.operators.sft import preference_pairs

    df = spark.createDataFrame(
        [(f"p{i % 5}", f"r{i}", i % 3 + 1) for i in range(50)],
        "prompt string, resp string, rnk long",
    )
    plan = plan_of(preference_pairs(df, "prompt", "resp", "rnk"))
    for line in plan.splitlines():
        if "row_number()" in line and "windowspecdefinition" in line:
            assert "windowspecdefinition(prompt" in line


def test_rouge_no_python_no_cartesian(spark):
    from skrub_spark.report.texteval import bleu_corpus, rouge_n

    pairs = spark.createDataFrame(
        [(i, "a b c d e", "a b c x y") for i in range(10)],
        "pid long, cand string, ref string",
    )
    p1 = plan_of(rouge_n(pairs, "cand", "ref", "pid", n=2))
    assert "BatchEvalPython" not in p1
    assert "CartesianProduct" not in p1
    p2 = plan_of(bleu_corpus(pairs, "cand", "ref", "pid", max_n=2))
    assert "BatchEvalPython" not in p2
    assert "CartesianProduct" not in p2


def test_rho_select_take_ordered(spark):
    """rho_select's top-k compiles to TakeOrderedAndProject —
    per-partition heaps, never a global range sort."""
    from pyspark.sql import functions as F

    from skrub_spark.operators.lm_filter import rho_select

    cur = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("avg_nll"),
    )
    ref = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("double").alias("avg_nll"),
    )
    plan = plan_of(rho_select(cur, ref, 10))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_label_issues_map_only_after_broadcast(spark):
    """label_issues: one aggregate for the thresholds, a broadcast
    back, then a map-only flag — no corpus groupBy on the flag
    path, no window, no Python."""
    from pyspark.sql import functions as F

    from skrub_spark.report.evaluation import label_issues
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        F.concat(F.lit("c"), (F.col("doc_id") % 2).cast("string"))
        .alias("lab"),
        (F.col("doc_id") % 10 / 10.0).alias("pa"),
        (F.col("doc_id") % 7 / 7.0).alias("pb"),
    )
    plan = plan_of(
        label_issues(docs, "doc_id", "lab", {"c0": "pa", "c1": "pb"})
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_wasserstein_distinct_value_window(spark):
    """wasserstein_1d: the cumulative window runs over the merged
    DISTINCT value frame (post-aggregation), and the per-side
    shuffles carry only the value column — no Python, no
    cartesian."""
    from pyspark.sql import functions as F

    from skrub_spark.report.drift import wasserstein_1d
    from skrub_spark.sources import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    out = wasserstein_1d(
        li.where(F.col("l_returnflag") == "R"),
        li.where(F.col("l_returnflag") == "N"),
        "l_extendedprice",
    )
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the window sits above HashAggregate outputs (distinct values)
    assert "Window" in plan and "HashAggregate" in plan


def test_skipgram_doc_partitioned_joins(spark):
    """skipgram_pairs: the rank window and pair self-join both key
    on the doc id (bounded per-doc work); no Python, no cartesian,
    no corpus-wide unpartitioned window."""
    from skrub_spark.operators.collocations import skipgram_pairs
    from skrub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_of(
        skipgram_pairs(docs, "text", "doc_id", window=2,
                       subsample_t=1.0)
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "PartitionBy: []" not in plan


def test_query_quantization_matches_spark_rounding(spark):
    """r13 (ADVICE r12): topk_cosine_quantized quantizes the query on
    the DRIVER, relying on Decimal(repr(x)) + ROUND_HALF_UP
    reproducing Spark's round(double) (BigDecimal.valueOf, HALF_UP).
    Pin the cross-language invariant over a sweep that includes
    exact .5 boundaries, negatives, non-representable fractions and
    s == 0 dims: driver-computed codes must equal
    quantize_embeddings' JVM output dim for dim."""
    import decimal

    from pyspark.sql import functions as F

    from skrub_spark.similarity.quantize import quantize_embeddings

    # lo=0, hi=255 => code = round(x): x = n + 0.5 hits exact ties;
    # negative lo exercises d < 0; lo=hi exercises the s == 0 branch;
    # 0.1-style values exercise shortest-repr rounding.
    lo = [0.0, 0.0, 0.0, -2.0, -2.0, 3.5, 0.0, 0.0, -1.0]
    hi = [255.0, 255.0, 255.0, 2.0, 2.0, 3.5, 255.0, 255.0, 254.0]
    vec = [
        0.5,          # exact tie at code 0.5 -> 1 (HALF_UP)
        41.5,         # exact tie -> 42
        41.49999999999999,  # just below the tie
        -1.999,       # negative range
        1.7,          # (1.7+2)*255/4 -> non-representable fraction
        123.0,        # s == 0 dim -> code 0
        -3.0,         # clamps to 0
        300.0,        # clamps to 255
        126.5,        # tie after shift: (126.5+1)*255/255 = 127.5 -> 128
    ]
    quant = {"lo": lo, "hi": hi}

    def _round_half_up(t: float) -> int:
        return int(
            decimal.Decimal(repr(t)).to_integral_value(
                rounding=decimal.ROUND_HALF_UP
            )
        )

    driver_codes = []
    for x, lo_i, hi_i in zip(vec, lo, hi):
        s = float(hi_i) - float(lo_i)
        if s == 0.0:
            driver_codes.append(0)
        else:
            d = float(x) - float(lo_i)
            driver_codes.append(min(255, max(0, _round_half_up(d * 255.0 / s))))

    df = spark.createDataFrame([(vec,)], "embedding array<double>")
    spark_codes = list(
        quantize_embeddings(df, quant).select("codes").first()["codes"]
    )
    assert spark_codes == driver_codes


def test_operator_persists_release_with_clearCache(spark, sf_dir):
    """r13 (VERDICT r12 #7): operators whose persisted frames back
    their RETURNED lazy result (more_like_this w/norms,
    association_rules b, connected_components pairs) document a
    session-scope cache contract — spark.catalog.clearCache() after
    the last consumer releases every cached block. Assert the
    contract actually does: after materializing each operator and
    clearing, no RDD reports cached partitions."""
    from pyspark.sql import functions as F

    from skrub_spark.dedup.components import connected_components
    from skrub_spark.operators.association import association_rules
    from skrub_spark.operators.keywords import more_like_this
    from skrub_spark.sources import load_table

    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    more_like_this(docs, [1, 2], top_k=3).collect()
    baskets = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("b"), F.col("o_orderpriority").alias("i")
    )
    association_rules(baskets, "b", "i").collect()
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 5)], "id_a long, id_b long"
    )
    connected_components(pairs).collect()

    def cached_rdds():
        return [
            r
            for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if r.numCachedPartitions() > 0
        ]

    assert len(cached_rdds()) > 0  # the persists are live pre-clear
    spark.catalog.clearCache()
    assert cached_rdds() == []
