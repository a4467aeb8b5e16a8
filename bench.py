"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: core joins/aggs + the LLM-pipeline operators.
HEADLINE = [
    "pricing_summary",
    "top_orders",
    "agg_join_customer_orders",
    "multi_agg_join",
    "agg_target_events",
    "datetime_features",
    "fuzzy_join_customer_supplier",
    "dedup_exact",
    "token_stats",
    "quality_scores",
    "language_id",
    "similarity_topk",
    "session_stats",
    "ngram_jaccard_pairs",
    "embedding_dedup_pairs",
    "minhash_dedup_pairs",
    "simhash_dedup_pairs",
    "revenue_by_region",
    "top_orders_per_customer",
    "windowed_counts",
    "session_windows",
    "interpolation_join",
    "squashing_scaler",
    "one_hot_mktsegment",
    "similarity_encoder_region",
    "json_props",
    "rollup_revenue",
    "acctbal_percentiles",
    "customers_without_orders",
    "orders_moving_avg",
    "pivot_segment_nation",
    "small_quantity_parts",
    "centroid_per_label",
    "text_encoder_embeddings",
    "fuzzy_join_numeric",
    "column_associations",
    "asof_join",
    "funnel_conversion",
    "retention_cohorts",
    # knn_join (exact mode) is the O(n²) oracle baseline — 30s at
    # sf0.1; the bucketed scale mode is what belongs in a bench:
    "knn_join_lsh",
    "forecast_revenue",
    "order_priority",
    "volume_shipping",
    "market_share",
    "returned_items",
    "promo_revenue",
    "discounted_revenue",
    "customer_distribution",
    "top_supplier",
    "large_volume_customers",
    "sales_opportunity",
    "range_join_incidents",
    "gapfill_hourly",
    "hash_split",
    "stratified_sample",
    "pack_chunks",
    "training_pipeline",
    "contamination",
    "skew_salted_agg",
    # excluded by design: bucketed_join_revenue / csv_source /
    # orc_source / topk_ivf (sink-write cost dominates, not a
    # throughput signal) and streaming_* (state-store fixed
    # overhead, see note below).
    # streaming_dedup runs in the correctness battery but not here:
    # its wall time is state-store/checkpoint fixed overhead (19s for
    # 5000 rows), not a throughput signal at bench scale.
]


def main() -> None:
    from skrub_spark import get_session
    from skrub_spark.queries import queries

    spark = get_session(app_name="skrub_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
