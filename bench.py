#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced through the noop sink (full evaluation of every column,
no driver-side collection cost). Timings are end-to-end wall clock per query
including plan + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_pipelines_cu_spark.queries import all_queries  # noqa: E402
from data_pipelines_cu_spark.session import get_spark  # noqa: E402

# Headline set: the reference's signature pipelines (events stats, hierarchical
# rollup, star join, window/top-k, dedup) + the north-star training-data ops.
HEADLINE = [
    "events_user_daily_counts",
    "cohort_retention",
    "purchase_funnel",
    "pricing_summary",
    "hourly_price_stats",
    "daily_price_rollup",
    "orders_by_region",
    "customer_order_totals",
    "top_events_per_user",
    "next_event_value",
    "dedup_keep_last",
    "daily_active_users",
    "best_hour_per_type",
    "doc_quality_scores",
    "doc_lang_id",
    "dedup_exact_groups",
    "simhash_fingerprints",
    "minhash_lsh_pairs",
    "ann_cosine_topk",
    "ann_cosine_topk_arrow",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "doc_winnowed_fingerprints",
    "nation_trade_flow",
    "min_cost_supplier_per_part",
    "event_value_percentiles",
    "late_shipment_priority",
    "unshipped_order_revenue",
    "regional_supplier_volume",
    "returned_item_losses",
    "customer_order_distribution",
    "disjunctive_predicate_revenue",
    "doc_repetition_ratio",
    "doc_token_rarity",
    "discount_band_revenue",
    "sole_late_supplier_orders",
    "doc_tfidf_top_terms",
    "user_activity_streaks",
]

REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # Warm the JVM + parquet footer caches with one tiny action so the first
    # timed query doesn't absorb session startup.
    queries["orders_by_region"].fn(spark, sf_dir).count()

    # min over REPEATS runs per query: the local box is shared, so a single
    # sample can absorb unrelated load; min-of-2 is the steady-state cost
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name].fn
        best = float("inf")
        for _ in range(REPEATS):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
