"""Physical-plan regression guards: the scale-critical plan properties
(pushdown, pruning, broadcast, no stray sort-merge joins) asserted from
`.explain`-level output — what ARCHITECTURE.md §9 documents, kept true.

These are the properties that decide 100 TB behavior; a silent regression
(e.g. a refactor breaking filter pushdown) changes no sf0.01 result but
10x-es a production scan."""

from __future__ import annotations

from data_pipelines_cu_spark.queries import all_queries

QUERIES = all_queries()


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = _formatted_plan(QUERIES["pricing_summary"].fn(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached the scan
    # projection pruned: key columns absent from the parquet read schema
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _formatted_plan(QUERIES["orders_by_region"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_event_time_range_pushed_to_int64_scan(spark, sf_dir):
    plan = _formatted_plan(QUERIES["events_window_stats"].fn(spark, sf_dir))
    # the range predicate must hit the raw nanosecond column at the scan
    assert "GreaterThanOrEqual(ts" in plan and "LessThan(ts" in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _formatted_plan(QUERIES["late_shipment_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in plan  # never a count-changing inner join


def test_events_agg_prunes_columns(spark, sf_dir):
    plan = _formatted_plan(QUERIES["events_user_daily_counts"].fn(spark, sf_dir))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read_schema and "event_type" not in read_schema


def test_ann_brute_force_broadcasts_queries(spark, sf_dir):
    plan = _formatted_plan(QUERIES["ann_cosine_topk"].fn(spark, sf_dir))
    # query set broadcast: corpus side never shuffles for the cross join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ml_scores_scan_prunes_and_stays_codegen(spark, sf_dir):
    """Batch inference of the linear model must be a pure projected scan:
    only the three feature/id columns read, no shuffle, no Python."""
    plan = _formatted_plan(QUERIES["ml_linear_scores"].fn(spark, sf_dir))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read_schema and "user_id" not in read_schema
    assert "Exchange" not in plan  # row-wise scoring never shuffles
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_lsh_join_is_bucket_equi_join_not_cross(spark, sf_dir):
    """The LSH candidate join must be an equi-join on the bucket key —
    a cross join here means bucketing silently stopped pruning."""
    plan = _formatted_plan(QUERIES["ann_lsh_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q3_shape_pushes_both_date_filters(spark, sf_dir):
    plan = _formatted_plan(QUERIES["unshipped_order_revenue"].fn(spark, sf_dir))
    # each date predicate reaches its own parquet scan — at 100 TB these
    # prune most of both fact tables before the join
    assert "GreaterThan(l_shipdate,1998-01-01" in plan
    assert "LessThan(o_orderdate,1998-01-01" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_shape_broadcasts_all_dims(spark, sf_dir):
    plan = _formatted_plan(QUERIES["regional_supplier_volume"].fn(spark, sf_dir))
    # region filter pushed, all dimension paths broadcast (no SMJ cascade)
    assert "EqualTo(r_name,ASIA)" in plan
    assert "GreaterThanOrEqual(o_orderdate,1996-01-01" in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q19_shape_pushes_cnf_residuals_to_both_scans(spark, sf_dir):
    # the Q19 branch of the merged lineitem_revenue_kpis gate entry —
    # the standalone builder stays importable exactly so this test can
    # pin the branch's pushdown without the other branches' scans
    from data_pipelines_cu_spark.queries import disjunctive_predicate_revenue

    plan = _formatted_plan(disjunctive_predicate_revenue(spark, sf_dir))
    # Catalyst's CNF conversion must derive single-side residuals of the
    # OR-of-ANDs and push them below the join into BOTH parquet scans
    assert "LessThanOrEqual(l_quantity,11.0)" in plan  # lineitem-side residual
    assert "EqualTo(p_brand,Brand#1)" in plan  # part-side residual
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all("l_shipdate" not in rs for rs in read_schemas)  # pruned


def test_q13_shape_keeps_outer_join_filter_on_right_scan(spark, sf_dir):
    plan = _formatted_plan(
        QUERIES["customer_order_distribution"].fn(spark, sf_dir)
    )
    # the priority filter belongs to the join condition, NOT the customer
    # side: it must reach the orders scan while the join stays LeftOuter
    assert "Not(EqualTo(o_orderpriority,5-LOW))" in plan
    assert "LeftOuter" in plan


def test_q22_shape_anti_join_and_scalar_broadcast(spark, sf_dir):
    plan = _formatted_plan(QUERIES["idle_customer_balances"].fn(spark, sf_dir))
    assert "LeftAnti" in plan  # "no recent order" never an inner join
    assert "GreaterThanOrEqual(o_orderdate,2001-01-01" in plan
    # the scalar threshold arrives via broadcast, not a driver collect
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_decontamination_broadcasts_benchmark_grams(spark, sf_dir):
    plan = _formatted_plan(QUERIES["doc_decontamination"].fn(spark, sf_dir))
    # benchmark gram digests broadcast; corpus grams never sort-merge-shuffle
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # source predicate pushed to both parquet scans
    assert plan.count("src0") >= 2


def test_token_chunks_is_shuffle_free(spark, sf_dir):
    plan = _formatted_plan(QUERIES["doc_token_chunks"].fn(spark, sf_dir))
    assert "Exchange" not in plan  # pure scan → explode → project
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "lang" not in read_schema and "source" not in read_schema


def test_incremental_dedup_shuffles_digests_only(spark, sf_dir):
    plan = _formatted_plan(QUERIES["incremental_dedup_new_docs"].fn(spark, sf_dir))
    # the anti join must stay an anti join (never materialize the index side)
    assert "LeftAnti" in plan
    # text column pruned away before any exchange: the only columns moving
    # are doc_id + the md5 digest ("formatted" mode puts partitioning on
    # Arguments lines)
    exchanges = [l for l in plan.splitlines() if "hashpartitioning(" in l]
    assert exchanges and all("text" not in l for l in exchanges)
    assert all("content_hash" in l for l in exchanges)


def test_quota_sample_single_shuffle_on_group(spark, sf_dir):
    plan = _formatted_plan(QUERIES["lang_quota_sample"].fn(spark, sf_dir))
    parts = [l for l in plan.splitlines() if "hashpartitioning(" in l]
    assert len(parts) == 1 and "lang" in parts[0]  # one shuffle, on the group


def test_q21_shape_aggregates_without_expand(spark, sf_dir):
    plan = _formatted_plan(QUERIES["sole_late_supplier_orders"].fn(spark, sf_dir))
    # two-level (order, supplier) → order rollup must never fall back to the
    # distinct-aggregate Expand rewrite (3x row amplification)
    assert "Expand" not in plan


def test_simhash_band_join_never_cartesian(spark, sf_dir):
    plan = _formatted_plan(QUERIES["simhash_near_dup_pairs"].fn(spark, sf_dir))
    # candidate generation is the 16-bit band bucket join — any fallback to
    # an all-pairs nested-loop would be quadratic at corpus scale
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_join_is_cluster_keyed(spark, sf_dir):
    plan = _formatted_plan(QUERIES["semantic_dedup_pairs"].fn(spark, sf_dir))
    # SemDeDup's whole point: the pair search is keyed by cluster, never a
    # corpus×corpus nested loop (broadcasts of the 8-row centroid set are
    # fine and expected)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the one shuffle join is keyed on the cluster id ("formatted" mode puts
    # equi-join keys on "Left keys" lines)
    key_lines = [l for l in plan.splitlines() if "Left keys" in l]
    assert key_lines and any("cluster" in l for l in key_lines)


def test_gopher_gate_prunes_to_id_and_text(spark, sf_dir):
    plan = _formatted_plan(QUERIES["gopher_quality_gate"].fn(spark, sf_dir))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "lang" not in read_schema and "source" not in read_schema
    assert "n_chars" not in read_schema


def test_source_dup_stats_shuffles_digests_only(spark, sf_dir):
    plan = _formatted_plan(QUERIES["source_dup_stats"].fn(spark, sf_dir))
    # the corpus-wide count join moves (source, digest) pairs — the text
    # column must be pruned before every exchange
    exchanges = [l for l in plan.splitlines() if "hashpartitioning(" in l]
    assert exchanges and all("text" not in l for l in exchanges)


def test_jaccard_pairs_use_inverted_index_join(spark, sf_dir):
    plan = _formatted_plan(QUERIES["ngram_jaccard_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # candidate generation must be the (block, gram) inverted-index join —
    # a pairwise array_intersect over block self-pairs is quadratic
    key_lines = [l for l in plan.splitlines() if "Left keys" in l]
    assert any("gram" in l for l in key_lines)
    assert "array_intersect" not in plan


def test_containment_pairs_use_inverted_index_join(spark, sf_dir):
    plan = _formatted_plan(QUERIES["ngram_containment_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    key_lines = [l for l in plan.splitlines() if "Left keys" in l]
    assert any("gram" in l for l in key_lines)
    assert "array_intersect" not in plan


def test_minhash_error_band_join_never_cartesian(spark, sf_dir):
    """The estimate-vs-exact error profile joins candidates on (band,
    bhash) and signatures/grams on ids — never an all-pairs product."""
    plan = _formatted_plan(QUERIES["minhash_jaccard_error"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_length_histogram_prunes_to_lang_and_text(spark, sf_dir):
    plan = _formatted_plan(QUERIES["doc_length_histogram"].fn(spark, sf_dir))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "lang" in read_schema and "text" in read_schema
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_repeated_ngram_reuses_doc_partitioning(spark, sf_dir):
    """gram_rows shuffles on doc_id for the position window; the per-doc
    aggregate must REUSE that partitioning (no second corpus shuffle).
    count_distinct adds one expand-level exchange on (doc_id, gram) at
    most — anything beyond that is a plan regression."""
    plan = _formatted_plan(
        QUERIES["doc_repeated_ngram_fraction"].fn(spark, sf_dir)
    )
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan


def test_sketch_queries_broadcast_never_cartesian(spark, sf_dir):
    """CM probes join the broadcast 4096-row counter table; the Bloom path
    joins the broadcast bitmap; KMV broadcasts its one-row-per-group sketch
    next to the exact count — all hash joins, no sort-merge on the corpus
    side, no cartesian anywhere."""
    for name in ["cm_gram_count_error", "bloom_decontamination_stats",
                 "kmv_daily_users"]:
        plan = _formatted_plan(QUERIES[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_kmv_sketch_is_partial_topk_not_global_sort(spark, sf_dir):
    """The KMV sketch must never run a per-group sort window over the full
    distinct-hash set: the plan has NO Window node and NO Sort on the hash
    column — the k-smallest selection is a partition-local Arrow pass plus
    a capped-array hash aggregate (partial merge of ≤ k-long arrays)."""
    from data_pipelines_cu_spark.operators import sketches as sk

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _formatted_plan(
        sk.kmv_sketch(
            ev.selectExpr("event_type", "user_id"), ["event_type"], "user_id"
        )
    )
    assert "Window" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan or "PythonMapInArrow" in plan
    # hash-aggregate merge of the capped arrays, not a sort-based topk
    assert "HashAggregate" in plan


def test_sq8_bounds_broadcast_and_no_extra_shuffle(spark, sf_dir):
    """SQ8 quantization must be a row-local map: the 1-row bounds aggregate
    broadcasts onto the scan, the query set broadcasts for scoring, and the
    only Exchange left is the final per-query top-k rank."""
    plan = _formatted_plan(QUERIES["ann_sq8_topk"].fn(spark, sf_dir))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_importance_weights_broadcast_onto_token_stream(spark, sf_dir):
    """The 256-bucket weight table must broadcast back onto the token
    stream — a sort-merge join here means the whole tokenized corpus
    shuffles by bucket."""
    plan = _formatted_plan(QUERIES["importance_weighted_docs"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_systematic_sample_blocks_the_prefix_sum(spark, sf_dir):
    """The only unpartitioned window may run over per-block totals, never
    the corpus: the plan must contain a partitioned (block-keyed) window
    for the per-row cumsum."""
    plan = _formatted_plan(QUERIES["systematic_weighted_draws"].fn(spark, sf_dir))
    # per-row cumsum window is partitioned by the block key
    assert "_blk" in plan
    assert "CartesianProduct" not in plan


def test_oov_vocab_broadcasts_back(spark, sf_dir):
    """The top-V vocabulary must broadcast onto the token stream (left
    join) — the token stream itself never shuffles by token."""
    plan = _formatted_plan(QUERIES["doc_oov_rate"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_passage_dup_shuffles_digests_only(spark, sf_dir):
    """Passage dedup join runs on 32-byte md5 keys; the raw text column
    must not survive past the scan projection into the join."""
    plan = _formatted_plan(QUERIES["passage_dup_fraction"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the hash-count join happens on the digest column, not text
    joins = [l for l in plan.splitlines() if "HashJoin" in l or "SortMergeJoin" in l]
    assert all("text" not in l for l in joins)


def test_hist_sketch_shuffles_bins_not_values(spark, sf_dir):
    """The sketch side must aggregate (group, bin) counts — the join with
    the exact side broadcasts tiny per-group rows, never a cartesian."""
    plan = _formatted_plan(QUERIES["hist_quantile_sketch"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_ewma_is_single_group_aggregate(spark, sf_dir):
    """EWMA must be one groupBy aggregate: no window, no Python, one
    exchange on the key."""
    plan = _formatted_plan(QUERIES["user_value_ewma"].fn(spark, sf_dir))
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pq_codebooks_broadcast_never_cartesian(spark, sf_dir):
    """Every codebook appearance (train assign, code assign, reconstruct)
    must be a broadcast join; the scoring stage is the broadcast-queries
    cross join, never a corpus-by-corpus cartesian."""
    plan = _formatted_plan(QUERIES["ann_pq_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cdc_window_is_doc_partitioned(spark, sf_dir):
    """The boundary cumsum must be a doc-partitioned window (never a
    global one) and the dup join digest-only."""
    plan = _formatted_plan(QUERIES["cdc_chunk_dup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    joins = [l for l in plan.splitlines() if "HashJoin" in l or "SortMergeJoin" in l]
    assert all("text" not in l for l in joins)


def test_source_overlap_totals_broadcast(spark, sf_dir):
    """Per-source totals must broadcast onto the tiny pair table; the
    digest self-join is an equi-join, never cartesian."""
    plan = _formatted_plan(QUERIES["source_overlap_matrix"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_bigram_probs_broadcast_onto_doc_stream(spark, sf_dir):
    """The bigram probability table must broadcast back onto the per-doc
    bigram stream — never shuffle the doc stream by bigram key twice."""
    plan = _formatted_plan(QUERIES["doc_bigram_likelihood"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_probe_join_broadcasts_and_never_cartesian(spark, sf_dir):
    """Probes and codebooks broadcast; the probe->cell join is an
    equi-join (pruning), never cartesian; no Python in the scoring path
    (the Arrow assigns run upstream of the checkpointed frames)."""
    plan = _formatted_plan(QUERIES["ann_ivfpq_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_hard_negative_mining_single_scan_no_window(spark, sf_dir):
    """Triplet mining: anchors broadcast, corpus scanned ONCE, both
    branches resolved by one struct-max aggregate — no window, no second
    corpus scan (the window formulation read the corpus twice)."""
    plan = _formatted_plan(QUERIES["hard_negative_mining"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") <= 4  # anchors + corpus (tree+detail)
    assert "Window" not in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_sliding_chunks_shuffle_free(spark, sf_dir):
    """Overlapping chunking is a row-local explode: zero exchanges."""
    plan = _formatted_plan(QUERIES["sliding_window_chunks"].fn(spark, sf_dir))
    assert "Exchange" not in plan


def test_zorder_key_is_pure_codegen(spark, sf_dir):
    """The Morton key is shift/mask column algebra: no shuffle, no
    Python, and the scan reads only the three involved columns."""
    plan = _formatted_plan(QUERIES["event_zorder_keys"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read_schema and "event_type" not in read_schema


def test_ngram_novelty_shuffles_digests_only(spark, sf_dir):
    """Novelty attribution: grams cross exchanges as md5 digests; the
    raw text never shuffles."""
    plan = _formatted_plan(QUERIES["doc_ngram_novelty"].fn(spark, sf_dir))
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line
    assert "CartesianProduct" not in plan


def test_nb_candidate_fanout_rides_bucket_counts(spark, sf_dir):
    """The NB ×n_langs expansion happens AFTER the token stream compresses
    to (doc, feature, multiplicity): the pre-fan-out aggregate must exist
    and the likelihood table must broadcast."""
    plan = _formatted_plan(QUERIES["nb_lang_predict"].fn(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_daily_anomalies_baseline_broadcasts(spark, sf_dir):
    """The 7-row weekday baseline joins back by broadcast, never a
    shuffle of the daily table against itself."""
    plan = _formatted_plan(QUERIES["daily_count_anomalies"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_passjoin_has_no_cartesian_stage(spark, sf_dir):
    """The fuzzy self-join must candidate-generate through the segment
    EQUI-join: any cartesian/nested-loop join means the PassJoin index
    degraded to the O(block^2) plan it replaces."""
    plan = _formatted_plan(QUERIES["fuzzy_part_name_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_join_is_equi_only(spark, sf_dir):
    """Triangle enumeration joins the oriented edge list on item-id keys;
    no stage may fall back to a nested-loop join."""
    plan = _formatted_plan(QUERIES["copurchase_triangles"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_psi_reads_only_involved_columns(spark, sf_dir):
    """PSI touches ts/value/event_id only — props and event_type never
    appear anywhere in the plan (the corpus is materialized once as a
    3-narrow-column checkpoint, so a ReadSchema line may be absent)."""
    plan = _formatted_plan(QUERIES["event_value_psi_drift"].fn(spark, sf_dir))
    assert "props" not in plan and "event_type" not in plan


def test_priority_sample_uses_take_ordered(spark, sf_dir):
    """The top-k must be the distributed TakeOrdered, never a global
    sort of the corpus."""
    plan = _formatted_plan(QUERIES["doc_priority_sample"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_interval_join_has_no_nested_loop(spark, sf_dir):
    """The range join must run as the bucketed equi-join, never the
    nested-loop cross product Catalyst would pick for a raw BETWEEN.
    The lazy lane gate attaches a 1-ROW broadcast flag to the point
    side (r9: replaced the eager build-time probe), which legitimately
    plans as one BroadcastNestedLoopJoin — allow exactly that one, and
    require the candidate join itself to hash-partition on the
    (lane, bucket) equi-keys."""
    import re

    plan = _formatted_plan(
        QUERIES["event_session_concurrency"].fn(spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    # formatted plans print each node twice (tree + detail) — count
    # detail headers, i.e. distinct physical nodes
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1
    assert re.search(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan
    )
    assert "_bk" in plan  # the bucket equi-key carries the range join


def test_blocked_rank_replaces_global_rank_windows(spark, sf_dir):
    """The round-7 rewrites: corpus-sized exact ranking goes through the
    two-level blocked rank — the block id column must appear in the plan
    and the ranking window must be partitioned by it (no unpartitioned
    corpus-sized row_number survives)."""
    for name in (
        "customer_revenue_gini",
        "quality_calibrated_scores",
        "event_value_psi_drift",
    ):
        plan = _formatted_plan(QUERIES[name].fn(spark, sf_dir))
        assert "_brn_blk" in plan, name


def test_rfm_uses_blocked_ntile_not_ntile_window(spark, sf_dir):
    """Three exact quartile assignments with zero NTILE window functions
    (each would be a single-task sort of the customer base)."""
    plan = _formatted_plan(QUERIES["customer_rfm_segments"].fn(spark, sf_dir))
    assert "_bnt_rn" in plan
    assert "ntile(" not in plan


def test_dsir_top_n_is_take_ordered(spark, sf_dir):
    """DSIR selection: per-partition top-n + bounded merge, never a
    corpus-sized global rank window."""
    plan = _formatted_plan(
        QUERIES["importance_weighted_docs"].fn(spark, sf_dir)
    )
    assert "TakeOrderedAndProject" in plan


def test_top_n_selections_take_ordered(spark, sf_dir):
    """Vocabulary top-k, co-occurrence lift top-n, and triangle top-n all
    compile to TakeOrderedAndProject."""
    for name in ("doc_oov_rate", "parts_co_ordered", "copurchase_triangles"):
        plan = _formatted_plan(QUERIES[name].fn(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, name


def test_pca_loop_has_no_corpus_joins_or_id_shuffles(spark, sf_dir):
    """The array-fold PCA: no join of the corpus against per-id scores
    (the rejected long-table shape) — no sort-merge or shuffled-hash join
    anywhere, no hash exchange on the vector id."""
    plan = _formatted_plan(
        QUERIES["embedding_pca_component"].fn(spark, sf_dir)
    )
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "hashpartitioning(_id" not in plan


def test_chained_blocked_ranks_do_not_duplicate_upstream(spark, sf_dir):
    """Regression guard on the blocked-rank checkpoint cut:
    spark_partition_id() disables ReusedExchange, so without the
    localCheckpoint inside blocked_row_number, three chained NTILEs
    compiled the orders scan into 128 copies. The plan may scan orders
    at most twice (base aggregate + max-date broadcast)."""
    plan = _formatted_plan(QUERIES["customer_rfm_segments"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2


def test_take_ordered_guard_boundary(spark):
    """The round-8 guard (VERDICT r7 'Next round' #1): take_ordered must
    compile to TakeOrderedAndProject strictly below
    spark.sql.execution.topKSortFallbackThreshold, and at/above it must
    route through the blocked rank — NO global Sort anywhere in the plan
    (Catalyst's silent Sort+GlobalLimit fallback is exactly the
    single-task sort the helper exists to forbid). Threshold lowered to
    10 so the boundary is cheap to cross; both branches must select the
    identical row set."""
    from pyspark.sql import functions as F

    from data_pipelines_cu_spark.operators.windows import take_ordered

    df = spark.range(500).withColumn(
        "v", (F.col("id") * 37 % 101).cast("long")
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    key = "spark.sql.execution.topKSortFallbackThreshold"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "10")
        below = take_ordered(df, order, 9, rank_col="rk")
        plan_b = below._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan_b
        above = take_ordered(df, order, 10, rank_col="rk")
        plan_a = above._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" not in plan_a
        assert "_brn_blk" in plan_a  # the blocked-rank path
        # no GLOBAL sort on the blocked path: every Sort node must be
        # per-partition (global flag 'false'); a ', true, 0' sort is the
        # forbidden fallback
        global_sorts = [
            ln
            for ln in plan_a.splitlines()
            if "Sort [" in ln and "], true, 0" in ln
        ]
        assert not global_sorts, global_sorts
        # identical selection + identical ranks across the boundary
        expected = sorted(
            ((r.v, r.id) for r in df.collect()),
            key=lambda t: (-t[0], t[1]),
        )
        got_b = [
            (r.v, r.id, r.rk)
            for r in sorted(below.collect(), key=lambda r: r.rk)
        ]
        got_a = [
            (r.v, r.id, r.rk)
            for r in sorted(above.collect(), key=lambda r: r.rk)
        ]
        assert got_b == [
            (v, i, k + 1) for k, (v, i) in enumerate(expected[:9])
        ]
        assert got_a == [
            (v, i, k + 1) for k, (v, i) in enumerate(expected[:10])
        ]
    finally:
        spark.conf.set(key, old)
    # the OTHER cliff: with the conf at its real default (Int.MaxValue-15
    # on this build — the planner never falls back on its own), an n
    # whose n x defaultParallelism exceeds the merge-rows budget must
    # still route through the blocked rank, because
    # TakeOrderedAndProject's partitions x n single-point merge is the
    # engine's problem to bound, not the planner's
    assert int(spark.conf.get(key)) > 2_000_000_000
    par = max(1, spark.sparkContext.defaultParallelism)
    big_n = 134_217_728 // par + 1
    capped = take_ordered(df, order, big_n)
    plan_c = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan_c
    assert "_brn_blk" in plan_c
    assert capped.count() == 500  # n > rows: every row selected
    # fast-path twin must keep n below the child's KNOWN maxRows (500):
    # EliminateLimits drops a limit that provably exceeds the row count,
    # leaving a plain global sort of the (≤ n-row) input
    fast = take_ordered(df, order, 400)
    assert "TakeOrderedAndProject" in (
        fast._jdf.queryExecution().executedPlan().toString()
    )


def test_bpe_pack_composite_plan_shape(spark, sf_dir):
    """The tokenize→pack composite must stay: ONE corpus scan (the BPE
    word table is a localCheckpoint, not a re-scan), a broadcast-only
    encode join (vocabulary side), exactly one Arrow fold (the shard
    packer), and no manifest join-back. Formatted explain prints every
    node twice (tree + details), so counts are per-node doubles."""
    plan = _formatted_plan(QUERIES["bpe_pack_pipeline"].fn(spark, sf_dir))
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("Scan parquet") == 2  # one documents scan
    assert plan.count("BroadcastHashJoin") == 2  # one broadcast encode join
    assert plan.count("FlatMapGroupsInPandas") == 2  # one shard fold


def test_revenue_kpi_union_keeps_branch_plans(spark, sf_dir):
    """The merged KPI suite evaluates four independent scalar branches:
    all joins stay broadcast (4 = q14 + q17's two + q19), eight parquet
    scans total (the union shares nothing — each branch's pushdown is
    exactly its standalone plan), zero sort-merge joins."""
    plan = _formatted_plan(QUERIES["lineitem_revenue_kpis"].fn(spark, sf_dir))
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") == 8  # 4 joins x 2 mentions
    assert plan.count("Scan parquet") == 16  # 8 scans x 2 mentions
    # every branch's distinctive pushed filter is present
    assert "EqualTo(p_brand,Brand#3)" in plan  # q17
    assert "GreaterThanOrEqual(l_shipdate,1997-09-01" in plan  # q14
    assert "LessThan(l_quantity,24.0)" in plan  # q6
