"""Physical-plan assertions (SURVEY.md §4): the plan, not just the answer.

These tests pin the scale-critical plan properties: a rewrite that silently
turns a broadcast join into a shuffle join, or blocks predicate pushdown,
breaks here even though results stay correct.
"""

from __future__ import annotations

from bootic_stats_aggregates_spark.plans import formatted_plan
from bootic_stats_aggregates_spark.registry import all_queries

from conftest import SF_DIR

QUERIES = all_queries()


def fresh(spark, qid):
    """Build an UNEXECUTED DataFrame for qid, bypassing the registry's
    per-session plan memo. Once a memoized DataFrame has been collected
    (e.g. by test_oracle running first), its formatted explain shows AQE's
    '== Final Plan ==' AND '== Initial Plan ==' trees — double-counting
    nodes and defeating count-based / negative assertions."""
    return QUERIES[qid].__wrapped__(spark, SF_DIR)


def test_scan_prunes_columns(spark):
    """src_parquet_scan projects 2 of 11 lineitem columns: the parquet
    ReadSchema must not contain un-referenced columns."""
    plan = formatted_plan(fresh(spark, "src_parquet_scan"))
    assert "l_orderkey" in plan
    assert "l_extendedprice" not in plan, "column pruning failed"
    assert "l_comment" not in plan


def test_filter_pushed_to_scan(spark):
    """The event-type dispatch filter must reach the parquet reader."""
    plan = formatted_plan(fresh(spark, "filt_event_type"))
    assert "PushedFilters" in plan
    assert "purchase" in plan.split("PushedFilters")[1].split("\n")[0], (
        "event_type = 'purchase' not pushed to the scan"
    )


def test_dim_join_broadcasts(spark):
    """lineitem x part must be a broadcast hash join, not a shuffle join."""
    plan = formatted_plan(fresh(spark, "join_broadcast"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multiway_broadcasts_dims(spark):
    """The 5-way star join should broadcast nation+region."""
    plan = formatted_plan(fresh(spark, "join_multiway"))
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_per_group_prepruned(spark):
    """Spark >= 3.5 inserts WindowGroupLimit below the shuffle for
    row_number() <= k — each map task keeps k rows per group instead of
    sorting whole groups (SURVEY.md §4.2)."""
    plan = formatted_plan(fresh(spark, "rank_topk_per_group"))
    assert "WindowGroupLimit" in plan


def test_global_topk_avoids_full_sort(spark):
    """orderBy().limit() must plan TakeOrderedAndProject (no global sort)."""
    plan = formatted_plan(fresh(spark, "rank_topk_global"))
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark):
    """The q1-style aggregation must map-side combine: partial + final
    HashAggregate around exactly one exchange, with the date filter pushed
    into the scan."""
    plan = formatted_plan(fresh(spark, "agg_sum_avg_minmax"))
    assert plan.count("HashAggregate") >= 2, "no partial aggregation"
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed"


def test_partition_pruning(spark):
    """The date predicate on the partitioned events layout must become a
    PartitionFilter (directory pruning), not a data filter — at 100 TB this
    is the difference between listing 3 day-directories and 3650."""
    plan = formatted_plan(fresh(spark, "src_partition_pruned"))
    assert "PartitionFilters" in plan
    idx = plan.index("PartitionFilters")
    assert "event_date" in plan[idx : idx + 300], "date filter not on partition col"


def test_bucketed_join_has_no_shuffle(spark):
    """Both join sides pre-bucketed by the key: the sort-merge join must run
    bucket-to-bucket with zero Exchange operators in the plan."""
    plan = formatted_plan(fresh(spark, "join_bucketed_colocated"))
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, "bucketed join still shuffles"
    assert "SelectedBucketsCount" in plan


def test_salted_join_shuffles_on_salt(spark):
    """The salted join must hash-partition on (key, salt) — the hot key's
    rows spread over `salt_n` reducers instead of one."""
    plan = formatted_plan(fresh(spark, "join_skew_salted"))
    assert "SortMergeJoin" in plan
    keys_line = plan.split("Left keys")[1].split("\n")[0]
    assert "salt" in keys_line, "salt not part of the join keys"


def test_rollup_is_single_scan(spark):
    """agg_multi_rollup fans out granularities via Expand — exactly one
    parquet scan of events, not one per granularity."""
    plan = formatted_plan(fresh(spark, "agg_multi_rollup"))
    # one scan == one file index location in the formatted detail section
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Expand" in plan


def test_ann_lsh_no_cartesian(spark):
    """The ANN path must join on (table, bucket) — never a cross/nested-loop
    product of queries x corpus."""
    plan = formatted_plan(fresh(spark, "llm_ann_lsh"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embed_neardup_lsh_no_cartesian(spark):
    """The corpus x corpus near-dup production twin must candidate via the
    (table, bucket) equi-join — never an all-pairs product."""
    plan = formatted_plan(fresh(spark, "llm_embed_neardup_lsh"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_equi_bucketed(spark):
    """The large x large interval join must collapse to a bucket EQUI-join —
    never a nested-loop/cartesian product of the two sides."""
    plan = formatted_plan(fresh(spark, "join_range_bucketed"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shuffle_hash_join_strategy(spark):
    """The shuffle_hash hint must produce a ShuffledHashJoin (not SMJ, not
    broadcast) — the strategy that skips both sorts when one side is small
    per partition but too big to broadcast."""
    plan = formatted_plan(fresh(spark, "join_shuffle_hash"))
    assert "ShuffledHashJoin" in plan


def test_contamination_broadcasts_benchmark(spark):
    """Decontamination must broadcast the benchmark grams and never shuffle
    the corpus n-gram stream: the corpus branch under the join is
    scan -> explode -> join with NO Exchange (the only shuffles are the
    tiny benchmark dedup and the per-doc count aggregates above the join)."""
    plan = formatted_plan(fresh(spark, "llm_contamination"))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in plan
    join_at = tree.index("BroadcastHashJoin")
    bcast_at = tree.index("BroadcastExchange", join_at)
    # lines between the join and its broadcast side == the corpus branch
    corpus_branch = tree[join_at:bcast_at]
    assert "Generate" in corpus_branch and "Scan parquet" in corpus_branch
    assert "Exchange" not in corpus_branch


def test_plan_hygiene_all_queries(spark):
    """Fleet-wide plan audit: no accidental cartesian products and no
    row-at-a-time Python eval anywhere except the explicitly exempted
    demonstrations. Catches a regression anywhere in the registry the
    moment it plans, not when it times out at scale."""
    cartesian_ok = {
        "join_cross",        # cartesian by definition (tiny x tiny)
        "join_theta_range",  # non-equi join: BNLJ with broadcast side IS the plan
        # llm_ngram_jaccard / llm_ngram_containment: r13 — now exact
        # posting-list equi-joins, REQUIRED to plan without a cartesian
        "fn_levenshtein",    # bounded dim x dim broadcast (25 x 5 names)
        "win_decile_report", # crossJoin(broadcast(<1-row grand total>))
        "llm_embed_neardup", # exhaustive pair scan, small-SF oracle twin
        "llm_cosine_topk",   # broadcast query-set x corpus (bounded side)
        "llm_knn_classify",  # built on llm_cosine_topk
        "llm_ann_recall",    # embeds llm_cosine_topk as ground truth
        "llm_ivf_recall_curve",  # same: brute-force ground-truth side
        "llm_tfidf_topterms",# crossJoin(broadcast(<1-row global count>))
        "llm_unigram_logprob",   # crossJoin(broadcast(<1-row corpus total>))
        "llm_cooccurrence_pmi",  # crossJoin(broadcast(<1-row doc count>))
        "llm_corpus_manifest",   # crossJoin(broadcast(<1-row corpus total>))
        "agg_calendar_fill", # date-spine x types grid: both sides broadcast-
                             # sized at any corpus scale (days x types)
        "llm_ivf_train",     # corpus x broadcast(K=8 centroids) per Lloyd's
                             # iteration: the K side is constant-size at any
                             # corpus scale
        "llm_ann_ivfpq",     # same trained-quantizer machinery: corpus x
                             # broadcast(16 centroids) for assignment/probes
        "llm_ann_index_maintain",  # same machinery reading FROZEN codebook
        "stream_ann_index_maintain",  # tables (broadcast-sized)
        "llm_bm25_search",   # crossJoin(broadcast(<1-row corpus stats>))
    }
    python_ok = {
        "udf_plain",  # the fenced-off last-resort surface
        "udf_table",  # Python UDTF: BatchEvalPythonUDTF is its execution node
    }
    streaming = {q for q in QUERIES if q.startswith(("stream_", "src_event"))}
    failures = []
    for qid, fn in sorted(QUERIES.items()):
        if qid in streaming:
            continue  # streaming plans can't be explained pre-execution here
        plan = formatted_plan(fn(spark, SF_DIR))
        if qid not in cartesian_ok and (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ):
            failures.append(f"{qid}: unexpected cartesian/nested-loop join")
        if qid not in python_ok and "BatchEvalPython" in plan:
            failures.append(f"{qid}: row-at-a-time Python UDF in plan")
    assert not failures, "\n".join(failures)


def test_dynamic_partition_pruning(spark):
    """The Monday-dim join must inject a runtime DynamicPruning filter into
    the partitioned fact scan."""
    plan = formatted_plan(fresh(spark, "join_dpp_pruned"))
    assert "dynamicpruning" in plan.lower(), "no DPP subquery in fact scan"


def test_hash_sample_is_map_only(spark):
    """Deterministic sampling must stay a scan+project+filter — a shuffle
    or sort anywhere means it stopped being embarrassingly parallel."""
    plan = formatted_plan(fresh(spark, "sample_hash_det"))
    assert "Exchange" not in plan, "hash sample should not shuffle"
    assert "Sort" not in plan, "hash sample should not sort"


def test_split_hash_is_map_only(spark):
    """Train/val/test assignment is a pure projection — same invariant."""
    plan = formatted_plan(fresh(spark, "llm_split_hash"))
    assert "Exchange" not in plan, "hash split should not shuffle"


def test_stratified_cap_prepruned(spark):
    """The per-stratum cap must use WindowGroupLimit so each map task keeps
    at most CAP rows per stratum before the exchange."""
    plan = formatted_plan(fresh(spark, "sample_stratified_cap"))
    assert "WindowGroupLimit" in plan


def test_bm25_topk_prepruned(spark):
    """VERDICT r8 minor: llm_bm25_search's global top-k must never sort
    the whole scored corpus. WindowGroupLimit is UNREACHABLE here —
    InferWindowGroupLimit requires a non-empty window partition spec
    (verified on 4.1) — so the op uses orderBy().limit() and the plan
    must show TakeOrderedAndProject (per-task local top-k, driver
    merge); the rank window then runs over <= 20 rows."""
    plan = formatted_plan(fresh(spark, "llm_bm25_search"))
    assert "TakeOrderedAndProject" in plan


def test_pack_sequences_reuses_partitioning(spark):
    """Packing is one window + one aggregation on the same lang key: the
    plan must contain exactly one exchange (the agg reuses the window's
    hash partitioning instead of reshuffling)."""
    plan = formatted_plan(fresh(spark, "llm_pack_sequences"))
    n_exchanges = plan.count("Exchange (")  # tree nodes, not detail headers
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}:\n{plan}"


def test_bloom_filter_join_pruning(spark):
    """join_bloom_pruned's armed plan pushes a bloom-filter membership
    probe (might_contain over the selective orders side's join keys) into
    the lineitem scan — row-level runtime filtering ahead of the shuffle."""
    from bootic_stats_aggregates_spark.operators.joins import bloom_pruned_plan

    joined, restore = bloom_pruned_plan(spark, SF_DIR)
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter did not arm"
    finally:
        restore()


def test_repetition_is_map_only(spark):
    """llm_repetition claims a shuffle-free scan->project->filter plan."""
    plan = formatted_plan(fresh(spark, "llm_repetition"))
    assert "Exchange" not in plan, "repetition signal should not shuffle"


def test_corpus_shuffle_rank_is_distributed(spark):
    """llm_corpus_shuffle's big side must rank inside hash-range buckets
    (hashpartitioning on hb), never via a single global-order window over
    the whole corpus; the only SinglePartition stage allowed is the tiny
    bucket-offset prefix sum."""
    plan = formatted_plan(fresh(spark, "llm_corpus_shuffle"))
    assert "hashpartitioning(hb" in plan, "per-bucket rank window missing"


def test_large_in_list_becomes_inset(spark):
    """filt_in_large_list's 500-element IN must compile to an InSet hash
    probe (OptimizeIn), not 500 chained OR equalities."""
    plan = formatted_plan(fresh(spark, "filt_in_large_list"))
    assert "INSET" in plan.upper(), "OptimizeIn did not fire"


#: Queries whose *build* legitimately runs Spark jobs: executing is the
#: point of the op (sinks, streaming micro-batches), the algorithm is
#: iterative (driver-side convergence loop), or the op stages a physical
#: layout first (bucketed/partitioned/evolved fixture writes). Everything
#: else must be a pure lazy plan — VERDICT r3 item 8's permanent guard
#: against the llm_unigram_logprob class (driver-side .collect() of a
#: scalar that belongs in a broadcast crossJoin).
BUILD_RUNS_JOBS_OK = {
    # sinks: the write IS the operator; the returned frame is the read-back
    "snk_parquet", "snk_compact", "snk_jsonl_export", "snk_merge_upsert",
    "snk_observe_audit", "snk_partition_overwrite", "snk_stream_parquet",
    "snk_redis_hash", "snk_redis_zset", "snk_redis_acct", "snk_redis_paths",
    "snk_redis_uniq", "stream_redis_counters", "snk_multi_fanout",
    "src_orc", "snk_csv_export",
    # streaming: building runs the micro-batch(es) to a sink
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "stream_stateful", "stream_stateful_v2", "stream_watermark",
    "stream_output_modes",
    "stream_quality_gate", "stream_incr_dedup", "stream_chained_stateful",
    "stream_backpressure", "src_event_stream", "src_socket_stream",
    "stream_topk_rank", "stream_approx_uniques",
    "join_stream_static", "join_stream_stream",
    # physical-layout staging: writes bucketed/partitioned/evolved fixtures
    "join_bucketed_colocated", "join_dpp_pruned", "src_partition_pruned",
    "src_schema_evolution", "src_binary_files", "src_csv_robust",
    "src_synthetic_events", "src_corrupt_tolerant", "src_recursive_glob",
    # iterative driver-side convergence loops (documented O(log n) rounds)
    "llm_cc_star", "llm_dedup_clusters", "llm_dedup_cascade",
    # eager localCheckpoint under temporarily-armed session confs
    "join_bloom_pruned",
    # streaming foreachBatch through the in-process RESP socket server:
    # building runs the micro-batches into the server and reads back
    "snk_redis_resp",
    # MiniLog ACID ops: building stages the commit-log table (appends,
    # a file-pruned merge, txn replays) — the transactions ARE the op;
    # the returned frame is the snapshot read-back through the log
    "tx_time_travel", "tx_merge_filepruned", "tx_idempotent_replay",
    "stream_minilog_sink", "tx_vacuum_boundary", "tx_optimize_compact",
    "tx_schema_evolve", "tx_zorder_pruned", "stream_late_deadletter",
    "tx_change_feed", "tx_optimize_zorder", "tx_cdf_replay",
    "tx_mview_incremental", "src_minilog_dsv2", "stream_minilog_tail",
    "src_minilog_pushdown", "snk_minilog_dsv2_write",
    "stream_minilog_dsv2_sink", "tx_restore", "tx_clone_zero_copy",
    "tx_deletion_vectors", "tx_history_audit",
    # r8: the CDF stream op runs the AvailableNow feed + fold assertions
    # at build; column mapping stages the rename/drop/re-add history;
    # the persisted ANN index stages train/encode/maintain and
    # recomputes its maintained==fresh-rebuild invariants per call
    "stream_cdf_feed", "tx_column_mapping", "llm_ann_index_maintain",
    "stream_ann_index_maintain", "tx_check_constraint", "src_bloom_skip",
    "tx_generated_columns", "stream_mview_cdf",
    # r9: row tracking stages append/merge/optimize history and
    # recomputes its linkage/stability invariants (bounded counts) per
    # call
    "tx_row_tracking",
    # r9: partitioned-table staging + file-list pruning proofs
    # (bounded metadata counts) per call
    "tx_partitioned_table",
    # r9: native partitioned round-trip stages via the DSv2 writer and
    # recomputes reader-level pruning/id proofs (bounded counts)
    "src_minilog_partitioned",
    # r10: the MERGE-clause ops stage the CDC history (duplicate-key
    # fail-fast + file-scope bounds are one-row jobs each); in-commit
    # timestamps stage commits and resolve two binary searches;
    # incremental clustering stages append/optimize epochs; the keyed
    # view folds feeds and recomputes fold==direct (bounded counts);
    # its streaming twin runs the AvailableNow CDF feed; native blooms
    # stage via the DSv2 writer and recompute skipping proofs
    "tx_merge_clauses", "tx_merge_evolve", "tx_time_travel_ts",
    "tx_cluster_incremental", "tx_apply_changes_keyed",
    "stream_apply_changes", "src_bloom_native",
    # r11: the SQL-surface ops stage their tables through SQL DML
    # statements (INSERT/UPDATE/DELETE/MERGE are commits) and register
    # temp views; the returned frame is the read-back/SELECT
    "src_minilog_sql", "tx_sql_update_delete", "tx_sql_merge",
    # r11: the rate-limited drain runs its capped single-batch queries
    # at staging time (the sequential runs ARE the op)
    "stream_minilog_ratelimit",
    # r11: stages DV-delete + OPTIMIZE commits and reads DESCRIBE
    # HISTORY (a bounded metadata collect) into the result
    "tx_sql_delete_dv",
    # r12: stages two subquery-predicate DELETEs and a scalar-subquery
    # UPDATE through run_sql (each a commit); returns the read-back
    "tx_sql_delete_subquery",
    # r12: CTAS/REPLACE and the ALTER battery stage commits through
    # run_sql; both recompute live time-travel/schema invariants
    # (bounded metadata counts) per call
    "tx_sql_ctas", "tx_sql_alter",
    # r13: stages the DV-update + OPTIMIZE commits, re-runs the CDF
    # linkage asserts at build, and reads DESCRIBE HISTORY
    "tx_sql_update_dv",
    # r13: stages tables, then drives DROP/SHOW/DESCRIBE through
    # run_sql (bounded metadata collects)
    "tx_sql_catalog",
    # r13: runs the windowed CDF mview's AvailableNow feed at build
    "stream_mview_windowed",
    # r13 optimization: the Lloyd's-training chain lineage-truncates its
    # K-row centroid frame per round with a LAZY localCheckpoint (the
    # llm_cc_star recipe; kills the 2^ITERS duplicated-subtree plan —
    # 54 Window nodes -> 0 in llm_ivf_train). Under AQE (this session,
    # the external driver) Dataset.localCheckpoint's toRdd materializes
    # the query stages, so the TRAINING jobs run at build; with AQE off
    # (the bench env) the checkpoint stays lazy and trains inside the
    # timed action. Either way each BUILDER invocation computes from
    # the parquet inputs exactly once — nothing is precomputed across
    # builder invocations (repeat actions on ONE built frame do reuse
    # the materialized K-row centroid RDDs; see _ckpt_small and
    # bench.py steady_notes, ADVICE r13).
    "llm_ivf_train", "llm_pq_train", "llm_ann_ivfpq",
}


def test_build_is_lazy_fleet_wide(spark):
    """Building every non-exempt queries() entry must schedule ZERO Spark
    jobs — a DataFrame is a plan, not a computation. A .collect()/.count()
    smuggled into plan construction makes the query eager and double-scans
    at scale (this caught llm_unigram_logprob and llm_cooccurrence_pmi)."""
    from bootic_stats_aggregates_spark.io import load_all

    load_all(spark, SF_DIR)  # pre-warm: parquet schema inference is a job
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    failures = []
    for qid in sorted(QUERIES):
        if qid in BUILD_RUNS_JOBS_OK:
            continue
        group = f"lazy-gate-{qid}"
        sc.setJobGroup(group, f"laziness gate: {qid}")
        try:
            fresh(spark, qid)
        finally:
            sc.setJobGroup("lazy-gate-idle", "idle")
        jobs = tracker.getJobIdsForGroup(group)
        if jobs:
            failures.append(f"{qid}: build scheduled {len(jobs)} job(s)")
    assert not failures, "\n".join(failures)


def test_asof_nearest_single_shuffle(spark):
    """join_asof_nearest claims both direction windows reuse ONE
    hashpartitioning exchange on user_id: two Sort+Window passes, no
    second shuffle, and never a join of the pair space."""
    plan = formatted_plan(fresh(spark, "join_asof_nearest"))
    body = plan.split("===== Subqueries =====")[0]
    n_exchanges = sum(
        1 for ln in body.splitlines() if ln.strip().startswith("(")
        and "Exchange" in ln
    )
    assert n_exchanges == 1, f"expected 1 exchange, plan has {n_exchanges}"
    assert plan.count("Window") >= 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_interval_overlap_single_shuffle_no_cartesian(spark):
    """join_interval_overlap claims the pair space collapses to one
    (user, bucket) equi-join: no cartesian/nested-loop node anywhere, and
    the join itself is hash-partitioned on the composite key (the only
    exchanges are the two join-input shuffles)."""
    plan = formatted_plan(fresh(spark, "join_interval_overlap"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    body = plan.split("===== Subqueries =====")[0]
    n_exchanges = sum(
        1 for ln in body.splitlines() if ln.strip().startswith("(")
        and "Exchange" in ln and "Reused" not in ln
    )
    assert n_exchanges <= 2, f"expected <=2 join-input exchanges, got {n_exchanges}"


def test_zorder_map_only_plus_one_agg_shuffle(spark):
    """layout_zorder's interleave must stay a map-only codegen projection:
    exactly the aggregate's exchange, no sort, no join."""
    plan = formatted_plan(fresh(spark, "layout_zorder"))
    body = plan.split("===== Subqueries =====")[0]
    n_exchanges = sum(
        1 for ln in body.splitlines() if ln.strip().startswith("(")
        and "Exchange" in ln and "Reused" not in ln
    )
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}"
    assert "Join" not in body
    assert "Sort" not in body


def test_multimodal_decode_is_map_only(spark):
    """The decode stages must plan as a single map-only pipeline — scan ->
    MapInPandas -> project, with NO Exchange: at 100 TB the decode fans
    out across executors with zero shuffle, and a stray repartition here
    would serialize the whole corpus through the network for no reason."""
    for qid in ("llm_multimodal_decode", "llm_multimodal_audio", "llm_multimodal_png"):
        plan = formatted_plan(fresh(spark, qid))
        body = plan.split("===== Subqueries =====")[0]
        assert "Exchange" not in body, f"{qid} plans a shuffle:\n{body}"
        assert "MapInPandas" in body or "ArrowEvalPython" in body, body


def test_fuzzy_join_is_blocked_equi_join(spark):
    """llm_fuzzy_join claims candidates come ONLY from the (lang, band)
    block equi-join — never an all-pairs matrix: no cartesian/nested-loop
    node, and the levenshtein verify rides the join as a post-filter."""
    plan = formatted_plan(fresh(spark, "llm_fuzzy_join"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan  # verify stage is a JVM expression


def test_scd2_single_exchange(spark):
    """win_scd2_intervals claims all three windows + the run-collapse
    aggregate share ONE hashpartitioning on user_id: a single exchange in
    the whole build (the aggregate's partial/final split reuses it)."""
    plan = formatted_plan(fresh(spark, "win_scd2_intervals"))
    body = plan.split("===== Subqueries =====")[0]
    n_exchanges = sum(
        1 for ln in body.splitlines() if ln.strip().startswith("(")
        and "Exchange" in ln and "Reused" not in ln
    )
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}"
    assert "CartesianProduct" not in plan


def test_profile_stats_single_scan_no_shuffle_joins(spark):
    """src_profile_stats claims ONE grouping-free aggregate computes all
    per-column measures: no join anywhere (the naive per-column UNION
    would scan 6x), a single scan of the events parquet."""
    plan = formatted_plan(fresh(spark, "src_profile_stats"))
    body = plan.split("===== Subqueries =====")[0]
    assert "Join" not in body
    n_scans = sum(
        1 for ln in body.splitlines() if ln.strip().startswith("(")
        and "Scan parquet" in ln
    )
    assert n_scans == 1, f"expected 1 scan, got {n_scans}"
