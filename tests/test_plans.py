"""Plan-quality gates (SURVEY.md §4): the physical plans the engine
must produce at scale — broadcast star joins, pushed filters, pruned
scans, whole-stage codegen — pinned as assertions so a regression into
shuffle-heavy or scan-everything plans fails CI, not the cluster."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

from .conftest import SF_DIR


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _full(df) -> str:
    return df._jdf.queryExecution().toString()


def test_star_join_broadcasts_all_dims(spark):
    """lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region: every dim side
    must be a broadcast-hash join — zero sort-merge shuffles (J5)."""
    df = entrymod.queries()["star_revenue_by_nation_month"](spark, SF_DIR)
    p = _physical(df)
    assert p.count("BroadcastHashJoin") == 4, p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_star_join_prunes_columns(spark):
    """The fact scan must read only the join/agg columns, never the
    wide comment/address columns (column pruning reached the scan)."""
    df = entrymod.queries()["star_revenue_by_nation_month"](spark, SF_DIR)
    p = _physical(df)
    assert "l_comment" not in p and "o_comment" not in p and "c_address" not in p


def test_filter_pushdown_reaches_scan(spark):
    """P-series predicate must appear in the parquet scan's
    DataFilters/PushedFilters, not only in a Filter node above it."""
    df = entrymod.queries()["pruned_scan_projection"](spark, SF_DIR)
    full = _full(df)
    assert "PushedFilters: [" in full
    scan_lines = [l for l in full.splitlines() if "FileScan parquet" in l]
    assert any("l_shipdate" in l for l in scan_lines), scan_lines


def test_broadcast_enrich_is_single_broadcast_join(spark):
    df = entrymod.queries()["broadcast_left_enrich"](spark, SF_DIR)
    p = _physical(df)
    assert p.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in p


def test_whole_stage_codegen_everywhere(spark):
    """Hot-path queries must run inside whole-stage codegen spans —
    no row-at-a-time Python UDFs in the relational inventory. (With
    AQE the codegen wrapping only exists in the final executed plan,
    so run the query first.)"""
    qs = entrymod.queries()
    for name in (
        "star_revenue_by_nation_month",
        "rolling_stats",
        "lag_returns",
        "text_quality_scores",
    ):
        df = qs[name](spark, SF_DIR)
        df.collect()
        p = _physical(df)
        # codegen'd operators render with a "*(n) " stage marker
        assert re.search(r"\*\(\d+\) ", p), f"{name}:\n{p}"
        assert "BatchEvalPython" not in p, name  # row-at-a-time Python


def test_ann_broadcasts_query_side(spark):
    """Brute-force ANN: corpus scanned once, query set broadcast — the
    only acceptable nested-loop is against the broadcast side."""
    df = entrymod.queries()["ann_brute_force_topk"](spark, SF_DIR)
    p = _physical(df)
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_grouped_model_fits_use_arrow(spark):
    """applyInPandas stages must be Arrow-batched (FlatMapGroupsInPandas),
    never row-pickling PythonUDF eval."""
    df = entrymod.queries()["adf_stationarity"](spark, SF_DIR)
    p = _physical(df)
    assert "FlatMapGroupsInPandas" in p
    assert "BatchEvalPython" not in p


def test_flagship_shuffle_budget(spark):
    """The flagship star query gets exactly one aggregation shuffle +
    one ordering exchange — broadcasts must not reintroduce Exchange
    nodes per join."""
    df = entrymod.queries()["star_revenue_by_nation_month"](spark, SF_DIR)
    p = _physical(df)
    # shuffles only — BroadcastExchange is the cheap dim-side transfer
    n_shuffle = sum(
        p.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )
    assert n_shuffle <= 2, f"too many shuffles ({n_shuffle}):\n{p}"


def test_partition_pruning_on_partitioned_table(spark, tmp_path):
    """§4: the fact table is partitioned by coin_id (reference
    etl.py:75, query.sql:4); an equality predicate on the partition
    column must prune at the directory level (PartitionFilters), not
    scan-and-filter."""
    from pyspark.sql import functions as F

    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    tdir = str(tmp_path / "fact_part")
    ev = load_table(spark, SF_DIR, "events")
    ev.withColumn("coin_id", F.crc32(F.col("event_type")) % 8).write.partitionBy(
        "coin_id"
    ).mode("overwrite").parquet(tdir)
    df = spark.read.parquet(tdir).filter(F.col("coin_id") == 3)
    full = _full(df)
    assert "PartitionFilters: [isnotnull(coin_id" in full or re.search(
        r"PartitionFilters: \[.*coin_id.*3", full
    ), full
    # partition-only predicate => no pushed data filters on the scan
    scan = [l for l in full.splitlines() if "FileScan" in l]
    assert scan and "PushedFilters: []" in scan[-1], scan


def test_rollup_single_shuffle(spark):
    """ROLLUP must expand grouping sets inside ONE aggregation
    pipeline — one shuffle, not one scan+shuffle per level."""
    df = entrymod.queries()["rollup_year_priority"](spark, SF_DIR)
    p = _physical(df)
    n_shuffle = sum(
        p.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )
    assert n_shuffle <= 1, f"rollup should be one shuffle, got {n_shuffle}:\n{p}"
    assert p.count("FileScan") == 1, "rollup must scan orders exactly once"


def test_range_band_join_broadcasts_grid(spark):
    """The non-equi band join must broadcast the 10-row grid, never
    shuffle or cartesian the fact side."""
    df = entrymod.queries()["price_band_range_join"](spark, SF_DIR)
    p = _physical(df)
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_semi_join_pushes_date_filter(spark):
    """Left-semi join: the o_orderdate filter must reach the orders
    parquet scan as a pushed filter."""
    df = entrymod.queries()["semi_join_recent_customers"](spark, SF_DIR)
    full = _full(df)
    scan_lines = [l for l in full.splitlines() if "FileScan parquet" in l]
    assert any("o_orderdate" in l and "PushedFilters" in l for l in scan_lines), (
        scan_lines
    )


def test_vector_stats_no_python_no_explode(spark):
    """Higher-order-function folds must stay JVM-side: no Python eval
    nodes and no Generate (explode) in the per-vector stats plan."""
    df = entrymod.queries()["embedding_vector_stats"](spark, SF_DIR)
    p = _physical(df)
    assert "BatchEvalPython" not in p
    assert "FlatMapGroupsInPandas" not in p
    assert "Generate" not in p, "vector stats must not explode the array"
    n_shuffle = sum(
        p.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )
    assert n_shuffle == 0, f"per-row vector stats must not shuffle:\n{p}"


def _shuffles(p: str) -> int:
    return sum(
        p.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def test_decorrelated_avg_broadcasts_aggregate(spark):
    """'Above my group's average' must run as per-group agg broadcast
    back to the fact side — a broadcast hash join, never a per-row
    subquery or sort-merge shuffle of the big side."""
    df = entrymod.queries()["customers_above_nation_avg"](spark, SF_DIR)
    p = _physical(df)
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p


def test_fuzzy_pairs_block_join_is_equi(spark):
    """Blocked fuzzy matching: the (brand, size) block keys must drive
    an equi join; levenshtein must never force a nested-loop over the
    whole table."""
    df = entrymod.queries()["fuzzy_part_pairs"](spark, SF_DIR)
    p = _physical(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_histogram_bounds_broadcast_two_scans(spark):
    """Equi-width histogram: the 1-row bounds aggregate is broadcast
    back over the scan (nested-loop over one row is fine); the bucket
    groupBy is the only shuffle beyond the scalar bounds agg."""
    df = entrymod.queries()["histogram_fixed_buckets"](spark, SF_DIR)
    p = _physical(df)
    assert "BroadcastNestedLoopJoin" in p, p
    assert "SortMergeJoin" not in p
    assert _shuffles(p) <= 2, f"histogram should be bounds+bucket shuffles only:\n{p}"


def test_intersect_plans_as_semi_join(spark):
    """INTERSECT must compile to distinct + left-semi, not a full
    cartesian or union-groupBy over the concatenated inputs."""
    df = entrymod.queries()["intersect_repeat_customers"](spark, SF_DIR)
    p = _physical(df)
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p


def test_time_range_window_single_shuffle_no_python(spark):
    """RANGE-frame rolling average: one hash shuffle on the partition
    key, everything JVM-side."""
    df = entrymod.queries()["time_range_rolling_avg"](spark, SF_DIR)
    p = _physical(df)
    assert "BatchEvalPython" not in p
    assert _shuffles(p) == 1, f"range window must be one shuffle:\n{p}"


def test_dim_profile_partial_agg_after_explode(spark):
    """Per-dimension embedding profile: the explode happens map-side
    (Generate) and the groupBy has a partial-aggregation stage before
    the single 64-key shuffle."""
    df = entrymod.queries()["vector_dim_profile"](spark, SF_DIR)
    p = _physical(df)
    assert "Generate" in p, p
    assert "BatchEvalPython" not in p
    assert p.count("HashAggregate") >= 2, f"need partial+final agg:\n{p}"
    assert _shuffles(p) == 1, f"dim profile must be one shuffle:\n{p}"


def test_quality_gates_map_only_stats(spark):
    """doc_quality_gates: per-doc token stats come from array HOFs
    (sort + fold), not explode→groupBy — so the plan has no Generate
    node and exactly one Exchange (the final (lang, source) rollup).
    At 100 TB that is the difference between shuffling every token
    twice and shuffling one row per group."""
    df = entrymod.queries()["doc_quality_gates"](spark, SF_DIR)
    p = _physical(df)
    assert "Generate" not in p, p
    assert "BatchEvalPython" not in p
    assert _shuffles(p) == 1, f"gates must be a single rollup shuffle:\n{p}"


def test_pii_scrub_single_exchange(spark):
    """PII scrub + audit: map-only regex pass, one source rollup."""
    df = entrymod.queries()["pii_scrub_stats"](spark, SF_DIR)
    p = _physical(df)
    assert "BatchEvalPython" not in p
    assert _shuffles(p) == 1, f"scrub must be map-only + one rollup:\n{p}"


def test_contamination_membership_probe_broadcasts(spark):
    """Benchmark-contamination: the big (train) side joins the small
    benchmark n-gram set by broadcast — never a sort-merge shuffle of
    the exploded corpus — and per-doc shingle dedup is array_distinct,
    so no DISTINCT Exchange over exploded shingles exists (bench-set
    distinct + per-doc rollup + source rollup are the only shuffles)."""
    df = entrymod.queries()["contamination_ngram_overlap"](spark, SF_DIR)
    p = _physical(df)
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p
    assert _shuffles(p) <= 3, f"distinct over exploded shingles crept back:\n{p}"


def test_split_and_sample_map_only(spark):
    """Hash-split and stratified-sample audits: bucket assignment is
    pure projection; the only Exchange is the audit rollup."""
    for name in ("train_val_test_split", "stratified_sample_rates"):
        p = _physical(entrymod.queries()[name](spark, SF_DIR))
        assert "BatchEvalPython" not in p
        assert _shuffles(p) == 1, f"{name} must be one shuffle:\n{p}"


def test_label_profile_joins_broadcast(spark):
    """label_centroid_profile: the two per-label aggregates (10 rows
    each) must combine via broadcast, and the centroid path keeps the
    partial-agg-after-explode shape."""
    df = entrymod.queries()["label_centroid_profile"](spark, SF_DIR)
    p = _physical(df)
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p
    assert "BatchEvalPython" not in p


def test_twap_drawdown_single_shuffle(spark):
    """twap_daily / max_drawdown_by_type: the groupBy must reuse the
    window's hash partitioning — one Exchange total, no Python."""
    for name in ("twap_daily", "max_drawdown_by_type"):
        p = _physical(entrymod.queries()[name](spark, SF_DIR))
        assert "BatchEvalPython" not in p
        assert _shuffles(p) == 1, f"{name} must reuse window partitioning:\n{p}"


def test_ewma_two_stage_fold(spark):
    """ewma_daily_value: daily grain + series grain, nothing else; the
    smoothing fold is a JVM array aggregate, not Python."""
    p = _physical(entrymod.queries()["ewma_daily_value"](spark, SF_DIR))
    assert "BatchEvalPython" not in p
    assert _shuffles(p) == 2, p


def test_zscore_stats_broadcast_back(spark):
    """zscore_anomaly_days: per-series stats re-join the daily rows by
    broadcast — the daily stream is never sort-merge shuffled."""
    p = _physical(entrymod.queries()["zscore_anomaly_days"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p


def test_lm_surprisal_count_tables_broadcast(spark):
    """bigram_lm_surprisal: both vocabulary-sized count tables join
    the bigram stream by broadcast (scale path: bloom-prune), never a
    sort-merge shuffle of the exploded corpus."""
    p = _physical(entrymod.queries()["bigram_lm_surprisal"](spark, SF_DIR))
    assert p.count("BroadcastHashJoin") == 2, p
    assert "SortMergeJoin" not in p
    assert _shuffles(p) <= 3, p


def test_entropy_and_uniqueness_map_only(spark):
    """char_class_entropy / fourgram_uniqueness: per-doc stats stay
    map-side (regex length-diffs / array_distinct — no Generate), the
    only Exchange is the group rollup."""
    for name in ("char_class_entropy", "fourgram_uniqueness"):
        p = _physical(entrymod.queries()[name](spark, SF_DIR))
        assert "Generate" not in p, f"{name} exploded:\n{p}"
        assert "BatchEvalPython" not in p
        assert _shuffles(p) == 1, f"{name} must be one rollup shuffle:\n{p}"


def test_share_window_over_broadcast_star(spark):
    """revenue_share_of_region: all four dim joins broadcast; the
    share window adds one exchange over 25 pre-aggregated rows."""
    p = _physical(entrymod.queries()["revenue_share_of_region"](spark, SF_DIR))
    assert p.count("BroadcastHashJoin") == 4, p
    assert "SortMergeJoin" not in p
    assert _shuffles(p) <= 2, p


def test_incremental_merge_shuffle_budget(spark):
    """incremental_agg_merge: two partial aggs + a state merge whose
    union reuses the returnflag partitioning — ≤2 hash exchanges, and
    the merge ships state rows (sum/count/min/max), not raw rows."""
    p = _physical(entrymod.queries()["incremental_agg_merge"](spark, SF_DIR))
    assert _shuffles(p) == 2, p
    assert "BatchEvalPython" not in p


def test_local_supplier_volume_broadcast_star(spark):
    """Q5-shape 5-way join: every dim branch broadcasts (orders under
    the year filter included), the cross-branch nation equality is a
    post-join filter, and the only Exchange is the nation rollup."""
    p = _physical(entrymod.queries()["local_supplier_volume"](spark, SF_DIR))
    assert p.count("BroadcastHashJoin") == 4, p
    assert "SortMergeJoin" not in p
    assert _shuffles(p) == 1, p


def test_supplier_share_no_second_fact_scan(spark):
    """Q11-shape share filter: the global total aggregates the
    per-supplier rows and broadcasts back — the fact table is scanned
    once (one supplier-grain shuffle + two 1-row exchanges)."""
    df = entrymod.queries()["supplier_revenue_share_filter"](spark, SF_DIR)
    p = _physical(df)
    assert p.count("FileScan parquet") == 2, p  # lineitem + supplier, once each
    assert "SortMergeJoin" not in p
    assert _shuffles(p) <= 3, p


def test_no_hof_expression_in_scan_filters(spark):
    """Fleet-wide pushdown hygiene: no query's physical plan may have
    a higher-order-function expression (shingle pipelines, sketch
    folds) inlined into a Filter or FileScan node. Catalyst pushes
    filters on derived columns below projections by re-inlining the
    defining expression — for a HOF over a token array that means
    re-tokenizing every row in the scan filter (observed 5-13x wall
    on two queries). Filters must be expressed on cheap columns
    (e.g. size(tokens) bounds) or provably-non-null folds wrapped in
    coalesce so inferred isnotnull constraints fold away."""
    # Queries where a lambda in the scan filter is the RIGHT plan: the
    # HOF predicate itself is the selective gate, so the scan filter
    # pays the fold once per row (unavoidable — the predicate needs
    # it) and the projection re-evaluates only for the few survivors.
    # The hazard this gate hunts is NON-selective filters, where both
    # Filter and Project run the lambdas over the full corpus.
    allowed = {"embedding_norm_outliers"}
    offenders = []
    for name, fn in entrymod.queries().items():
        if name in allowed:
            continue
        p = _physical(fn(spark, SF_DIR))
        for line in p.splitlines():
            stripped = line.strip().lstrip("+-: ")
            if stripped.startswith(("Filter", "FileScan")) and "lambdafunction" in line:
                offenders.append(name)
                break
    assert not offenders, offenders


# ---------------------------------------------------------- decision suite


def test_pricing_summary_single_scan_one_shuffle(spark):
    """Q1 shape: one lineitem scan, partial+final hash agg, exactly
    one Exchange — the canonical scan-bound pipeline."""
    p = _physical(entrymod.queries()["pricing_summary_report"](spark, SF_DIR))
    assert p.count("FileScan parquet") == 1, p
    assert p.count("HashAggregate") >= 2, f"need partial+final agg:\n{p}"
    assert _shuffles(p) == 1, p


def test_shipping_priority_pushes_both_date_filters(spark):
    """Q3 shape: the order-date and ship-date predicates must reach
    their respective parquet scans as pushed filters."""
    full = _full(entrymod.queries()["shipping_priority_topk"](spark, SF_DIR))
    scans = [l for l in full.splitlines() if "FileScan parquet" in l]
    assert any("o_orderdate" in l and "PushedFilters: [" in l for l in scans), scans
    assert any("l_shipdate" in l and "PushedFilters: [" in l for l in scans), scans


def test_exists_compiles_to_semi_join(spark):
    """Q4 shape: EXISTS must plan as a LeftSemi join carrying the
    non-equi lateness predicate — no aggregate-distinct fallback, no
    cartesian."""
    p = _physical(entrymod.queries()["order_priority_exists"](spark, SF_DIR))
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p


def test_market_share_single_fact_scan(spark):
    """Q8 shape: numerator and denominator of the share come from ONE
    lineitem scan via CASE — a second scan means the conditional
    aggregation degenerated into a self-join."""
    p = _physical(entrymod.queries()["market_share_yearly"](spark, SF_DIR))
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    li_scans = [l for l in scans if "lineitem" in l]
    assert len(li_scans) == 1, p
    assert "CartesianProduct" not in p


def test_disjunctive_bands_single_scan(spark):
    """Q19 shape: the OR-of-conjunctions stays one scan + one
    broadcast join — never three unioned branches."""
    p = _physical(entrymod.queries()["disjunctive_band_revenue"](spark, SF_DIR))
    li_scans = [l for l in p.splitlines() if "FileScan parquet" in l and "lineitem" in l]
    assert len(li_scans) == 1, p
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p


def test_small_lot_decorrelates_with_broadcasts(spark):
    """Q17 shape: the correlated avg is a per-part aggregate joined
    back; the filtered brand dim broadcasts into both branches."""
    p = _physical(entrymod.queries()["small_lot_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_dormant_customers_anti_join_broadcasts(spark):
    """Q22 shape: NOT EXISTS is a broadcast anti join; the only
    nested-loop is against the 1-row scalar average."""
    p = _physical(entrymod.queries()["dormant_customer_balances"](spark, SF_DIR))
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p
    # the scalar cross join must be a 1-row broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in p, p


def test_min_price_filters_before_aggregate(spark):
    """Q2 shape: the selective part filter must apply BELOW the
    (part, supplier) aggregate via a broadcast semi join — aggregating
    the unfiltered fact first shuffles 20x the data."""
    p = _physical(entrymod.queries()["min_price_supplier_per_part"](spark, SF_DIR))
    assert "LeftSemi" in p, p
    li_scans = [l for l in p.splitlines() if "FileScan parquet" in l and "lineitem" in l]
    assert len(li_scans) == 1, p
    # semi join must appear under the first HashAggregate, i.e. the agg
    # input is already filtered: no SortMergeJoin anywhere
    assert "SortMergeJoin" not in p, p


def test_sole_late_supplier_two_fact_passes(spark):
    """Q21 shape: the EXISTS/NOT-EXISTS pair resolves with at most two
    lineitem passes (per-order distinct aggregate + late-row probe),
    never correlated re-scans or a cartesian."""
    p = _physical(entrymod.queries()["sole_late_supplier_ranking"](spark, SF_DIR))
    li_scans = [l for l in p.splitlines() if "FileScan parquet" in l and "lineitem" in l]
    assert len(li_scans) <= 2, p
    assert "CartesianProduct" not in p


def test_indicator_windows_two_shuffles_no_python(spark):
    """Bollinger/RSI: daily-close dedup + per-series rolling frames —
    two hash exchanges, all JVM."""
    for name in ("bollinger_band_breakouts", "rsi_14day"):
        p = _physical(entrymod.queries()[name](spark, SF_DIR))
        assert "BatchEvalPython" not in p
        assert _shuffles(p) <= 2, f"{name}:\n{p}"


def test_cascade_single_scan_three_grains(spark):
    """cascading_time_rollup: one raw scan; each coarser grain
    aggregates ONLY the previous level (3 grain exchanges, shrinking
    each level)."""
    p = _physical(entrymod.queries()["cascading_time_rollup"](spark, SF_DIR))
    assert p.count("FileScan parquet") == 1, p
    assert _shuffles(p) <= 3, p
    assert p.count("HashAggregate") >= 4, f"cascade must keep per-level aggs:\n{p}"


def test_sentiment_is_map_only(spark):
    """lexicon_sentiment_scores: scan->project, zero exchanges, no
    explode, no Python — the lexicon is inlined literals."""
    p = _physical(entrymod.queries()["lexicon_sentiment_scores"](spark, SF_DIR))
    assert _shuffles(p) == 0, p
    assert "Generate" not in p and "BatchEvalPython" not in p


def test_shape_match_stays_in_series_partitions(spark):
    """ts_shape_match_topk: candidate windows never leave their
    series partition — two exchanges (daily dedup + per-series
    frames; the final top-k is a driver-side limit), distance folds
    JVM-side."""
    p = _physical(entrymod.queries()["ts_shape_match_topk"](spark, SF_DIR))
    assert "BatchEvalPython" not in p
    assert _shuffles(p) <= 3, p
    assert "CartesianProduct" not in p


def test_topk_per_group_reuses_aggregate_exchange(spark):
    """topk_parts_per_nation: the rank's partitioning (nation) is a
    subset of the aggregate's grouping keys — ≤2 exchanges total, and
    rk<=3 must push a WindowGroupLimit below the final window sort."""
    p = _physical(entrymod.queries()["topk_parts_per_nation"](spark, SF_DIR))
    assert _shuffles(p) <= 2, p
    assert "WindowGroupLimit" in p, f"top-k pushdown missing:\n{p}"
    assert "SortMergeJoin" not in p


def test_props_map_generate_then_one_rollup(spark):
    """props_map_profile: one Generate (map-key explode) feeding one
    key-grain aggregation — the distinct resolves inside the same
    agg, no extra distinct exchange beyond the two-phase count."""
    p = _physical(entrymod.queries()["props_map_profile"](spark, SF_DIR))
    assert "Generate" in p, p
    assert _shuffles(p) <= 2, p
    assert "BatchEvalPython" not in p


def test_fleet_no_cartesian_no_row_python(spark):
    """Whole-inventory invariants (plans/audit.py): zero
    CartesianProduct and zero row-at-a-time Python across every
    registered query's executed plan."""
    from lakehouse_for_data_streaming_and_analysis_spark.plans import audit

    report = audit.plan_audit(spark, SF_DIR, entrymod.queries()).collect()
    assert len(report) >= 160
    cart = [r["query"] for r in report if r["has_cartesian"]]
    rowpy = [r["query"] for r in report if r["has_row_python"]]
    assert not cart, cart
    assert not rowpy, rowpy


def test_q6_pushes_all_three_predicates(spark):
    """Q6: date, discount, and quantity predicates must all reach the
    lineitem scan as pushed filters — the row-group-skipping path."""
    full = _full(entrymod.queries()["forecast_revenue_change"](spark, SF_DIR))
    scans = [l for l in full.splitlines() if "FileScan parquet" in l]
    assert scans, full
    line = scans[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in line, (col, line)


def test_q20_two_semi_joins_one_aggregate(spark):
    """Q20: nested INs plan as two semi joins around one fact-side
    aggregate — no distinct materialization, no sort-merge."""
    p = _physical(entrymod.queries()["promotion_part_suppliers"](spark, SF_DIR))
    assert p.count("LeftSemi") == 2, p
    assert "SortMergeJoin" not in p, p


def test_registered_pandas_udf_is_arrow_eval(spark):
    """UDF surface (SURVEY §2.12): when user logic must run in
    Python, it registers as an Arrow-batched pandas UDF callable from
    spark.sql — the plan shows ArrowEvalPython (vectorized batches),
    never BatchEvalPython (row pickling)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _log_return_pct(cur, prev):
        import numpy as np

        return (np.log(cur / prev)) * 100.0

    log_return_pct = pandas_udf(_log_return_pct, "double")

    spark.udf.register("log_return_pct", log_return_pct)
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import register_views

    register_views(spark, SF_DIR, ("events",))
    df = spark.sql(
        """SELECT event_type,
                  ROUND(AVG(log_return_pct(value + 100, CAST(100.0 AS DOUBLE))), 4) AS avg_lr
           FROM events GROUP BY event_type"""
    )
    rows = df.collect()
    assert len(rows) > 0 and all(r["avg_lr"] is not None for r in rows)
    p = _physical(df)
    assert "ArrowEvalPython" in p, p
    assert "BatchEvalPython" not in p


def test_neardup_pairs_banded_equi_join(spark):
    """embedding_neardup_pairs must generate candidates through the
    banded (table, bucket) equi-join — never the all-pairs
    id_a < id_b nested loop r01 shipped (quadratic at scale)."""
    df = entrymod.queries()["embedding_neardup_pairs"](spark, SF_DIR)
    p = _physical(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_simhash_pairs_banded_equi_join(spark):
    """simhash near-dup pairs must generate candidates via the exact
    pigeonhole (chunk, value) equi-join — never the all-pairs
    doc_a < doc_b nested loop (quadratic at scale)."""
    df = entrymod.queries()["simhash_hamming_pairs"](spark, SF_DIR)
    p = _physical(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_boilerplate_share_single_lineage_window(spark):
    """Document frequency must come from a window over the exploded
    trigram stream — exactly one explode (Generate) in the plan, no
    self-join recompute of the tokenize pass."""
    df = entrymod.queries()["boilerplate_trigram_share"](spark, SF_DIR)
    p = _physical(df)
    assert p.count("Generate") == 1, p


def test_doc_chunking_map_only(spark):
    """Chunking is map-side: no key-based shuffle anywhere — the only
    permitted Exchange is the catalog's deliberate round-robin fan-out
    of the single small input file (parallelism, not data movement by
    key)."""
    df = entrymod.queries()["doc_chunking_map"](spark, SF_DIR)
    p = _physical(df)
    assert "Exchange hashpartitioning" not in p, p
    assert "Exchange rangepartitioning" not in p, p
    assert "Exchange SinglePartition" not in p, p


def test_adamic_adar_wedges_are_equi_joins(spark):
    """Adamic-Adar: the wedge enumeration must be equi-joins on the
    center node (with the hub cap bounding fan-out) and the non-edge
    filter a LEFT ANTI — never a cartesian over candidate pairs."""
    df = entrymod.queries()["adamic_adar_link_prediction"](spark, SF_DIR)
    p = _physical(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p, p


def test_kendall_pair_join_is_equi_on_type(spark):
    """Kendall tau's pair census: the self-join must key on
    event_type (days^2 pairs per series — calendar-bounded), with the
    d1 < d2 ordering as a post-join filter, not a nested loop over
    the cross product of all days of all series."""
    df = entrymod.queries()["spearman_kendall_daily"](spark, SF_DIR)
    p = _physical(df)
    assert "CartesianProduct" not in p


def test_countmin_cells_broadcast_to_probes(spark):
    """Count-Min probe: the 3x1024 cell table must be the BROADCAST
    side of the probe join — the sketch is constant-size by design
    and must never force a shuffle of the probe stream."""
    df = entrymod.queries()["countmin_heavy_hitters_gate"](spark, SF_DIR)
    p = _physical(df)
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_global_windows_declare_bounded_grain():
    """Fleet gate (VERDICT r8 ask #8): every unpartitioned
    Window.orderBy in the package must declare what bounds its single
    partition via a '# bounded-grain:' tag at the call site — the
    justification the per-round reviews kept re-earning in prose is
    now structural. New global windows without a declared grain (or a
    pointer to their documented 100 TB path) fail here."""
    from tools.lint_global_windows import lint

    problems = lint()
    assert not problems, (
        "untagged global Window.orderBy sites (declare the bounding "
        f"grain or partition the window): {problems}"
    )
