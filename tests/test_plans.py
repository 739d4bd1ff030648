"""Plan-pinning tests: the physical-plan properties PLANS.md claims
for the headline queries, asserted so regressions (a lost pushdown, an
accidental extra exchange, a broadcast that stopped firing) fail CI
instead of silently costing 10x at scale."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    from confidential_storm_spark.plans.queries import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, sf_dir))
    # date predicate reaches the parquet scan
    assert "PushedFilters: [" in plan
    assert any("l_shipdate" in s[:200] for s in plan.split("PushedFilters")[1:])
    # projection pruned: the scan must not read all 11 lineitem columns
    read = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read and "l_orderkey" not in read


def test_q3_broadcasts_small_sides_and_takeordered(spark, sf_dir):
    from confidential_storm_spark.plans.queries import q3_top_revenue

    plan = _plan(q3_top_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # top-k compiles to TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_dp_bounded_histogram_exchange_budget(spark, sf_dir):
    """The flagship pipeline needs exactly three exchanges (user
    window, key agg, release sort) — an extra one means a lost
    partitioning reuse."""
    from confidential_storm_spark.plans.queries import dp_bounded_histogram

    plan = _plan(dp_bounded_histogram(spark, sf_dir))
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 3, plan


def test_wordcount_partial_aggregation(spark, sf_dir):
    """The explode+count pipeline must partial-aggregate map-side:
    two HashAggregates (partial, final) around one exchange."""
    from confidential_storm_spark.plans.queries import wordcount_histogram

    plan = _plan(wordcount_histogram(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_text_zipf_has_no_global_window(spark, sf_dir):
    """The Zipf fit must stay in spectrum form: a global row_number()
    rank would move the entire vocabulary to ONE partition
    ("WindowExec: No Partition Defined").  The plan may contain no
    window at all — ranks come from the distributed prefix scan plus
    JVM-side sequence aggregates (operators/ranks.py)."""
    from confidential_storm_spark.plans.queries import text_zipf

    plan = _plan(text_zipf(spark, sf_dir))
    assert "Window" not in plan, plan


def test_sample_weighted_compiles_to_takeordered(spark, sf_dir):
    """A-ES weighted sampling must be per-partition top-k heaps
    (TakeOrderedAndProject), never a global sort shuffle, with the key
    expression fused into the scan stage (no exchange before it)."""
    from confidential_storm_spark.plans.queries import sample_weighted

    plan = _plan(sample_weighted(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # no SEMANTIC exchange (the load_table single-split spread is a
    # round-robin REPARTITION_BY_NUM, dead at warehouse scale)
    assert "ENSURE_REQUIREMENTS" not in plan


def test_sketch_quantiles_has_no_single_partition_window(spark, sf_dir):
    """Cumulative sums run as the bounded pair-join, not a global
    window — the same no-single-partition rule text_zipf follows."""
    from confidential_storm_spark.plans.queries import sketch_quantiles

    plan = _plan(sketch_quantiles(spark, sf_dir))
    assert "Window" not in plan


def test_dedup_bloom_broadcasts_the_filter(spark, sf_dir):
    """The corpus reaches the probe ONLY as the bounded position
    relation, broadcast — no corpus-sized shuffle join."""
    from confidential_storm_spark.plans.queries import dedup_bloom

    plan = _plan(dedup_bloom(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_text_clean_is_scan_fused(spark, sf_dir):
    """The regex chain is pure per-row expression work: no exchange
    before the release-form sort."""
    from confidential_storm_spark.plans.queries import text_clean

    plan = _plan(text_clean(spark, sf_dir))
    # exactly the one range-partition exchange for the final orderBy
    # (the single-split spread repartition is not a semantic shuffle)
    assert plan.count("ENSURE_REQUIREMENTS") <= 1


def test_q4_compiles_to_semi_join_with_pushed_date_filter(spark, sf_dir):
    """The EXISTS must stay a semi join (each order emitted at most
    once, no fan-out + distinct) and the 1996 date filter must reach
    the orders parquet scan."""
    from confidential_storm_spark.plans.queries import q4_late_priority

    plan = _plan(q4_late_priority(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert any("o_orderdate" in s[:300] for s in plan.split("PushedFilters")[1:])


def test_q13_outer_join_aggregates_partially(spark, sf_dir):
    """The order-count distribution does two aggregations, each with
    map-side partial combine (>= 4 HashAggregates)."""
    from confidential_storm_spark.plans.queries import q13_order_distribution

    plan = _plan(q13_order_distribution(spark, sf_dir))
    assert "LeftOuter" in plan or "RightOuter" in plan, plan
    assert plan.count("HashAggregate") >= 4


def test_q22_anti_join_and_broadcast_scalar(spark, sf_dir):
    """The NOT EXISTS stays an anti join; the 1-row average joins by
    broadcast (no driver collect, no shuffle for the scalar)."""
    from confidential_storm_spark.plans.queries import q22_dormant_customers

    plan = _plan(q22_dormant_customers(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rolling_window_is_partitioned_by_user(spark, sf_dir):
    """The 6h RANGE frame must hash-partition by user_id — never the
    'No Partition Defined' single-partition window."""
    from confidential_storm_spark.plans.queries import q_rolling_user_value

    plan = _plan(q_rolling_user_value(spark, sf_dir))
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan, plan


def test_pivot_with_explicit_values_is_single_pass(spark, sf_dir):
    """pivot() with an explicit segment list must compile to one scan
    feeding a (key, segment) pre-agg then a pivotfirst fold — no
    distinct-values job, no per-segment scan.  Three exchanges: the
    two agg levels plus the final sort (the (key, segment) first
    shuffle is the skew-safe part: hot nations spread over their
    segments)."""
    from confidential_storm_spark.plans.queries import q_pivot_nation_segments

    plan = _plan(q_pivot_nation_segments(spark, sf_dir))
    assert plan.count("Exchange ") <= 3, plan
    assert plan.count("FileScan") == 1
    assert "pivotfirst" in plan


def test_except_compiles_to_anti_join(spark, sf_dir):
    """EXCEPT must be distinct + anti join, never a nested-loop."""
    from confidential_storm_spark.plans.queries import q_viewed_never_purchased

    plan = _plan(q_viewed_never_purchased(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unpivot_is_single_pass_expand(spark, sf_dir):
    """unpivot() must compile to one scan + Expand, not a per-metric
    union of scans."""
    from confidential_storm_spark.plans.queries import q_unpivot_quality

    plan = _plan(q_unpivot_quality(spark, sf_dir))
    assert "Expand" in plan, plan
    assert plan.count("FileScan") == 1


def test_q10_takeordered_and_broadcast_nation(spark, sf_dir):
    """Top-20 must be TakeOrderedAndProject (no global sort); nation
    joins broadcast; the returnflag filter reaches the lineitem scan."""
    from confidential_storm_spark.plans.queries import q10_returned_items

    plan = _plan(q10_returned_items(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan
    pushed = [s[:300] for s in plan.split("PushedFilters")[1:]]
    assert any("l_returnflag" in s for s in pushed), plan


def test_q12_single_shuffle_per_side_conditional_agg(spark, sf_dir):
    """The big-big join shuffles each side once on orderkey; the CASE
    aggregation partial-combines map-side (2 HashAggregates); the ship
    year filter reaches the lineitem scan."""
    from confidential_storm_spark.plans.queries import q12_priority_lines

    plan = _plan(q12_priority_lines(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert any("l_shipdate" in s[:300] for s in plan.split("PushedFilters")[1:])


def test_q14_broadcasts_part_dim(spark, sf_dir):
    """part must broadcast (plan-pinned); the month filter must reach
    the lineitem scan; only 3 lineitem columns read."""
    from confidential_storm_spark.plans.queries import q14_promo_revenue

    plan = _plan(q14_promo_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert any("l_shipdate" in s[:300] for s in plan.split("PushedFilters")[1:])
    read = plan.split("ReadSchema")[1][:300]
    assert "l_orderkey" not in read and "l_quantity" not in read


def test_q18_aggregates_before_joining(spark, sf_dir):
    """The per-order quantity rollup must run BEFORE the orders and
    customer joins — the joins see the ~0.1% HAVING survivors, not
    raw lineitem.  In the plan tree the lineitem-side HashAggregate
    appears below the first join."""
    from confidential_storm_spark.plans.queries import q18_large_orders

    plan = _plan(q18_large_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # the HAVING filter sits directly on the aggregated relation (the
    # join probes the filtered rollup, not raw lineitem): plans print
    # parent-before-child, so the total_qty filter precedes its agg
    f = plan.find("Filter (isnotnull(total_qty")
    a = plan.find("HashAggregate(keys=[l_orderkey")
    assert 0 <= f < a, plan
    # one semantic shuffle only: the per-order rollup
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q19_pushes_envelope_bounds_and_broadcasts_part(spark, sf_dir):
    """The disjunctive predicate keeps its factored envelope: brand
    IN-list pushed to the part scan, quantity bounds pushed to the
    lineitem scan, part broadcast."""
    from confidential_storm_spark.plans.queries import q19_bracket_revenue

    plan = _plan(q19_bracket_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    pushed = [s[:300] for s in plan.split("PushedFilters")[1:]]
    assert any("l_quantity" in s for s in pushed), plan
    assert any("p_brand" in s for s in pushed), plan


def test_shard_assignment_is_one_agg_pass(spark, sf_dir):
    """Shard balance is one map-side-combined agg over the scan: two
    HashAggregates, one semantic exchange (plus the release sort)."""
    from confidential_storm_spark.plans.queries import shard_assignment

    plan = _plan(shard_assignment(spark, sf_dir))
    assert plan.count("HashAggregate") == 2, plan
    assert plan.count("FileScan") == 1


def test_mixture_weights_broadcasts_source_count(spark, sf_dir):
    """The N-sources scalar joins by broadcast — no driver collect,
    no shuffle for the 1-row relation."""
    from confidential_storm_spark.plans.queries import mixture_weights

    plan = _plan(mixture_weights(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_q7_broadcasts_both_nation_legs(spark, sf_dir):
    """The nation dim joins twice (supplier leg, customer leg) — both
    broadcast, with the two-nation name filter pushed into each copy's
    scan so the fact rows are pruned by BOTH legs pre-rollup."""
    from confidential_storm_spark.plans.queries import q7_nation_trade

    plan = _plan(q7_nation_trade(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    pushed = [s[:300] for s in plan.split("PushedFilters")[1:]]
    assert sum("n_name" in s for s in pushed) >= 2, plan


def test_q8_snowflake_broadcasts_and_single_agg(spark, sf_dir):
    """All five dimension legs broadcast; the region name filter
    reaches the region scan; the share ratio comes from ONE agg pass
    (2 HashAggregates: partial + final), never two scans."""
    from confidential_storm_spark.plans.queries import q8_market_share

    plan = _plan(q8_market_share(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5, plan
    pushed = [s[:300] for s in plan.split("PushedFilters")[1:]]
    assert any("r_name" in s for s in pushed), plan
    assert plan.count("HashAggregate") == 2, plan


def test_oov_vocab_is_takeordered_and_broadcast(spark, sf_dir):
    """The top-V vocabulary compiles to TakeOrderedAndProject
    (per-partition heaps) and reaches the rate pass by broadcast."""
    from confidential_storm_spark.plans.queries import text_oov_rate

    plan = _plan(text_oov_rate(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q6_pushes_every_predicate(spark, sf_dir):
    """Q6 is pure pushdown: date, discount, and quantity predicates
    all reach the parquet scan; no join, no window, one agg."""
    from confidential_storm_spark.plans.queries import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, sf_dir))
    # all three predicates must land on ONE scan's pushed filters
    assert any(
        all(col in s[:500] for col in ("l_shipdate", "l_discount", "l_quantity"))
        for s in plan.split("PushedFilters")[1:]
    ), plan
    assert "Join" not in plan and "Window" not in plan


def test_q15_argmax_joins_broadcast_scalar(spark, sf_dir):
    """The 1-row max joins back by broadcast — no driver collect, no
    shuffle for the scalar; the quarter filter reaches the scan."""
    from confidential_storm_spark.plans.queries import q15_top_supplier

    plan = _plan(q15_top_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    pushed = [s[:300] for s in plan.split("PushedFilters")[1:]]
    assert any("l_shipdate" in s for s in pushed), plan


def test_q17_threshold_join_reuses_partkey_layout(spark, sf_dir):
    """The per-part threshold relation and the fact probe hash on the
    same key: the plan needs at most 3 exchanges (threshold agg, probe
    side, final 1-row combine) — a 4th means the partkey layout was
    lost between the agg and the join."""
    from confidential_storm_spark.plans.queries import q17_small_quantity

    plan = _plan(q17_small_quantity(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_profile_is_single_scan(spark, sf_dir):
    """All per-column aggregates (nulls, distincts, ranges) must fold
    into ONE scan of the table — profiling cost is one read, not one
    per column."""
    from confidential_storm_spark.plans.queries import q_profile_events

    plan = _plan(q_profile_events(spark, sf_dir))
    assert plan.count("FileScan") == 1, plan


def test_q2_single_fact_scan_window_min(spark, sf_dir):
    """The correlated-min subquery must compile to a partkey-keyed
    window over the aggregated offers — one lineitem scan, no
    self-join, every dimension leg broadcast."""
    from confidential_storm_spark.plans.queries import q2_min_cost_supplier

    plan = _plan(q2_min_cost_supplier(spark, sf_dir))
    assert plan.count("FileScan parquet") == len(
        [s for s in plan.split("FileScan parquet")[1:]]
    )  # sanity: splitter counts scans
    assert len([s for s in plan.split("FileScan parquet")[1:] if "lineitem.parquet" in s]) == 1
    assert "SortMergeJoin" not in plan
    assert "Window" in plan
    # part filter reaches the part scan
    assert any("p_size" in s[:200] for s in plan.split("PushedFilters")[1:])


def test_q9_star_broadcasts_dimensions(spark, sf_dir):
    """Part/supplier/nation legs broadcast; the part name pattern is
    pushed to the scan as a contains filter; the fact scan prunes to
    the 6 needed columns."""
    from confidential_storm_spark.plans.queries import q9_product_profit

    plan = _plan(q9_product_profit(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "StringContains(p_name" in plan
    read = [s[:400] for s in plan.split("ReadSchema")[1:] if "l_partkey" in s[:400]]
    assert read and all("l_tax" not in r and "l_returnflag" not in r for r in read)


def test_q11_threshold_is_broadcast_scalar_over_checkpoint(spark, sf_dir):
    """The global threshold joins back as a 1-row broadcast nested
    loop; the per-part rollup is checkpointed so the fact subtree
    never evaluates twice."""
    from confidential_storm_spark.plans.queries import q11_important_parts

    plan = _plan(q11_important_parts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert len([s for s in plan.split("FileScan parquet")[1:] if "lineitem.parquet" in s]) == 0


def test_q16_blacklist_is_broadcast_anti_join(spark, sf_dir):
    """NOT IN over non-null suppkeys must compile to a broadcast LEFT
    ANTI join, and the size/brand filters reach the part scan."""
    from confidential_storm_spark.plans.queries import q16_supplier_variety

    plan = _plan(q16_supplier_variety(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert any("p_size" in s[:300] for s in plan.split("PushedFilters")[1:])


def test_q20_dominance_is_window_single_scan(spark, sf_dir):
    """Per-part totals come from a window over the shipped rollup —
    one fact scan, ship-date range pushed, the dominant set broadcast
    LEFT SEMI into the supplier dim."""
    from confidential_storm_spark.plans.queries import q20_dominant_suppliers

    plan = _plan(q20_dominant_suppliers(spark, sf_dir))
    assert len([s for s in plan.split("FileScan parquet")[1:] if "lineitem.parquet" in s]) == 1
    assert "Window" in plan and "LeftSemi" in plan
    assert any("l_shipdate" in s[:300] for s in plan.split("PushedFilters")[1:])


def test_q21_sole_late_is_single_pass(spark, sf_dir):
    """The textbook EXISTS/NOT-EXISTS double self-join must NOT
    appear: one lineitem scan, order-keyed windows over the
    aggregated flags, top-N as TakeOrdered."""
    from confidential_storm_spark.plans.queries import q21_waiting_suppliers

    plan = _plan(q21_waiting_suppliers(spark, sf_dir))
    assert len([s for s in plan.split("FileScan parquet")[1:] if "lineitem.parquet" in s]) == 1
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan
    assert any("o_orderstatus" in s[:300] for s in plan.split("PushedFilters")[1:])
