"""Relational coverage: results sanity + scale-shape plan assertions."""

from __future__ import annotations

from ydb_vector_search_simple_api_spark.operators import relational as R
from ydb_vector_search_simple_api_spark.plans import checks

from conftest import SF_SMALL


def test_pricing_summary_groups(spark):
    rows = R.pricing_summary(spark, SF_SMALL).collect()
    flags = {(r.l_returnflag, r.l_linestatus) for r in rows}
    assert len(rows) == len(flags) > 0
    for r in rows:
        assert r.count_order > 0
        assert r.sum_disc_price <= r.sum_base_price
        assert r.sum_charge >= r.sum_disc_price


def test_star_join_broadcasts_dimensions(spark):
    df = R.revenue_by_nation(spark, SF_SMALL)
    plan = checks.simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_revenue_partition_totals(spark):
    rows = R.revenue_by_nation(spark, SF_SMALL).collect()
    assert sum(r.n_lineitems for r in rows) > 0
    assert all(r.revenue > 0 for r in rows)


def test_top_customers_rank_bounds(spark):
    rows = R.top_customers_per_nation(spark, SF_SMALL, top=3).collect()
    per_nation = {}
    for r in rows:
        per_nation.setdefault(r.n_name, []).append(r.rank)
    for ranks in per_nation.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert max(ranks) <= 3


def test_rollup_grand_total(spark):
    rows = R.orders_rollup(spark, SF_SMALL).collect()
    grand = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    leaf_total = sum(
        r.n_orders
        for r in rows
        if r.o_orderstatus is not None and r.o_orderpriority is not None
    )
    assert grand[0].n_orders == leaf_total


def test_anti_and_semi_join_partition(spark):
    without = R.customers_without_orders(spark, SF_SMALL).count()
    brands = R.parts_ordered_by_brand(spark, SF_SMALL).collect()
    assert without >= 0
    assert sum(b.n_supplied_parts for b in brands) > 0


def test_cube_covers_all_grouping_sets(spark):
    rows = R.orders_cube(spark, SF_SMALL).collect()
    rollup = R.orders_rollup(spark, SF_SMALL).collect()
    # cube = rollup's sets + the (priority-only) slice
    prio_only = [
        r for r in rows if r.o_orderstatus is None and r.o_orderpriority is not None
    ]
    assert len(rows) == len(rollup) + len(prio_only)
    grand = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    assert sum(r.n_orders for r in prio_only) == grand[0].n_orders


def test_set_ops_partition_year_a_customers(spark):
    both = {r.custkey for r in R.repeat_customers(spark, SF_SMALL).collect()}
    only_a = {r.custkey for r in R.lapsed_customers(spark, SF_SMALL).collect()}
    assert both.isdisjoint(only_a)
    year_a = {
        r.o_custkey for r in R._custkeys_of_year(spark, SF_SMALL, 1995).collect()
    }
    # INTERSECT ∪ EXCEPT exactly reconstructs the distinct year-A set
    assert both | only_a == year_a


def test_cube_plan_is_one_expand_one_shuffle(spark):
    plan = checks.simple_plan(R.orders_cube(spark, SF_SMALL))
    assert plan.count("Expand") == 1, plan  # all 4 grouping sets, one scan
    assert plan.count("Exchange") == 1, plan


def test_set_op_plans_dedup_before_join(spark):
    for fn, join_kind in (
        (R.repeat_customers, "LeftSemi"),
        (R.lapsed_customers, "LeftAnti"),
    ):
        plan = checks.simple_plan(fn(spark, SF_SMALL))
        assert join_kind in plan, plan
        # distinct aggregate runs before the join (map-side partial)
        assert "HashAggregate" in plan, plan


def test_revenue_deciles_balanced(spark):
    from collections import Counter

    from ydb_vector_search_simple_api_spark.operators.relational import (
        customer_revenue_deciles,
    )

    rows = customer_revenue_deciles(spark, SF_SMALL).collect()
    sizes = Counter(r.decile for r in rows)
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r.decile, []).append(r.revenue)
    assert min(by_decile[1]) >= max(by_decile[10])


def test_shipping_priority_contract(spark):
    rows = R.shipping_priority(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    import datetime
    cutoff = datetime.datetime(1998, 6, 1)
    assert all(r.o_orderdate < cutoff for r in rows)


def test_shipping_priority_broadcasts(spark):
    from ydb_vector_search_simple_api_spark.plans import checks
    plan = checks.simple_plan(R.shipping_priority(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_returned_items_top_slice(spark):
    rows = R.returned_items(spark, SF_SMALL, top=20).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)


def test_supplier_profit_consistency(spark):
    rows = R.supplier_profit(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(1995 <= r.o_year <= 2001 for r in rows)
    assert all(r.n_lineitems > 0 for r in rows)
    # every (nation, year) appears once
    keys = [(r.nation, r.o_year) for r in rows]
    assert len(keys) == len(set(keys))


def test_shipmode_priority_counts_partition(spark):
    rows = R.shipmode_priority(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.high_line_count >= 0 and r.low_line_count >= 0
        assert r.high_line_count + r.low_line_count > 0


def test_promo_revenue_share_bounds(spark):
    r = R.promo_revenue_share(spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.promo_share <= 1.0
    assert r.promo_revenue <= r.total_revenue


def test_cheapest_supplier_one_per_part(spark):
    rows = R.cheapest_supplier_per_part(spark, SF_SMALL, top=25).collect()
    keys = [r.p_partkey for r in rows]
    assert len(keys) == len(set(keys)) > 0
    assert all(r.unit_price > 0 for r in rows)


def test_shipping_priority_pushes_date_filters(spark):
    from ydb_vector_search_simple_api_spark.plans import checks

    df = R.shipping_priority(spark, SF_SMALL)
    pushed = checks.pushed_filters(df)
    # both date predicates reach the parquet scans
    assert "l_shipdate" in pushed and "o_orderdate" in pushed, pushed


def test_supplier_profit_broadcasts_all_dimensions(spark):
    from ydb_vector_search_simple_api_spark.plans import checks

    plan = checks.simple_plan(R.supplier_profit(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_priority_with_returns_semi_join_shape(spark):
    from ydb_vector_search_simple_api_spark.plans import checks

    df = R.priority_with_returns(spark, SF_SMALL)
    rows = df.collect()
    assert rows and all(r.n_orders > 0 for r in rows)
    plan = checks.simple_plan(df)
    assert "LeftSemi" in plan, plan
    pushed = checks.pushed_filters(df)
    assert "o_orderdate" in pushed and "l_returnflag" in pushed, pushed


def test_important_parts_threshold(spark):
    rows = R.important_parts(spark, SF_SMALL).collect()
    assert rows
    vals = [r.part_value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_revenue_moving_avg_window(spark):
    rows = sorted(R.revenue_moving_avg(spark, SF_SMALL).collect(), key=lambda r: r.day)
    assert rows
    # replay the trailing-7 mean over the returned daily series
    revs = [r.revenue for r in rows]
    for i, r in enumerate(rows):
        lo = max(0, i - 6)
        window = revs[lo : i + 1]
        assert abs(r.moving_avg - round(sum(window) / len(window), 6)) < 1e-6


def test_join_cardinality_invariants(spark):
    r = R.join_cardinality_report(spark, SF_SMALL).collect()[0]
    assert r.n_order_keys <= r.n_orders
    assert r.n_matched_keys <= min(r.n_order_keys, r.n_lineitem_keys)
    # orderkey is unique in orders, so the join cannot exceed lineitems
    assert r.n_join_rows <= r.n_lineitems
    assert r.n_join_rows > 0


def test_revenue_wow_change_replay(spark):
    rows = sorted(R.revenue_wow_change(spark, SF_SMALL).collect(), key=lambda r: r.week)
    assert rows
    assert rows[0].pct_change is None
    for prev, cur in zip(rows, rows[1:]):
        want = round((cur.revenue - prev.revenue) / prev.revenue * 100.0, 6)
        assert abs(cur.pct_change - want) < 1e-4


def test_broadcast_hint_is_size_gated(spark):
    """hints.broadcast_if_small: under the byte threshold the dimension
    is force-hinted (broadcast even when AQE's own threshold would say
    no); past it the hint is withheld so AQE keeps its runtime veto.
    Proven by disabling autoBroadcastJoinThreshold: then the ONLY way a
    BroadcastHashJoin appears is our hint."""
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators.hints import (
        broadcast_if_small,
        plan_size_bytes,
    )
    from ydb_vector_search_simple_api_spark.sources.store import load_table

    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, SF_SMALL, "orders").select("o_custkey", "o_totalprice")
    assert plan_size_bytes(cust) > 0

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = orders.join(
            broadcast_if_small(cust, max_bytes=1 << 30),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert checks.uses_broadcast_join(hinted), checks.simple_plan(hinted)

        gated = orders.join(
            broadcast_if_small(cust, max_bytes=0),  # "dimension grew 100x"
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert not checks.uses_broadcast_join(gated), checks.simple_plan(gated)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q15_q18_q22_shapes(spark):
    """Round-4 TPC-H additions: scalar-max equality (Q15), grouped-fact
    HAVING before dimension joins (Q18), scalar-avg + anti join (Q22)."""
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.sources.store import load_table

    top = R.top_supplier_revenue(spark, SF_SMALL).collect()
    assert top, "some supplier has quarter revenue"
    assert len({r.total_revenue for r in top}) == 1  # all tied at max

    big = R.large_volume_customers(spark, SF_SMALL, qty_threshold=150.0).collect()
    assert all(r.sum_qty > 150.0 for r in big)
    qtys = [r.sum_qty for r in big]
    assert qtys == sorted(qtys, reverse=True)

    idle = R.idle_high_balance_customers(spark, SF_SMALL).collect()
    # replay: threshold + anti-join semantics
    cust = load_table(spark, SF_SMALL, "customer").collect()
    pos = [c.c_acctbal for c in cust if c.c_acctbal > 0.0]
    import decimal

    avg = round(
        float(sum(decimal.Decimal(str(round(b, 6))) for b in pos)) / len(pos), 4
    )
    assert sum(r.numcust for r in idle) <= sum(
        1 for c in cust if c.c_acctbal > avg - 1e-3
    )


def test_remaining_tpch_shapes(spark):
    """Round-4 completion of the TPC-H set expressible on this schema
    (Q5/Q6/Q7/Q8/Q13/Q17/Q19/Q21; Q16/Q20 need the absent partsupp):
    pin the semantic invariants each shape exists to test. Value
    parity vs DuckDB is the oracle gate's job."""
    q5 = R.local_supplier_revenue(spark, SF_SMALL).collect()
    assert q5 and all(r.revenue > 0 for r in q5)
    # co-nationality restricts to nations of the chosen region: ASIA
    # holds 5 of the 25 round-robin nations
    assert len(q5) <= 5

    q6 = R.forecast_revenue_change(spark, SF_SMALL).collect()
    assert len(q6) == 1 and q6[0].promo_revenue > 0

    q7 = R.volume_shipping(spark, SF_SMALL).collect()
    assert {r.supp_nation for r in q7} <= {"NATION_1", "NATION_2"}
    assert all(r.supp_nation != r.cust_nation for r in q7)

    q8 = R.national_market_share(spark, SF_SMALL).collect()
    assert q8 and all(0.0 <= r.mkt_share <= 1.0 for r in q8)

    q13 = R.customer_order_distribution(spark, SF_SMALL).collect()
    n_cust = R.load_table(spark, SF_SMALL, "customer").count()
    assert sum(r.custdist for r in q13) == n_cust  # partition of customers

    q17 = R.small_quantity_revenue(spark, SF_SMALL).collect()
    assert len(q17) == 1 and q17[0].avg_yearly >= 0.0

    q19 = R.disjunctive_branch_revenue(spark, SF_SMALL).collect()
    assert len(q19) == 1 and q19[0].n_lines >= 0

    q21 = R.waiting_suppliers(spark, SF_SMALL).collect()
    waits = [r.numwait for r in q21]
    assert waits == sorted(waits, reverse=True)
    assert len(q21) <= 25


def test_q16_shape(spark):
    """Q16 invariants: excluded brand/type never appear; supplier
    counts are positive and bounded by the supplier table."""
    rows = R.parts_supplier_relationship(spark, SF_SMALL).collect()
    assert rows
    assert all(r.p_brand != "Brand#12" and r.p_type != "PROMO" for r in rows)
    n_supp = R.load_table(spark, SF_SMALL, "supplier").count()
    assert all(0 < r.supplier_cnt <= n_supp for r in rows)
