"""Relational operator coverage over the TPC-H-ish tables.

The reference deliberately has no joins/aggregations/windows
(SURVEY.md §2, "deliberately absent"); these queries are extension
scope proving the engine's relational surface with stock Spark
operators, shaped for scale:

* dimension joins are broadcast (nation/region/customer vs lineitem),
  but the hint is SIZE-GATED (hints.broadcast_if_small): a forced hint
  bypasses AQE's threshold check, so a 100x-grown dimension must fall
  back to AQE's runtime choice instead of OOMing the driver;
* floating aggregations go through DECIMAL(18,6) per-row casts so the
  sums are exact and order-independent — bit-stable under any
  partitioning (a double sum is neither);
* derived averages are one division of exact sums, not AVG();
* windows partition by a bounded key (nation), never unpartitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .hints import broadcast_if_small as bcast_dim
from ..sources.store import load_table

DEC = "decimal(18,6)"


def _dsum(col) -> F.Column:
    """Exact, order-independent sum of a double column (via decimal),
    surfaced back as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over lineitem with exact
    decimal sums; avgs derived from sums (deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = revenue * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(revenue).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (F.round(_dsum("l_quantity") / n.cast("double"), 6) + F.lit(0.0)).alias("avg_qty"),
            (F.round(_dsum("l_discount") / n.cast("double"), 6) + F.lit(0.0)).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem ⋈ nation ⋈ region: the classic
    star join. Dimensions (nation, region, customer at these SFs) are
    broadcast; the single shuffle is the final groupBy(n_name)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(bcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(bcast_dim(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(bcast_dim(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(F.col("rev")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def top_customers_per_nation(spark: SparkSession, sf_dir: str, top: int = 3) -> DataFrame:
    """Window coverage: rank customers by exact total spend within each
    nation, keep the top N (ties broken by custkey)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = (
        orders.groupBy("o_custkey")
        .agg(_dsum("o_totalprice").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
        .join(bcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(bcast_dim(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("total_spend").desc(), F.col("o_custkey").asc()
    )
    return (
        spend.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top)
        .select(
            "n_name",
            F.col("o_custkey").alias("custkey"),
            "total_spend",
            "n_orders",
            "rank",
        )
    )


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP coverage: order counts by (status, priority) with
    subtotals and a grand total; exact decimal price sums."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("total_price"),
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage: NOT EXISTS as a left_anti join."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_mktsegment")


def parts_ordered_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join coverage: parts with at least one lineitem (EXISTS),
    counted per brand."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    supplied = part.join(
        li, part["p_partkey"] == li["l_partkey"], "left_semi"
    )
    return supplied.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_supplied_parts")
    )


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE coverage: counts + exact decimal sums over every subset of
    (status, priority) — rollup's superset (adds the priority-only
    slice and runs all groupings off ONE shuffle via Expand, not four
    scans)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("total_price"),
    )


def _custkeys_of_year(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == year)
        .select("o_custkey")
    )


def repeat_customers(
    spark: SparkSession, sf_dir: str, year_a: int = 1995, year_b: int = 1996
) -> DataFrame:
    """Set-op coverage (INTERSECT): customers ordering in both years.
    Compiles to partial-distinct aggregates + a left-semi hash join on
    the key — map-side dedup before the shuffle, so the exchanged rows
    are bounded by distinct customers, not orders."""
    a = _custkeys_of_year(spark, sf_dir, year_a)
    b = _custkeys_of_year(spark, sf_dir, year_b)
    return a.intersect(b).select(F.col("o_custkey").alias("custkey"))


def lapsed_customers(
    spark: SparkSession, sf_dir: str, year_a: int = 1995, year_b: int = 1996
) -> DataFrame:
    """Set-op coverage (EXCEPT DISTINCT): ordered in year A but never
    in year B — same shuffle shape as INTERSECT with a left-anti join."""
    a = _custkeys_of_year(spark, sf_dir, year_a)
    b = _custkeys_of_year(spark, sf_dir, year_b)
    return a.subtract(b).select(F.col("o_custkey").alias("custkey"))


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per user, one count column per event type. The
    values list is pinned explicitly — an unpinned pivot runs an extra
    distinct-collect job over the data to discover columns, and the
    output schema would depend on the data (both wrong at scale).
    Compiles to ONE aggregation with conditional counts (no join, no
    second scan)."""
    from ..sources.store import load_events

    ev = load_events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
        .select(
            "user_id", *[F.col(t).cast("bigint").alias(f"n_{t}") for t in types]
        )
    )


def user_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) the pivot back to (user_id, event_type, n) long
    form, dropping the zero cells the wide form fabricated — a
    round-trip with the original per-pair counts. ``unpivot`` is a
    narrow projection (each row expands in place; no shuffle beyond
    the pivot's own aggregation)."""
    wide = user_event_pivot(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        wide.unpivot(
            "user_id",
            [f"n_{t}" for t in types],
            "event_type",
            "n",
        )
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .filter(F.col("n") > 0)
    )


def customer_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment (ntile) of customers by lifetime revenue —
    the segmentation primitive. Revenue sums run in DECIMAL so the
    rank-input is deterministic; the ntile ORDER BY ties on custkey so
    bucket boundaries cannot drift between engines. One aggregation
    shuffle + one single-partition window over customer-count rows
    (the aggregated table, not the fact table — ntile needs a total
    order, so keep its input pre-aggregated and small)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue_dec")
    )
    w = Window.orderBy(F.col("revenue_dec").desc(), F.col("o_custkey").asc())
    return rev.select(
        F.col("o_custkey").alias("custkey"),
        (F.round(F.col("revenue_dec").cast("double"), 2) + F.lit(0.0)).alias("revenue"),
        F.ntile(10).over(w).alias("decile"),
    )


def shipping_priority(
    spark: SparkSession, sf_dir: str, segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
) -> DataFrame:
    """TPC-H Q3 shape: revenue of not-yet-shipped lineitems for one
    market segment's orders placed before the cutoff — top 10 by
    revenue. The two dimension sides (filtered customer, then the
    pre-filtered orders⋈customer result) broadcast into the lineitem
    scan; both date predicates push down to the parquet scans, so at
    100 TB the fact read is bounded by the cutoff partition range.
    Output (l_orderkey, revenue, o_orderdate, o_orderpriority)."""
    cut = F.lit(cutoff).cast("timestamp_ntz")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == segment)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        .join(bcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cut)
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
        )
    )
    # NO broadcast hint on the orders side: it scales with the orders
    # FACT table (one segment, pre-cutoff — still ~15-20% of orders),
    # not with a bounded dimension; AQE broadcasts it while it fits
    # and falls back to a shuffle join past the threshold
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum("rev").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def returned_items(spark: SparkSession, sf_dir: str, top: int = 20) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    lineitems (l_returnflag = 'R'). The returnflag predicate pushes to
    the fact scan; customer is the broadcast dimension; one groupBy
    shuffle on custkey, then TakeOrdered for the top slice.
    Output (c_custkey, c_name, revenue, c_acctbal, c_mktsegment)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(_dsum("rev").alias("revenue"))
        .join(bcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(top)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "c_mktsegment")
    )


def supplier_profit(
    spark: SparkSession, sf_dir: str, part_word: str = "red"
) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table in this schema): yearly
    profit per supplier nation for parts whose name contains
    ``part_word``. Five-way join where every dimension (filtered part,
    supplier, nation) broadcasts; orders joins on the already-grouped
    key side. Profit = extendedprice*(1-discount) summed in DECIMAL.
    Output (nation, o_year, profit, n_lineitems)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(part_word))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    return (
        li.join(bcast_dim(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(bcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(bcast_dim(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            _dsum("rev").alias("profit"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per return-flag class, how many high-priority
    vs low-priority orders shipped in 1999 — conditional aggregation
    after one fact⋈orders join (orders projected to two columns, the
    join key and the priority; the year predicate pushes to the
    lineitem scan). Output (l_returnflag, high_line_count,
    low_line_count)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the share of one month's revenue earned by
    ECONOMY-type parts — the conditional-revenue-ratio pattern. The
    part dimension broadcasts; sums are decimal-exact so the single
    final division is deterministic. Output one row
    (promo_revenue, total_revenue, promo_share)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1999-06-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-07-01").cast("timestamp_ntz"))
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
        )
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(bcast_dim(part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "ECONOMY", F.col("rev")).otherwise(F.lit(0.0))
    return j.agg(
        _dsum(promo).alias("promo_revenue"),
        _dsum("rev").alias("total_revenue"),
    ).select(
        "promo_revenue",
        "total_revenue",
        (
            F.round(F.col("promo_revenue") / F.col("total_revenue"), 6) + F.lit(0.0)
        ).alias("promo_share"),
    )


def cheapest_supplier_per_part(
    spark: SparkSession, sf_dir: str, top: int = 25
) -> DataFrame:
    """TPC-H Q2 shape (correlated-subquery pattern, window form): for
    each part, the supplier that sold it cheapest (min avg unit price
    over that part's lineitems; supplier acctbal breaks exact ties,
    then s_suppkey). The correlated ``price = (SELECT min ...)``
    becomes one window over the aggregated (part, supplier) table —
    the standard decorrelation. Top ``top`` parts by part key for a
    bounded gate output. Output (p_partkey, s_suppkey, s_name,
    unit_price)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.round(
                    F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                    / F.sum(F.col("l_quantity").cast(DEC)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("unit_price")
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_price").asc(),
        F.col("s_acctbal").desc(),
        F.col("s_suppkey").asc(),
    )
    return (
        ps.join(bcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "unit_price",
        )
        .orderBy("p_partkey")
        .limit(top)
    )


def priority_with_returns(
    spark: SparkSession, sf_dir: str, q_start: str = "1999-01-01", q_end: str = "1999-04-01"
) -> DataFrame:
    """TPC-H Q4 shape (EXISTS subquery): per order priority, how many
    of one quarter's orders have at least one returned lineitem. The
    EXISTS compiles to a left-semi join — the date predicate pushes to
    the orders scan, the returnflag predicate to the lineitem scan,
    and the semi join ships only l_orderkey from the fact side.
    Output (o_orderpriority, n_orders)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(q_start).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(q_end).cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def important_parts(
    spark: SparkSession, sf_dir: str, fraction: float = 0.0006
) -> DataFrame:
    """TPC-H Q11 shape (HAVING against a scalar subquery): parts whose
    total ordered value exceeds ``fraction`` of the grand total. The
    scalar total is a one-row aggregate broadcast into the HAVING
    filter — the standard decorrelation; the per-part aggregation is
    one keyed shuffle with map-side combine. Output (l_partkey,
    part_value) by value DESC, partkey ASC."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    per_part = li.groupBy("l_partkey").agg(_dsum("rev").alias("part_value"))
    total = per_part.agg(F.sum(F.col("part_value").cast(DEC)).cast("double").alias("tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("tot") * F.lit(fraction))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


def revenue_moving_avg(spark: SparkSession, sf_dir: str, days: int = 7) -> DataFrame:
    """Reporting shape: daily revenue with its trailing ``days``-day
    moving average over the gap-filled calendar grid (missing days
    count as zero revenue — a quiet day must drag the average down,
    not vanish). The grid is calendar-bounded, so the window runs over
    date-count rows, never the fact table; daily sums are
    decimal-exact. Output (day, revenue, moving_avg)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("DAY", "o_orderdate").alias("day"),
        F.col("o_totalprice"),
    )
    daily = o.groupBy("day").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec")
    )
    bounds = o.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    filled = grid.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("rev_dec"), F.lit(0).cast(DEC)).alias("rev_dec"),
    )
    w = Window.orderBy("day").rowsBetween(-(days - 1), Window.currentRow)
    return filled.select(
        "day",
        (F.round(F.col("rev_dec").cast("double"), 6) + F.lit(0.0)).alias("revenue"),
        (
            F.round(
                F.sum("rev_dec").over(w).cast("double")
                / F.count(F.lit(1)).over(w).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("moving_avg"),
    )


def join_cardinality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join sanity diagnostic for the orders⋈lineitem equi-join:
    per-side row and distinct-key counts, key-coverage (how many of
    each side's keys appear on the other), and the ACTUAL join
    cardinality — the numbers an engineer checks before shipping a
    join that might explode (a many-to-many key would make
    actual >> max(rows)). One aggregation per side plus the join
    count; all map-side combinable. Output one row (n_orders,
    n_lineitems, n_order_keys, n_lineitem_keys, n_matched_keys,
    n_join_rows)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o_stats = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_orderkey").alias("n_order_keys"),
    )
    li_stats = li.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.count_distinct("l_orderkey").alias("n_lineitem_keys"),
    )
    matched = (
        li.select(F.col("l_orderkey").alias("k"))
        .distinct()
        .join(o.select(F.col("o_orderkey").alias("k")).distinct(), "k", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_matched_keys"))
    )
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).agg(
        F.count(F.lit(1)).alias("n_join_rows")
    )
    return (
        o_stats.crossJoin(F.broadcast(li_stats))
        .crossJoin(F.broadcast(matched))
        .crossJoin(F.broadcast(joined))
        .select(
            "n_orders", "n_lineitems", "n_order_keys",
            "n_lineitem_keys", "n_matched_keys", "n_join_rows",
        )
    )


def revenue_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth report: weekly order revenue and its
    percent change vs the previous calendar week (lag over the weekly
    aggregate — date_trunc('week') keeps both engines on ISO Monday
    boundaries). First week reports NULL change. Output (week,
    revenue, pct_change)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("WEEK", "o_orderdate").alias("week"), "o_totalprice"
    )
    weekly = o.groupBy("week").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec")
    )
    w = Window.orderBy("week")
    prev = F.lag("rev_dec").over(w)
    return weekly.select(
        "week",
        (F.round(F.col("rev_dec").cast("double"), 6) + F.lit(0.0)).alias("revenue"),
        (
            F.round(
                (F.col("rev_dec").cast("double") - prev.cast("double"))
                / prev.cast("double")
                * 100.0,
                6,
            )
            + F.lit(0.0)
        ).alias("pct_change"),
    )


def top_supplier_revenue(
    spark: SparkSession, sf_dir: str,
    q_start: str = "1996-01-01", q_end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape (view + scalar max): per-supplier revenue over a
    quarter, keeping the supplier(s) that hit the maximum. The max is
    a one-row aggregate broadcast into the filter; equality is safe
    because both sides compare the same decimal-summed, rounded
    double. Output (s_suppkey, s_name, total_revenue)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(q_start).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(q_end).cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        _dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(bcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def large_volume_customers(
    spark: SparkSession, sf_dir: str, qty_threshold: float = 150.0
) -> DataFrame:
    """TPC-H Q18 shape (HAVING on a grouped fact, then enrich): orders
    whose total quantity clears the threshold, joined back to customer
    and order headers. The heavy aggregation happens FIRST on the
    narrow fact (map-side combine); only qualifying orders join the
    dimensions. Output (c_custkey, c_name, o_orderkey, o_orderdate,
    o_totalprice, sum_qty)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(float(qty_threshold)))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey").asc())
    )


def idle_high_balance_customers(
    spark: SparkSession, sf_dir: str, idle_year: int = 1998
) -> DataFrame:
    """TPC-H Q22 shape (scalar-avg subquery + anti join + rollup; the
    phone-prefix grouping keys on nation here — the testdata carries no
    phone column): customers with above-average positive balance and
    no orders in ``idle_year`` (every synthetic customer has SOME
    order, so the all-time anti-join would be vacuously empty),
    counted per nation. Output (c_nationkey, numcust, totacctbal)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.round(
                    F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_bal")
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == idle_year)
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
    )


def local_supplier_revenue(
    spark: SparkSession, sf_dir: str,
    region: str = "ASIA", y_start: int = 1996, y_end: int = 1997,
) -> DataFrame:
    """TPC-H Q5 shape (the full local-supplier join chain): revenue per
    nation from lineitems whose supplier and ordering customer share a
    nation, restricted to one region and an order-date window. Unlike
    ``revenue_by_nation`` (the customer-only star), this adds the
    supplier leg and the co-nationality equi-predicate, so the join
    graph is cyclic — Catalyst resolves it as fact ⋈ broadcast dims
    with the extra equality as a post-join filter. The only shuffle is
    the final groupBy(n_name)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") >= y_start) & (F.year("o_orderdate") < y_end)
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region_df = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == region
    ).select("r_regionkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(bcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(bcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(bcast_dim(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(bcast_dim(region_df), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_dsum("rev").alias("revenue"))
    )


def forecast_revenue_change(
    spark: SparkSession, sf_dir: str,
    y_start: int = 1996, d_lo: float = 0.05, d_hi: float = 0.07, q_max: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue scan — one tight
    filter-aggregate over lineitem, no joins. All three predicates
    (ship year, discount band, quantity cap) push down to the parquet
    scan; the aggregate is a single map-side-combined decimal sum.
    Output is one row (promo_revenue)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == y_start)
            & (F.col("l_discount") >= d_lo) & (F.col("l_discount") <= d_hi)
            & (F.col("l_quantity") < q_max)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("promo_revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


def volume_shipping(
    spark: SparkSession, sf_dir: str,
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
    y_start: int = 1995, y_end: int = 1998,
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — lineitems shipped
    between two specific nations (supplier in one, ordering customer
    in the other, both directions), bucketed by ship year. The nation
    filter lands on the two broadcast dimension legs BEFORE the fact
    join, so only qualifying customers/suppliers reach the probe side.
    Output (supp_nation, cust_nation, l_year, revenue)."""
    pair = [nation_a, nation_b]
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(pair)
    ).select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(bcast_dim(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        .join(bcast_dim(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") >= y_start) & (F.year("l_shipdate") < y_end)
    ).select(
        "l_orderkey", "l_suppkey",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(bcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum("rev").alias("revenue"))
    )


def national_market_share(
    spark: SparkSession, sf_dir: str,
    target_nation: str = "NATION_2", region: str = "ASIA", p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share — of all ``p_type``
    parts sold to customers in ``region``, what fraction of the
    revenue (per order year) came from suppliers in ``target_nation``.
    The share is a conditional-sum / total-sum ratio computed in one
    aggregation pass (no second scan); both sums are exact decimal
    folds and the division is rounded for cross-engine parity.
    Output (o_year, mkt_share, total_revenue)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == p_type
    ).select("p_partkey")
    nation = load_table(spark, sf_dir, "nation")
    region_df = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == region
    ).select("r_regionkey")
    cust_in_region = (
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        .join(
            bcast_dim(
                nation.join(
                    bcast_dim(region_df),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(
            bcast_dim(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("bigint").alias("o_year")
    )
    target_rev = F.when(F.col("supp_nation") == target_nation, F.col("rev"))
    return (
        li.join(bcast_dim(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(bcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            bcast_dim(cust_in_region),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy("o_year")
        .agg(
            (
                F.round(
                    F.coalesce(F.sum(target_rev.cast(DEC)), F.lit(0).cast(DEC))
                    .cast("double")
                    / F.sum(F.col("rev").cast(DEC)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("mkt_share"),
            _dsum("rev").alias("total_revenue"),
        )
    )


def customer_order_distribution(
    spark: SparkSession, sf_dir: str, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13 shape: the customer-by-order-count histogram. A left
    join keeps zero-order customers in the distribution (the whole
    point of Q13); the excluded-priority predicate stands in for the
    reference's comment NOT LIKE filter (this schema has no comment
    column). Two aggregations: per-customer count, then the histogram
    over counts. Output (c_count, custdist)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != exclude_priority
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


def small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#12", frac: float = 0.2
) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — for
    one brand's parts, lineitems whose quantity is under ``frac`` of
    that part's average order quantity. The correlated per-part AVG
    subquery decorrelates into one aggregate over lineitem joined back
    to the fact; the per-part threshold uses an exact decimal
    sum/count so both engines compare the same double. Output is one
    row (avg_yearly, n_small_lines)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == brand
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(bcast_dim(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    per_part = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    ).select(F.col("l_partkey").alias("t_partkey"), "avg_qty")
    return (
        li.join(bcast_dim(per_part), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.lit(frac) * F.col("avg_qty"))
        .agg(
            (
                F.round(
                    F.coalesce(
                        F.sum(F.col("l_extendedprice").cast(DEC)),
                        F.lit(0).cast(DEC),
                    ).cast("double")
                    / F.lit(7.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_small_lines"),
        )
    )


def disjunctive_branch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue matched by three disjunctive
    brand/size/quantity branches (OR of AND-groups across the
    part ⋈ lineitem join). The shared predicate (open linestatus —
    standing in for the reference's shipmode/shipinstruct columns this
    schema lacks) and the per-branch quantity bounds push to the scan;
    the branch disjunction evaluates post-join in one codegen stage.
    Output is one row (revenue, n_lines)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linestatus") == "O"
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    joined = li.join(bcast_dim(part), F.col("l_partkey") == F.col("p_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1.0, 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20.0, 30.0)
        )
    )
    return joined.filter(branch).agg(
        _dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


def waiting_suppliers(
    spark: SparkSession, sf_dir: str, top: int = 25
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who single-handedly held up
    multi-supplier orders. The reference phrases this as
    EXISTS(another supplier) AND NOT EXISTS(another FAILING supplier)
    via two lineitem self-joins; at 100 TB two self-joins of the fact
    are two extra fact-sized shuffles, so this computes the same
    predicate with ONE groupBy(l_orderkey) pass — per finalized order,
    the distinct-supplier count and the distinct-failing-supplier
    count (returnflag 'R' marks the failing line; this schema has no
    commit/receipt dates) — and joins the k-byte qualifying-order set
    back to the failing lines. Output (s_suppkey, s_name, numwait),
    top ``top`` by numwait."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail"),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_fail") == 1)
    ).select(F.col("l_orderkey").alias("q_orderkey"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(bcast_dim(qualifying), F.col("l_orderkey") == F.col("q_orderkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").cast("bigint").alias("numwait"))
        .join(bcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(top)
    )


def excess_supply_suppliers(
    spark: SparkSession, sf_dir: str,
    name_prefix: str = "red", year: int = 1996,
    nation: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q20 shape (suppliers whose stock of a part family exceeds
    half a year's shipments): this schema has no partsupp table, so —
    the same OBSERVED-bridge convention as Q16 — partsupp is the
    distinct (l_partkey, l_suppkey) pairs from lineitem, and
    ``ps_availqty`` is derived DETERMINISTICALLY from the pair key
    (1 + md5-hex6 % 9999 — TPC-H's own availqty domain; the md5 draw
    is the engine's established cross-engine-exact randomness,
    ``sampling.py``). A supplier qualifies if for some part named
    ``{prefix}%`` its availqty exceeds half the quantity it shipped
    of that part in ``year``; restricted to one nation.

    Plan shape: ONE fact-sized shuffle — the (partkey, suppkey)
    aggregation computes the bridge AND the in-year shipped quantity
    in the same pass (conditional sum), part/supplier/nation dims
    broadcast. Output (s_suppkey, s_name) ordered by name.
    """
    li = load_table(spark, sf_dir, "lineitem")
    in_year = (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp")
    )
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in_year, F.col("l_quantity")).otherwise(F.lit(0.0)))
            .alias("qty_year")
        )
        .withColumn(
            "availqty",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("l_partkey").cast("string"),
                            F.col("l_suppkey").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("bigint")
            % 9999
            + 1,
        )
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(name_prefix)
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == nation
    ).select("n_nationkey")
    qual = (
        ps.join(bcast_dim(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("availqty").cast("double") > F.lit(0.5) * F.col("qty_year"))
        .select(F.col("l_suppkey").alias("qs_suppkey"))
        .distinct()
    )
    return (
        supp.join(bcast_dim(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qual, F.col("s_suppkey") == F.col("qs_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )


def parts_supplier_relationship(
    spark: SparkSession, sf_dir: str,
    exclude_brand: str = "Brand#12", exclude_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q16 shape (distinct-count over a many-to-many bridge with
    NOT IN exclusions): how many distinct suppliers offer each
    (brand, type, size), excluding one brand, one type and suppliers
    in bad standing (negative balance — the complaints-comment
    stand-in; this schema also has no partsupp table, so the bridge
    is the OBSERVED distinct (l_partkey, l_suppkey) pairs from
    lineitem). The bridge dedup is the only fact-sized shuffle; part
    dims broadcast; the excluded-supplier set is an anti join.
    Output (p_brand, p_type, p_size, supplier_cnt)."""
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != exclude_brand) & (F.col("p_type") != exclude_type)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        bridge.join(bcast_dim(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(bcast_dim(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )
