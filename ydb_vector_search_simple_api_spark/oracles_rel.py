"""DuckDB oracle SQL twins for ``operators/relational.py``.

Same parity rules as the other oracle modules; floating sums go
through ``DECIMAL(18,6)`` per-row casts in BOTH engines so the
aggregation is exact and order-independent (binary doubles essentially
never land on exact decimal rounding ties, so the double->decimal cast
is deterministic and identical across engines).
"""

from __future__ import annotations


def _dsum(expr: str) -> str:
    return f"CAST(sum(({expr})::DECIMAL(18,6)) AS DOUBLE)"


PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum("l_quantity")} AS sum_qty,
       {_dsum("l_extendedprice")} AS sum_base_price,
       {_dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       {_dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       ROUND({_dsum("l_quantity")} / count(*)::DOUBLE, 6) + 0.0 AS avg_qty,
       ROUND({_dsum("l_discount")} / count(*)::DOUBLE, 6) + 0.0 AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


REVENUE_BY_NATION = f"""
SELECT r_name, n_name,
       {_dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       count(*)::BIGINT AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def top_customers_sql(top: int = 3) -> str:
    return f"""
WITH spend AS (
  SELECT o_custkey,
         {_dsum("o_totalprice")} AS total_spend,
         count(*)::BIGINT AS n_orders
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT n_name, o_custkey AS custkey, total_spend, n_orders,
         ROW_NUMBER() OVER (
           PARTITION BY n_name ORDER BY total_spend DESC, o_custkey ASC
         ) AS rank
  FROM spend
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
)
SELECT n_name, custkey, total_spend, n_orders, rank
FROM ranked WHERE rank <= {top}
"""


ORDERS_ROLLUP = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       {_dsum("o_totalprice")} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


PARTS_ORDERED_BY_BRAND = """
SELECT p_brand, count(*)::BIGINT AS n_supplied_parts
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""

ORDERS_CUBE = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       {_dsum("o_totalprice")} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def repeat_customers_sql(year_a: int = 1995, year_b: int = 1996) -> str:
    return f"""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = {year_a}
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = {year_b}
"""


def lapsed_customers_sql(year_a: int = 1995, year_b: int = 1996) -> str:
    return f"""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = {year_a}
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = {year_b}
"""


def shipping_priority_sql(segment: str = "BUILDING", cutoff: str = "1998-06-01") -> str:
    return f"""
SELECT l_orderkey,
       {_dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       o_orderdate, o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def returned_items_sql(top: int = 20) -> str:
    return f"""
WITH lost AS (
  SELECT o_custkey,
         {_dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, revenue, c_acctbal, c_mktsegment
FROM lost JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT {top}
"""


def supplier_profit_sql(part_word: str = "red") -> str:
    return f"""
SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       {_dsum("l_extendedprice * (1.0 - l_discount)")} AS profit,
       count(*)::BIGINT AS n_lineitems
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{part_word}%'
GROUP BY n_name, year(o_orderdate)
"""


SHIPMODE_PRIORITY = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_returnflag
"""


PROMO_REVENUE_SHARE = f"""
WITH j AS (
  SELECT l_extendedprice * (1.0 - l_discount) AS rev, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1999-06-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-07-01 00:00:00'
),
s AS (
  SELECT {_dsum("CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0.0 END")} AS promo_revenue,
         {_dsum("rev")} AS total_revenue
  FROM j
)
SELECT promo_revenue, total_revenue,
       ROUND(promo_revenue / total_revenue, 6) + 0.0 AS promo_share
FROM s
"""


def cheapest_supplier_sql(top: int = 25) -> str:
    return f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         ROUND(CAST(sum(l_extendedprice::DECIMAL(18,6)) AS DOUBLE)
               / CAST(sum(l_quantity::DECIMAL(18,6)) AS DOUBLE), 6) + 0.0 AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
ranked AS (
  SELECT ps.l_partkey AS p_partkey, s.s_suppkey, s.s_name, ps.unit_price,
         ROW_NUMBER() OVER (
           PARTITION BY ps.l_partkey
           ORDER BY ps.unit_price ASC, s.s_acctbal DESC, s.s_suppkey ASC
         ) AS rn
  FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
)
SELECT p_partkey, s_suppkey, s_name, unit_price
FROM ranked WHERE rn = 1
ORDER BY p_partkey LIMIT {top}
"""


def priority_with_returns_sql(q_start: str = "1999-01-01", q_end: str = "1999-04-01") -> str:
    return f"""
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{q_start} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{q_end} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


def important_parts_sql(fraction: float = 0.0006) -> str:
    return f"""
WITH per_part AS (
  SELECT l_partkey,
         {_dsum("l_extendedprice * (1.0 - l_discount)")} AS part_value
  FROM lineitem GROUP BY l_partkey
),
total AS (
  SELECT CAST(sum(part_value::DECIMAL(18,6)) AS DOUBLE) AS tot FROM per_part
)
SELECT l_partkey, part_value
FROM per_part CROSS JOIN total
WHERE part_value > tot * {fraction}
ORDER BY part_value DESC, l_partkey ASC
"""


def revenue_moving_avg_sql(days: int = 7) -> str:
    return f"""
WITH o AS (
  SELECT date_trunc('day', o_orderdate) AS day, o_totalprice FROM orders
),
daily AS (
  SELECT day, sum(o_totalprice::DECIMAL(18,6)) AS rev_dec FROM o GROUP BY day
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
grid AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
),
filled AS (
  SELECT grid.day, COALESCE(daily.rev_dec, 0::DECIMAL(18,6)) AS rev_dec
  FROM grid LEFT JOIN daily ON grid.day = daily.day
)
SELECT day,
       ROUND(rev_dec::DOUBLE, 6) + 0.0 AS revenue,
       ROUND(CAST(sum(rev_dec) OVER w AS DOUBLE)
             / count(*) OVER w::DOUBLE, 6) + 0.0 AS moving_avg
FROM filled
WINDOW w AS (ORDER BY day ROWS BETWEEN {days - 1} PRECEDING AND CURRENT ROW)
"""


JOIN_CARDINALITY_REPORT = """
SELECT
  (SELECT count(*) FROM orders)::BIGINT AS n_orders,
  (SELECT count(*) FROM lineitem)::BIGINT AS n_lineitems,
  (SELECT count(DISTINCT o_orderkey) FROM orders)::BIGINT AS n_order_keys,
  (SELECT count(DISTINCT l_orderkey) FROM lineitem)::BIGINT AS n_lineitem_keys,
  (SELECT count(DISTINCT l_orderkey) FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders))::BIGINT AS n_matched_keys,
  (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey)::BIGINT AS n_join_rows
"""


REVENUE_WOW_CHANGE = """
WITH weekly AS (
  SELECT date_trunc('week', o_orderdate) AS week,
         sum(o_totalprice::DECIMAL(18,6)) AS rev_dec
  FROM orders GROUP BY week
)
SELECT week,
       ROUND(rev_dec::DOUBLE, 6) + 0.0 AS revenue,
       ROUND((rev_dec::DOUBLE - lag(rev_dec) OVER (ORDER BY week)::DOUBLE)
             / lag(rev_dec) OVER (ORDER BY week)::DOUBLE * 100.0, 6) + 0.0 AS pct_change
FROM weekly
"""


def top_supplier_revenue_sql(
    q_start: str = "1996-01-01", q_end: str = "1996-04-01"
) -> str:
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         {_dsum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{q_start} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{q_end} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def large_volume_customers_sql(qty_threshold: float = 150.0) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, {_dsum("l_quantity")} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {_dsum("l_quantity")} > {qty_threshold!r}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey ASC
"""


def idle_high_balance_customers_sql(idle_year: int = 1998) -> str:
    return f"""
WITH avg_bal AS (
  SELECT ROUND(CAST(sum(c_acctbal::DECIMAL(18,6)) AS DOUBLE)
               / count(*)::DOUBLE, 6) + 0.0 AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       count(*)::BIGINT AS numcust,
       {_dsum("c_acctbal")} AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = {idle_year}
  )
GROUP BY c_nationkey
"""


def local_supplier_revenue_sql(
    region: str = "ASIA", y_start: int = 1996, y_end: int = 1997
) -> str:
    return f"""
SELECT n_name, {_dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{region}'
  AND year(o_orderdate) >= {y_start} AND year(o_orderdate) < {y_end}
GROUP BY n_name
"""


def forecast_revenue_change_sql(
    y_start: int = 1996, d_lo: float = 0.05, d_hi: float = 0.07, q_max: float = 24.0
) -> str:
    return f"""
SELECT {_dsum("l_extendedprice * l_discount")} AS promo_revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE year(l_shipdate) = {y_start}
  AND l_discount >= {d_lo!r} AND l_discount <= {d_hi!r}
  AND l_quantity < {q_max!r}
"""


def volume_shipping_sql(
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
    y_start: int = 1995, y_end: int = 1998,
) -> str:
    return f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       {_dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('{nation_a}', '{nation_b}')
  AND nc.n_name IN ('{nation_a}', '{nation_b}')
  AND ns.n_name <> nc.n_name
  AND year(l_shipdate) >= {y_start} AND year(l_shipdate) < {y_end}
GROUP BY supp_nation, cust_nation, l_year
"""


def national_market_share_sql(
    target_nation: str = "NATION_2", region: str = "ASIA", p_type: str = "PROMO"
) -> str:
    return f"""
SELECT year(o_orderdate)::BIGINT AS o_year,
       ROUND(
         CAST(COALESCE(sum(CASE WHEN ns.n_name = '{target_nation}'
               THEN (l_extendedprice * (1.0 - l_discount))::DECIMAL(18,6) END),
             0::DECIMAL(18,6)) AS DOUBLE)
         / {_dsum("l_extendedprice * (1.0 - l_discount)")},
         6) + 0.0 AS mkt_share,
       {_dsum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '{p_type}')
  AND o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation nr ON c_nationkey = nr.n_nationkey
    JOIN region ON nr.n_regionkey = r_regionkey
    WHERE r_name = '{region}'
  )
GROUP BY o_year
"""


def customer_order_distribution_sql(exclude_priority: str = "1-URGENT") -> str:
    return f"""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '{exclude_priority}'
  GROUP BY c_custkey
)
SELECT c_count, count(*)::BIGINT AS custdist
FROM per_cust GROUP BY c_count
"""


def small_quantity_revenue_sql(brand: str = "Brand#12", frac: float = 0.2) -> str:
    return f"""
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = '{brand}')
), per_part AS (
  SELECT l_partkey AS t_partkey,
         CAST(sum(l_quantity::DECIMAL(18,6)) AS DOUBLE) / count(*)::DOUBLE AS avg_qty
  FROM brand_li GROUP BY l_partkey
)
SELECT ROUND(CAST(COALESCE(sum(l_extendedprice::DECIMAL(18,6)), 0::DECIMAL(18,6))
             AS DOUBLE) / 7.0, 6) + 0.0 AS avg_yearly,
       count(*)::BIGINT AS n_small_lines
FROM brand_li JOIN per_part ON l_partkey = t_partkey
WHERE l_quantity < {frac!r} * avg_qty
"""


DISJUNCTIVE_BRANCH_REVENUE = f"""
SELECT {_dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_linestatus = 'O'
  AND (
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
     AND l_quantity BETWEEN 1.0 AND 11.0)
    OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 10.0 AND 20.0)
    OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 20.0 AND 30.0)
  )
"""


def waiting_suppliers_sql(top: int = 25) -> str:
    return f"""
WITH li_f AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_fail
  FROM li_f GROUP BY l_orderkey
)
SELECT s_suppkey, s_name,
       count(DISTINCT li_f.l_orderkey)::BIGINT AS numwait
FROM li_f
JOIN per_order ON li_f.l_orderkey = per_order.l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_returnflag = 'R' AND n_supp > 1 AND n_fail = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT {top}
"""


def excess_supply_suppliers_sql(
    name_prefix: str = "red", year: int = 1996, nation: str = "NATION_3"
) -> str:
    """Twin of :func:`operators.relational.excess_supply_suppliers`
    (TPC-H Q20 over the observed bridge). availqty decodes the md5
    hex draw via list_transform/list_reduce (no hex-to-int cast in
    DuckDB) — integer-exact on both engines."""
    return f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CASE WHEN l_shipdate >= '{year}-01-01'
                   AND l_shipdate < '{year + 1}-01-01'
              THEN l_quantity ELSE 0.0 END) AS qty_year,
         list_reduce(
           list_transform(generate_series(1, 6),
             i -> strpos('0123456789abcdef',
                    substr(md5(CAST(l_partkey AS VARCHAR) || '|' ||
                               CAST(l_suppkey AS VARCHAR)), i, 1)) - 1),
           (acc, dig) -> acc * 16 + dig)::BIGINT % 9999 + 1 AS availqty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
qual AS (
  SELECT DISTINCT ps.l_suppkey
  FROM ps JOIN part ON ps.l_partkey = p_partkey
  WHERE p_name LIKE '{name_prefix}%'
    AND availqty::DOUBLE > 0.5 * qty_year
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN qual ON s_suppkey = qual.l_suppkey
WHERE n_name = '{nation}'
ORDER BY s_name, s_suppkey
"""


def parts_supplier_relationship_sql(
    exclude_brand: str = "Brand#12", exclude_type: str = "PROMO"
) -> str:
    return f"""
WITH bridge AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM bridge
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{exclude_brand}'
  AND p_type <> '{exclude_type}'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""
