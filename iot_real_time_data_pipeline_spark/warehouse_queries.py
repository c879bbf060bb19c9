"""Driver-facing warehouse (TPC-H-shaped) queries with DuckDB oracles.

All money aggregation is integer cents (see ``operators.warehouse``);
date cutoffs are integer epoch-nano literals shared between both
engines, so every output column is BIGINT/VARCHAR — nothing for the
value hash to diverge on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .driver_queries import QueryFn
from .entrypoints import read_table
from .operators import warehouse as WH


def _t(spark, sf_dir, name) -> DataFrame:
    return read_table(spark, sf_dir, name)


def q_q1(spark, sf_dir):
    return WH.q1_pricing_summary(_t(spark, sf_dir, "lineitem"))


def q_q3(spark, sf_dir):
    return WH.q3_shipping_priority(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
    )


def q_q4(spark, sf_dir):
    return WH.q4_order_priority(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


def q_q5(spark, sf_dir):
    return WH.q5_local_supplier_volume(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


def q_q10(spark, sf_dir):
    return WH.q10_returned_items(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
    )


def q_rollup(spark, sf_dir):
    return WH.sales_rollup(_t(spark, sf_dir, "lineitem"))


def q_integrity(spark, sf_dir):
    return WH.integrity_audit(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


def q_q6(spark, sf_dir):
    return WH.q6_forecast_revenue(_t(spark, sf_dir, "lineitem"))


def q_q13(spark, sf_dir):
    return WH.q13_order_distribution(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


def q_q14(spark, sf_dir):
    return WH.q14_promo_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


def warehouse_queries() -> dict[str, QueryFn]:
    return {
        "wh_q1_pricing_summary": q_q1,
        "wh_q3_shipping_priority": q_q3,
        "wh_q4_order_priority": q_q4,
        "wh_q5_local_supplier_volume": q_q5,
        "wh_q10_returned_items": q_q10,
        "wh_sales_rollup": q_rollup,
        "wh_integrity_audit": q_integrity,
        "wh_q6_forecast_revenue": q_q6,
        "wh_q13_order_distribution": q_q13,
        "wh_q14_promo_revenue": q_q14,
    }


_REV = "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"

_Q1_SQL = f"""
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         {_REV} AS disc_price_c,
         CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100)
              AS BIGINT) AS charge_c,
         CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp
  FROM lineitem WHERE (epoch_ns(l_shipdate) // 1000000000) <= {WH.Q1_SHIP_CUTOFF}
),
g AS (
  SELECT l_returnflag, l_linestatus,
         sum(qty_c) AS sum_qty_c, sum(price_c) AS sum_base_price_c,
         sum(disc_price_c) AS sum_disc_price_c, sum(charge_c) AS sum_charge_c,
         sum(disc_bp) AS sum_disc_bp, count(*) AS count_order
  FROM li GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(sum_qty_c AS BIGINT) AS sum_qty_c,
       CAST(sum_base_price_c AS BIGINT) AS sum_base_price_c,
       CAST(sum_disc_price_c AS BIGINT) AS sum_disc_price_c,
       CAST(sum_charge_c AS BIGINT) AS sum_charge_c,
       CAST((sum_qty_c * 100) // count_order AS BIGINT) AS avg_qty_cc,
       CAST((sum_base_price_c * 100) // count_order AS BIGINT) AS avg_price_cc,
       CAST(sum_disc_bp // count_order AS BIGINT) AS avg_disc_bp,
       count_order
FROM g"""

_Q3_SQL = f"""
SELECT o_orderkey, (epoch_ns(o_orderdate) // 1000000000) AS o_orderdate_sec, o_orderpriority,
       CAST(sum({_REV}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{WH.Q3_SEGMENT}'
  AND (epoch_ns(o_orderdate) // 1000000000) < {WH.Q3_DATE}
  AND (epoch_ns(l_shipdate) // 1000000000) > {WH.Q3_DATE}
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_c DESC, o_orderkey
LIMIT 10"""

_Q4_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE (epoch_ns(o_orderdate) // 1000000000) >= {WH.Q4_LO} AND (epoch_ns(o_orderdate) // 1000000000) < {WH.Q4_HI}
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority"""

_Q5_SQL = f"""
SELECT n_name, CAST(sum({_REV}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{WH.Q5_REGION}'
  AND (epoch_ns(o_orderdate) // 1000000000) >= {WH.Q5_LO} AND (epoch_ns(o_orderdate) // 1000000000) < {WH.Q5_HI}
GROUP BY n_name"""

_Q10_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, CAST(sum({_REV}) AS BIGINT) AS revenue_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND (epoch_ns(o_orderdate) // 1000000000) >= {WH.Q10_LO}
    AND (epoch_ns(o_orderdate) // 1000000000) < {WH.Q10_HI}
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, c_nationkey, revenue_c
FROM per_cust JOIN customer ON o_custkey = c_custkey
ORDER BY revenue_c DESC, c_custkey
LIMIT 20"""


_ROLLUP_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS grp_level,
       count(*) AS n_items,
       CAST(sum({_REV}) AS BIGINT) AS sum_disc_price_c
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


_INTEGRITY_SQL = """
WITH o AS (SELECT DISTINCT o_orderkey FROM orders),
l AS (SELECT DISTINCT l_orderkey FROM lineitem),
j AS (SELECT * FROM o FULL OUTER JOIN l ON o_orderkey = l_orderkey)
SELECT count(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL THEN 1 END)
         AS n_matched,
       count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_order_only,
       count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_item_only
FROM j"""


_Q6_SQL = f"""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_c,
       count(*) AS n_items
FROM lineitem
WHERE (epoch_ns(l_shipdate) // 1000000000) >= {WH.Q6_LO}
  AND (epoch_ns(l_shipdate) // 1000000000) < {WH.Q6_HI}
  AND CAST(round(l_discount * 10000) AS BIGINT) BETWEEN 500 AND 700
  AND l_quantity < 24.0"""

_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_custkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT n_orders, count(*) AS n_customers FROM per_cust GROUP BY n_orders"""


_Q14_SQL = f"""
WITH j AS (
  SELECT p.p_type, {_REV} AS rev_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE (epoch_ns(l.l_shipdate) // 1000000000) >= {WH.Q14_LO}
    AND (epoch_ns(l.l_shipdate) // 1000000000) < {WH.Q14_HI}
),
g AS (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT)
           AS promo_revenue_c,
         CAST(sum(rev_c) AS BIGINT) AS total_revenue_c
  FROM j
)
SELECT promo_revenue_c, total_revenue_c,
       CAST((promo_revenue_c * 1000000) // total_revenue_c AS BIGINT)
         AS promo_share_ppm
FROM g"""


def warehouse_oracle_sql() -> dict[str, str]:
    return {
        "wh_q1_pricing_summary": _Q1_SQL,
        "wh_q3_shipping_priority": _Q3_SQL,
        "wh_q4_order_priority": _Q4_SQL,
        "wh_q5_local_supplier_volume": _Q5_SQL,
        "wh_q10_returned_items": _Q10_SQL,
        "wh_sales_rollup": _ROLLUP_SQL,
        "wh_integrity_audit": _INTEGRITY_SQL,
        "wh_q6_forecast_revenue": _Q6_SQL,
        "wh_q13_order_distribution": _Q13_SQL,
        "wh_q14_promo_revenue": _Q14_SQL,
    }
