"""TPC-H-style complex analytics on the fixture star (SURVEY.md §2:
the D-class mart workload, exercised end-to-end).

These are the classic decision-support shapes a user of the reference's
declared dbt layer would run, adapted to the fixture's columns (no
partsupp table, so Q2/Q9/Q11/Q16/Q20 substitute lineitem-derived
supplier-part offers / ``p_retailprice``-derived supply cost for the
partsupp columns while keeping every join and subquery shape — all 22
classic shapes are now present; lineitem carries shipdate only, so
Q12/Q21 express lateness as shipdate vs orderdate and Q12 groups by
linestatus in place of the absent shipmode).  Q1 lives in
the catalog as ``agg_pricing_summary``.  Every query is ONE
ANSI SQL text executed verbatim by BOTH engines — Spark via
``spark.sql`` over temp views (the engine's SQL API surface), DuckDB as
the oracle — so parity is definitionally about the engine, not the
query text.  Money aggregates accumulate as DECIMAL(25,6) and cast back
to double, keeping distributed summation bit-identical to the
sequential oracle.

What Catalyst proves here: EXISTS/NOT-EXISTS → semi/anti joins,
correlated scalar subqueries → decorrelated aggregate joins (Q17-, Q22-
style), IN-subqueries with HAVING, multi-level aggregation (Q13-style),
OR-of-ranges predicate pushdown (Q19-style) — all with broadcast dims
and partial aggregation, no custom code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from end_end_data_pipeline__spark.plans.catalog import register
from end_end_data_pipeline__spark.sources import lake


def _register_sql(
    name: str, sql: str, survey_ids: tuple[str, ...], bench: bool = False
) -> None:
    @register(name, oracle=sql, survey_ids=survey_ids, bench=bench)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        lake.load_star(spark, sf_dir)
        return spark.sql(_sql)

    run.__doc__ = f"Shared-text SQL (Spark == oracle):\n{sql}"


# the ONE oracle-parity decimal-sum fragment lives in sqlgen — a
# character-identical private copy here meant a precision fix to the
# shared fragment would silently miss the TPC-H queries (r07 review)
from end_end_data_pipeline__spark.plans.sqlgen import dsum as _dsum  # noqa: E402


_REVENUE = "l_extendedprice * (1 - l_discount)"


_register_sql(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {_dsum(_REVENUE, "revenue")},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-06-15'
      AND l_shipdate > DATE '1998-06-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    ("J5", "A2", "O2", "P5"),
    bench=True,
)

_register_sql(
    "tpch_q2_min_cost_supplier",
    """
    WITH offers AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(l_extendedprice / l_quantity) AS cost
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost
    FROM part
    JOIN offers ON p_partkey = partkey
    JOIN supplier ON s_suppkey = suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND cost = (
          SELECT MIN(o2.cost)
          FROM offers o2
          JOIN supplier s2 ON s2.s_suppkey = o2.suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE o2.partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    ("J5", "J6", "A2", "O2"),
)

_register_sql(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    ("J6", "A1", "P6"),
)

_register_sql(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n_name, {_dsum(_REVENUE, "revenue")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    ("J1", "J2", "J5", "A2"),
)

_register_sql(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    ("P5", "A2", "P6"),
)

_register_sql(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {_dsum("volume", "revenue")}
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year, {_REVENUE} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    ("J3", "J5", "A3", "F6"),
)

_register_sql(
    "tpch_q8_national_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CAST(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END
                         AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
           / CAST(CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               {_REVENUE} AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'PROMO'
          AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    ("J5", "A5", "F6"),
)

_register_sql(
    "tpch_q9_product_type_profit",
    """
    SELECT nation, o_year,
           CAST(CAST(SUM(CAST(amount AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'PROMO'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    ("J5", "A3", "A5", "F6"),
    bench=True,
)

_register_sql(
    "tpch_q20_potential_part_promotion",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'
          )
            AND l_shipdate >= DATE '1997-01-01'
            AND l_shipdate < DATE '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 30
      )
    ORDER BY s_name
    """,
    ("J6", "A2", "P6"),
)

_register_sql(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, {_dsum(_REVENUE, "revenue")}, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    ("J5", "A2", "O2", "P5"),
)

_register_sql(
    "tpch_q11_important_stock",
    """
    SELECT l_partkey AS partkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) > (
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
               * 0.001
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
    )
    ORDER BY value DESC, partkey
    """,
    ("A2", "A3", "J5"),
)

_register_sql(
    "tpch_q12_late_shipment_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    ("J2", "A5", "P6"),
)

_register_sql(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    ("J4", "A1", "A3"),
)

_register_sql(
    "tpch_q14_promo_revenue",
    f"""
    SELECT 100.00 * (CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                          THEN {_REVENUE} ELSE 0 END AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
                     / CAST(CAST(SUM(CAST({_REVENUE} AS DECIMAL(25,6))) AS STRING) AS DOUBLE))
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-03-01'
      AND l_shipdate < DATE '1997-04-01'
    """,
    ("J2", "A5", "F11"),
)

_register_sql(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {_dsum(_REVENUE, "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    ("J1", "A2", "O2"),
)

_register_sql(
    "tpch_q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 15, 23, 25, 36, 39, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    ("A4", "J6", "P5"),
)

_register_sql(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
    ("J2", "A2", "A8"),
)

_register_sql(
    "tpch_q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    ("J6", "A2", "O2"),
    bench=True,
)

_register_sql(
    "tpch_q19_discounted_revenue",
    f"""
    SELECT {_dsum(_REVENUE, "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    ("P5", "A2", "F11"),
)

_register_sql(
    "tpch_q21_waiting_supplier",
    """
    WITH l AS (
        SELECT l_orderkey, l_suppkey,
               CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
                 AS n_late_supp
        FROM l GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l
    JOIN per_order ON l.l_orderkey = per_order.l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE late = 1 AND n_supp > 1 AND n_late_supp = 1
      AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    ("J6", "J3", "A3"),
)

_register_sql(
    "tpch_q22_global_sales_opportunity",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS totacctbal
    FROM (
        SELECT substring(c_name, 10, 1) AS cntrycode, c_acctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    ("J6", "A2", "F2"),
)
