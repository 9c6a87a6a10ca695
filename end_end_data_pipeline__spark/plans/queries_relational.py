"""Relational query catalog: scans, filters, joins, aggregates, sorts,
set ops (SURVEY.md §2.1-2.4, §2.6-2.7) phrased on the driver star.

Structural mapping to the reference's banking star (FIXTURES.md §A):
customer ≈ ``customers``, orders ≈ ``accounts``, lineitem ≈
``transactions``, region/nation ≈ broadcast dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.functions.scalar import dec_avg, dec_sum
from end_end_data_pipeline__spark.operators import relational as R
from end_end_data_pipeline__spark.plans.catalog import register
from end_end_data_pipeline__spark.plans.sqlgen import davg, dsum
from end_end_data_pipeline__spark.sources import lake


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [lake.load_table(spark, n, sf_dir) for n in names]


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7 step 2): scan → filter → 3-way join → monthly agg
# ---------------------------------------------------------------------------


@register(
    "flagship_monthly_segment_volume",
    oracle=f"""
        SELECT date_trunc('month', o_orderdate) AS order_month,
               c_mktsegment,
               {dsum("l_extendedprice * (1 - l_discount)", "revenue")},
               COUNT(DISTINCT o_orderkey) AS n_orders,
               {dsum("l_quantity", "sum_qty")}
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1, 2
    """,
    survey_ids=("S10", "P5", "J2", "J5", "A2", "A4", "A6"),
    bench=True,
)
def flagship_monthly_segment_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly finished-order volume by market segment — the banking mart
    "monthly completed transaction volume by account type" (SURVEY.md §7.2).

    Plan shape at scale: lineitem (large) ⋈ orders (large) is a shuffle
    join on the key both sides already group on; customer joins in as a
    broadcast; the aggregation is partial+final hash agg."""
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    return (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            "c_mktsegment",
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            dec_sum("l_quantity", "sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Filters / pushdown (P5, P6)
# ---------------------------------------------------------------------------


@register(
    "filter_time_range_flagged",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1998-06-01'
    """,
    survey_ids=("P5", "P6"),
)
def filter_time_range_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + time-range scan slice.  Both predicates and the
    4-column projection reach the parquet reader (PushedFilters /
    ReadSchema) — the lake-side analog of the reference's
    (account_id, created_at) index scan (reference ``SCHEMA.sql:31``)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-06-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


# ---------------------------------------------------------------------------
# Joins (J1-J6)
# ---------------------------------------------------------------------------


@register(
    "join_geo_rollup",
    oracle=f"""
        SELECT r_name, n_name,
               COUNT(*) AS n_orders,
               {dsum("o_totalprice", "total_value")}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    survey_ids=("J1", "J5", "A2", "A3"),
    bench=True,
)
def join_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value by geography — the J5 hierarchy with every dimension
    broadcast (region/nation/customer ≪ orders at scale)."""
    orders, customer, nation, region = _t(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    return (
        R.dim_join(orders, customer, orders.o_custkey == customer.c_custkey)
        .transform(lambda df: R.dim_join(df, nation, df.c_nationkey == nation.n_nationkey))
        .transform(lambda df: R.dim_join(df, region, df.n_regionkey == region.r_regionkey))
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice", "total_value"))
    )


@register(
    "join_order_lineitem_detail",
    oracle=f"""
        SELECT o_orderkey,
               COUNT(l_orderkey) AS n_items,
               {dsum("l_extendedprice", "gross_value")},
               CAST(COALESCE(MAX(l_quantity), 0.0) AS DOUBLE) AS max_qty
        FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey
    """,
    survey_ids=("J2", "J4"),
    bench=True,
)
def join_order_lineitem_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large⋈large outer join + per-order roll-up (accounts ⋈ transactions).
    Shuffle join on o_orderkey/l_orderkey; the downstream groupBy reuses
    the same hash partitioning, so AQE plans exactly one shuffle of each
    input."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    joined = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")
    return joined.groupBy("o_orderkey").agg(
        F.count("l_orderkey").alias("n_items"),
        dec_sum("l_extendedprice", "gross_value"),
        F.coalesce(F.max("l_quantity"), F.lit(0.0)).alias("max_qty"),
    )


@register(
    "semi_customers_with_open_orders",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    survey_ids=("J6",),
)
def semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers holding at least one open order.  Semi joins
    move only join keys through the shuffle — no payload duplication."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return R.having_children(
        customer, open_orders, customer.c_custkey == open_orders.o_custkey
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    survey_ids=("J6",),
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders — the FK/CASCADE audit pattern
    (reference ``SCHEMA.sql:13,23``)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return R.fk_orphans(
        customer, orders, customer.c_custkey == orders.o_custkey
    ).select("c_custkey", "c_name")


@register(
    "selfjoin_same_day_order_pairs",
    oracle="""
        SELECT a.o_custkey AS custkey,
               a.o_orderkey AS first_order, b.o_orderkey AS second_order,
               strftime(a.o_orderdate, '%Y-%m-%d') AS order_date
        FROM orders a JOIN orders b
          ON a.o_custkey = b.o_custkey
         AND CAST(a.o_orderdate AS DATE) = CAST(b.o_orderdate AS DATE)
         AND a.o_orderkey < b.o_orderkey
    """,
    survey_ids=("J3",),
)
def selfjoin_same_day_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: pairs of same-customer orders placed the same day — the
    transfer-counterparty pattern (reference ``SCHEMA.sql:26``,
    ``generator.py:296-304``).  Equi keys (custkey, date) keep it a hash
    join; the < predicate halves the pair space post-join."""
    (orders,) = _t(spark, sf_dir, "orders")
    a = orders.alias("a")
    b = orders.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.to_date("a.o_orderdate") == F.to_date("b.o_orderdate"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("first_order"),
        F.col("b.o_orderkey").alias("second_order"),
        F.date_format("a.o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@register(
    "range_join_price_band",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_in_band
        FROM lineitem JOIN part ON l_partkey = p_partkey
         AND l_extendedprice >= p_retailprice * 0.9
         AND l_extendedprice <  p_retailprice * 1.1
        GROUP BY p_brand
    """,
    survey_ids=("J7",),
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + range-predicate join: lineitems priced within ±10% of
    their part's retail price.  The partkey equi-key keeps Catalyst on a
    broadcast/hash join with the band as an in-join filter — never a
    cartesian product (SURVEY.md §2.3 theta note)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    band = part.select(
        "p_partkey",
        "p_brand",
        (F.col("p_retailprice") * 0.9).alias("lo"),
        (F.col("p_retailprice") * 1.1).alias("hi"),
    )
    return (
        R.range_join(
            lineitem, F.broadcast(band), "l_partkey", "p_partkey", "l_extendedprice", "lo", "hi"
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_in_band"))
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A8)
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum("l_quantity", "sum_qty")},
               {dsum("l_extendedprice", "sum_base_price")},
               {dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
               {dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
               {davg("l_quantity", "avg_qty")},
               {davg("l_extendedprice", "avg_price")},
               {davg("l_discount", "avg_disc")},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    survey_ids=("A1", "A2", "A3", "P5"),
    bench=True,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2-key hash agg with 8 aggregates.
    Partial (map-side) aggregation collapses 600k rows to ~6 groups per
    task before the shuffle — the pattern that makes this O(groups) in
    shuffle volume at 100 TB."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            dec_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "rollup_status_priority",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {dsum("o_totalprice", "total_value")}
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    survey_ids=("A7",),
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (status, priority) → (status) → () — the
    dbt-mart subtotal pattern (reference ``README.md:62``, declared
    analytics layer)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dec_sum("o_totalprice", "total_value")
    )


@register(
    "cube_returnflag_linestatus",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items, {dsum("l_quantity", "sum_qty")}
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey_ids=("A7",),
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-tab subtotals over two low-cardinality keys."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), dec_sum("l_quantity", "sum_qty")
    )


@register(
    "count_distinct_parts_per_supplier",
    oracle="""
        SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_items
        FROM lineitem GROUP BY l_suppkey
    """,
    survey_ids=("A4",),
)
def count_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group (the unique-email invariant surface,
    reference ``SCHEMA.sql:6``).  At 100 TB swap for
    ``approx_count_distinct`` (see ``approx_distinct_parts`` — HLL,
    no distinct-expand shuffle)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_items"),
    )


@register(
    "conditional_status_share",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS finished_share,
               CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_large
        FROM orders GROUP BY o_orderpriority
    """,
    survey_ids=("A5",),
)
def conditional_status_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — the generator's 85/8/4/3 status and
    business-hours share checks (reference ``generator.py:49-54,135-139``)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("finished_share"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_large"),
    )


@register(
    "daily_event_volume",
    oracle=f"""
        SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
               COUNT(*) AS n_events, {dsum("value", "total_value")}
        FROM events GROUP BY 1, 2
    """,
    survey_ids=("A6",),
)
def daily_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation — the daily-partition roll-up unit of the
    reference lake layout (reference ``consumer/consumer.py:45,48``)."""
    (events,) = _t(spark, sf_dir, "events")
    return events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "event_type"
    ).agg(F.count("*").alias("n_events"), dec_sum("value", "total_value"))


@register(
    "percentile_order_value",
    oracle="""
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90,
               quantile_cont(o_totalprice, 0.99) AS p99,
               CAST(MIN(o_totalprice) AS DOUBLE) AS min_value,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_value
        FROM orders GROUP BY o_orderpriority
    """,
    survey_ids=("A8",),
)
def percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group.  Exact `percentile` is
    fine to ~10^9 rows/group; the 100 TB path is
    ``approx_percentile`` (KLL-style sketch, one pass, mergeable)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.percentile("o_totalprice", 0.99).alias("p99"),
        F.min("o_totalprice").alias("min_value"),
        F.max("o_totalprice").alias("max_value"),
    )


@register(
    "histogram_order_value",
    oracle=f"""
        SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
               COUNT(*) AS n, {dsum("o_totalprice", "bucket_value")}
        FROM orders GROUP BY 1
    """,
    survey_ids=("A8",),
)
def histogram_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-bucketing (width_bucket pattern)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
    ).agg(F.count("*").alias("n"), dec_sum("o_totalprice", "bucket_value"))


# ---------------------------------------------------------------------------
# Sorts / top-k (O1-O3)
# ---------------------------------------------------------------------------


@register(
    "topk_expensive_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    survey_ids=("O2",),
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition k-heaps, no
    full sort).  Secondary key makes the cut deterministic."""
    (orders,) = _t(spark, sf_dir, "orders")
    return R.top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


@register(
    "topk_orders_per_segment",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rn <= 5
    """,
    survey_ids=("O3", "W2"),
)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (largest orders per market segment)."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    joined = R.dim_join(orders, customer, orders.o_custkey == customer.c_custkey)
    return R.top_k_per_group(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        5,
    )


# ---------------------------------------------------------------------------
# Set operations (U1-U4)
# ---------------------------------------------------------------------------


@register(
    "setop_priority_slices_union",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE o_orderpriority = '5-LOW'
    """,
    survey_ids=("U1",),
)
def setop_priority_slices_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-by-name of two filtered slices (daily-partition stitching, U1)."""
    (orders,) = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(cols)
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(cols)
    return R.union_by_name([urgent, low])


@register(
    "setop_except_customers",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    survey_ids=("U2",),
)
def setop_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with finished orders but no open ones (CDC replay-diff
    pattern, U2)."""
    (orders,) = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.distinct().exceptAll(o.distinct())


@register(
    "setop_intersect_customers",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    survey_ids=("U3",),
)
def setop_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers present in both status slices (audit overlap, U3)."""
    (orders,) = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@register(
    "dedup_replayed_events",
    oracle="SELECT * FROM events",
    survey_ids=("U4", "J8"),
)
def dedup_replayed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after at-least-once replay: the stream is unioned with
    itself (duplicate delivery, reference ``consumer/consumer.py:21``)
    then collapsed latest-wins per event_id — recovering exactly the
    original table."""
    (events,) = _t(spark, sf_dir, "events")
    replayed = R.union_by_name([events, events])
    return R.latest_per_key(
        replayed, ["event_id"], [F.col("ts"), F.col("event_id")]
    )


@register(
    "pivot_status_by_segment",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    survey_ids=("A3", "A5", "F11"),
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): order-status counts as columns per
    market segment — ``groupBy().pivot()`` with explicit pivot values
    (explicit values skip the extra distinct-scan Spark needs to
    discover them; at 100 TB that scan is a full pass, so always pin
    the domain)."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "c_mktsegment",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
        )
    )


@register(
    "unpivot_priority_metrics",
    oracle="""
        WITH agg AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS DOUBLE) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
                     AS total_value,
                   CAST(MAX(o_totalprice) AS DOUBLE) AS max_value
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM agg
        UNION ALL
        SELECT o_orderpriority, 'total_value', total_value FROM agg
        UNION ALL
        SELECT o_orderpriority, 'max_value', max_value FROM agg
    """,
    survey_ids=("U1", "A5", "F11"),
)
def unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — pivot's inverse, the wide→long reshape
    (``DataFrame.unpivot``): per-priority order metrics melted to
    (priority, metric, value) rows.  Plans as a Generate over the
    metric array — no shuffle beyond the upstream agg; the oracle is
    the equivalent UNION ALL, engine-neutral."""
    orders = _t(spark, sf_dir, "orders")[0]
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        dec_sum("o_totalprice", "total_value"),
        F.max("o_totalprice").cast("double").alias("max_value"),
    )
    return agg.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_value", "max_value"],
        "metric",
        "value",
    )


@register(
    "grouping_sets_priority_status",
    oracle="""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
    """,
    survey_ids=("A7",),
)
def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube compile to)
    with GROUPING() markers disambiguating real NULLs from subtotal
    rows — shared SQL text on both engines."""
    lake.load_star(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
    """)


@register(
    "window_percentile_standing",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               ntile(4) OVER w AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    survey_ids=("W5",),
)
def window_percentile_standing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing within segment: percent_rank / cume_dist /
    quartile over account balance (W5 — customer-value banding)."""
    customer = _t(spark, sf_dir, "customer")[0]
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey", "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "lateral_top2_orders_per_customer",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
    """,
    survey_ids=("J1", "O3", "W2"),
)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL surface for per-row
    derived tables (each customer's two most expensive orders here).
    Catalyst DECORRELATES the lateral into a ranked window over one
    equi-join, so despite the per-row phrasing the physical plan is
    the same shuffle-once top-k-per-group as the DataFrame variant
    (``topk_orders_per_segment``) — no nested-loop re-execution per
    outer row.  Ties are totally ordered; the oracle is the identical
    LATERAL in DuckDB."""
    lake.load_table(spark, "customer", sf_dir).createOrReplaceTempView(
        "lat_customer"
    )
    lake.load_table(spark, "orders", sf_dir).createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM lat_customer c,
        LATERAL (
            SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
            FROM lat_orders WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
        """
    )


@register(
    "setop_except_all_multiset",
    oracle="""
        SELECT l_orderkey, l_returnflag FROM (
            SELECT l_orderkey, l_returnflag FROM lineitem
            WHERE l_orderkey <= 500
            EXCEPT ALL
            SELECT l_orderkey, l_returnflag FROM lineitem
            WHERE l_orderkey <= 500 AND l_linenumber = 1
        )
    """,
    survey_ids=("U2", "U1"),
)
def setop_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — BAG semantics (each right occurrence cancels ONE
    left occurrence, duplicates survive), the multiset complement of
    the existing distinct EXCEPT query: lineitem rows minus one copy
    per (order, flag) that has a first line.  Spark plans this as an
    aggregate on counts, not a distinct — no silent dedup."""
    li = lake.load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_orderkey") <= 500
    )
    left = li.select("l_orderkey", "l_returnflag")
    right = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_returnflag"
    )
    return left.exceptAll(right)


@register(
    "join_null_safe_equality",
    oracle="""
        WITH keyed AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_orderkey % 50 END AS grp
            FROM orders WHERE o_orderkey <= 700
        )
        SELECT a.grp, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM keyed a JOIN keyed b
          ON a.grp IS NOT DISTINCT FROM b.grp
        GROUP BY a.grp
    """,
    survey_ids=("J1", "F11"),
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match EACH OTHER instead of vanishing — the semantics a dedup or
    reconciliation join over nullable business keys needs.  Still a
    hash-partitionable equi-join (NULLs hash to one key — a hot NULL
    group is the documented skew caveat; salt it like any hot key)."""
    orders = lake.load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") <= 700
    )
    keyed = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 50)
        .alias("grp"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, F.col("a.grp").eqNullSafe(F.col("b.grp")))
        .groupBy(F.col("a.grp").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (round 6)
# ---------------------------------------------------------------------------


@register(
    "skyline_part_price_size",
    oracle="""
        WITH pts AS (SELECT DISTINCT p_size, p_retailprice FROM part),
        sky AS (
            SELECT a.p_size, a.p_retailprice FROM pts a
            WHERE NOT EXISTS (
                SELECT 1 FROM pts b
                WHERE b.p_size >= a.p_size
                  AND b.p_retailprice <= a.p_retailprice
                  AND (b.p_size > a.p_size
                       OR b.p_retailprice < a.p_retailprice)))
        SELECT p_size, CAST(p_retailprice AS DOUBLE) AS p_retailprice
        FROM sky
    """,
    survey_ids=("O2", "W2", "P5"),
)
def skyline_part_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over parts — "the largest size at the lowest
    price": the distinct (p_size, p_retailprice) points no other part
    beats on both dimensions.  The operator
    (``operators/relational.skyline_2d``) runs the sort-scan skyline
    TWICE — once within each partition (prunes all but ~|skyline|
    points per partition, fully parallel), once over the tiny survivor
    union — so no global sort of the input ever happens.  The oracle
    states dominance directly as NOT EXISTS; values pass through
    unchanged (no arithmetic), so parity is exact on doubles."""
    part = lake.load_table(spark, "part", sf_dir)
    return R.skyline_2d(part, "p_size", "p_retailprice", minimize_y=True)
