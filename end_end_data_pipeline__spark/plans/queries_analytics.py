"""Behavioral / operational analytics catalog: cohort retention,
funnel conversion, RFM segmentation, column profiling, trailing
z-score anomaly flags, DAU/WAU stickiness, Markov event transitions —
plus the round-5 second-wave operator queries that did not fit an
existing module (substring-span dedup, blocked fuzzy matching,
fixed-point k-means, MMR re-ranking, spatial radius joins, triangle
census, hierarchy flattening, BPE learning, BM25 search, forward
as-of, manifest-table DML, column masking, table checksums).

The analytics marts are what the reference's declared-but-absent dbt
layer implies (reference ``README.md:62`` lists ``banking_dbt/``
which was never built — SURVEY.md §0): per-entity activity retention,
funnel progression over the event stream, and customer value
segmentation over the order history served by the
``(account_id, created_at)`` index (reference ``SCHEMA.sql:31``).

Cross-engine determinism (see tests/oracle.py):
- week bucketing uses ``date_trunc('week', ...)`` — ISO Monday start
  in BOTH Spark and DuckDB; week offsets are exact multiples of 7
  days so integer division is exact;
- every running / trailing aggregate accumulates in DECIMAL (order
  independent), is cast to DOUBLE once, and any follow-on arithmetic
  is the same double expression tree on both sides — bit-identical;
- ntile ordering is made total with the entity key as the final
  tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.functions.scalar import dec_sum, exact_mean_std
from end_end_data_pipeline__spark.plans.catalog import register
from end_end_data_pipeline__spark.sources import lake

# RFM anchor: the day after the last order date in the fixture's
# TPC-H-ish order history (1995-01-01 .. 2001-08-01).  A constant
# anchor keeps recency deterministic AND avoids a global max() agg
# (a scalar subquery / 1-row broadcast at scale, pointless here).
_RFM_ANCHOR = "2001-09-01"


@register(
    "cohort_weekly_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id,
                   f.cohort_wk,
                   date_trunc('week', e.ts) AS active_wk
            FROM events e JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', cohort_wk, active_wk) / 7 AS INT)
                   AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM activity
        GROUP BY 1, 2
    """,
    survey_ids=("A3", "A6", "J1"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the event stream: users bucketed
    by the ISO week of their first event; one row per (cohort week,
    week offset) counting users still active.

    Plan: min-agg per user (map-side combinable), self-join back on
    user_id (AQE broadcasts the per-user frame when small), distinct
    on (user, cohort, week), final hash agg.  Every shuffle is on
    user_id or the tiny (cohort, offset) key — survives 100 TB of
    events because per-user state is two timestamps.
    """
    events = lake.load_table(spark, "events", sf_dir)
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_wk",
            F.date_trunc("week", F.col("ts")).alias("active_wk"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("active_wk", "cohort_wk") / 7).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "funnel_view_click_purchase",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT * FROM (
            SELECT 1 AS stage_ord, 'any_event' AS stage,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events
            UNION ALL
            SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM v
            UNION ALL
            SELECT 3, 'click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
            UNION ALL
            SELECT 4, 'purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
        )
    """,
    survey_ids=("A1", "A5", "J2", "U1"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first view, then first click strictly after it,
    then first purchase strictly after that click; one row per stage
    with the surviving user count.

    Plan: three filtered min-aggs chained by equi-joins on user_id —
    each stage's frame only shrinks, so the joins get cheaper as the
    funnel deepens; AQE broadcasts the shrinking side.  No window over
    a global ordering, no crossJoin (the stage counts union, they are
    never joined to each other).
    """
    events = lake.load_table(spark, "events", sf_dir)
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(ord_: int, name: str, df: DataFrame, cnt) -> DataFrame:
        return df.agg(
            F.lit(ord_).alias("stage_ord"),
            F.lit(name).alias("stage"),
            cnt.alias("n_users"),
        )

    return (
        stage(1, "any_event", events, F.count_distinct("user_id"))
        .unionByName(stage(2, "view", v, F.count(F.lit(1))))
        .unionByName(stage(3, "click_after_view", c, F.count(F.lit(1))))
        .unionByName(stage(4, "purchase_after_click", p, F.count(F.lit(1))))
    )


@register(
    "rfm_customer_segments",
    oracle=f"""
        WITH rfm AS (
            SELECT c.c_custkey, c.c_mktsegment,
                   CAST(date_diff('day', MAX(o.o_orderdate),
                        TIMESTAMP '{_RFM_ANCHOR} 00:00:00') AS INT)
                       AS recency_days,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS monetary
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        )
        SELECT c_custkey, c_mktsegment, recency_days, frequency, monetary,
               ntile(4) OVER (PARTITION BY c_mktsegment
                   ORDER BY recency_days ASC, c_custkey) AS r_quartile,
               ntile(4) OVER (PARTITION BY c_mktsegment
                   ORDER BY frequency DESC, c_custkey) AS f_quartile,
               ntile(4) OVER (PARTITION BY c_mktsegment
                   ORDER BY monetary DESC, c_custkey) AS m_quartile
        FROM rfm
    """,
    survey_ids=("A2", "A3", "W5", "J1"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation per customer,
    quartiled WITHIN market segment.

    Recency anchors on a constant census date (the day after the
    fixture's last order) — no global-max scalar stage.  The ntile
    windows partition by c_mktsegment so no single task ranks the
    whole customer dimension; the per-customer frame the windows rank
    is already 3 aggregates wide, orders of magnitude smaller than
    the fact table.  Ties broken by c_custkey → total order → exact
    oracle parity.
    """
    customer = lake.load_table(spark, "customer", sf_dir)
    orders = lake.load_table(spark, "orders", sf_dir)
    rfm = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.datediff(
                F.lit(_RFM_ANCHOR).cast("timestamp"), F.max("o_orderdate")
            )
            .cast("int")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            dec_sum("o_totalprice", "monetary"),
        )
    )
    seg = Window.partitionBy("c_mktsegment")
    return rfm.select(
        "c_custkey",
        "c_mktsegment",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(seg.orderBy(F.asc("recency_days"), F.asc("c_custkey")))
        .alias("r_quartile"),
        F.ntile(4)
        .over(seg.orderBy(F.desc("frequency"), F.asc("c_custkey")))
        .alias("f_quartile"),
        F.ntile(4)
        .over(seg.orderBy(F.desc("monetary"), F.asc("c_custkey")))
        .alias("m_quartile"),
    )


@register(
    "profile_orders_columns",
    oracle="""
        SELECT 'o_orderkey' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(MIN(o_custkey) AS VARCHAR),
               CAST(MAX(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
               CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
               CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
               strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
               strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders
    """,
    survey_ids=("P7", "A4", "U1"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the orders table: per column —
    row count, null count, exact distinct count, min/max rendered as
    strings (doubles via DECIMAL(18,2) so both engines print the same
    trailing zeros; timestamps via an explicit format).

    Plan: ONE scan — a single wide agg computes all 6×4 statistics
    (count_distinct expands to one expand-node pass, still one scan),
    then a driver-side stack pivots the single row into the 6-row
    profile.  The oracle re-scans per column; the engine does not.
    """
    orders = lake.load_table(spark, "orders", sf_dir)

    def fmt(col: str, typ: str):
        c = F.col(col)
        if typ == "double":
            money = c.cast("decimal(18,2)")
            return F.min(money).cast("string"), F.max(money).cast("string")
        if typ == "ts":
            return (
                F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss"),
                F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss"),
            )
        return F.min(c).cast("string"), F.max(c).cast("string")

    cols = [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "double"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, typ in cols:
        lo, hi = fmt(name, typ)
        aggs += [
            (F.count(F.lit(1)) - F.count(name)).alias(f"{name}__null"),
            F.count_distinct(F.col(name)).alias(f"{name}__distinct"),
            lo.alias(f"{name}__min"),
            hi.alias(f"{name}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__null, {name}__distinct, {name}__min, {name}__max"
        for name, _ in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value")


@register(
    "timeseries_zscore_anomalies",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
                       AS total
            FROM events GROUP BY 1, 2
        ),
        trail AS (
            SELECT event_type, day, total,
                   CAST(SUM(CAST(total AS DECIMAL(25,6))) OVER w AS DOUBLE)
                       AS s,
                   CAST(SUM(CAST(total * total AS DECIMAL(25,6))) OVER w
                        AS DOUBLE) AS s2,
                   CAST(COUNT(total) OVER w AS BIGINT) AS n
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, day, total,
               CASE WHEN n = 7 THEN
                   (CAST(n AS DOUBLE) * total - s)
                       * (CAST(n AS DOUBLE) * total - s)
                   > 4.0 * (CAST(n AS DOUBLE) * s2 - s * s)
               END AS is_anomaly
        FROM trail
    """,
    survey_ids=("A6", "W4", "W1"),
)
def timeseries_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly flag on the daily event-value series:
    a day is anomalous when its total deviates from the previous
    7 days' mean by more than 2 trailing standard deviations.

    Numerics: the flag is equivalent to (x-mean)^2 > 4*var but is
    evaluated divide-free and sqrt-free —
    ``(n*x - s)^2 > 4*(n*s2 - s^2)``
    (multiply through by n^2: var = (n*s2 - s^2)/n^2) — where s and
    s2 accumulate as exact
    DECIMALs inside the window (order-independent across engines)
    and the final comparison is the same double expression tree on
    both sides, hence bit-identical.

    Plan: one hash agg to days (map-side combinable), then a window
    per event_type over ~days rows — the windowed frame is the
    DOWNSAMPLED series, thousands of rows per years of data, so the
    per-partition sort is trivial at any source scale.
    """
    events = lake.load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    ).agg(dec_sum("value", "total"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    trail = daily.select(
        "event_type",
        "day",
        "total",
        F.sum(F.col("total").cast("decimal(25,6)")).over(w).cast("double").alias("s"),
        F.sum((F.col("total") * F.col("total")).cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("s2"),
        F.count("total").over(w).alias("n"),
    )
    nd = F.col("n").cast("double")
    dev = nd * F.col("total") - F.col("s")
    return trail.select(
        "event_type",
        "day",
        "total",
        F.when(
            F.col("n") == 7,
            dev * dev > F.lit(4.0) * (nd * F.col("s2") - F.col("s") * F.col("s")),
        ).alias("is_anomaly"),
    )


@register(
    "text_duplicate_spans",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t
            FROM documents
        ),
        pos AS (
            SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
            FROM toks WHERE len(t) >= 8
        ),
        sh AS (
            SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS s
            FROM pos
        ),
        mult AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) > 1),
        covered AS (
            SELECT DISTINCT doc_id, p FROM (
                SELECT doc_id, unnest(range(i, i + 8)) AS p
                FROM sh JOIN mult USING (s)
            )
        ),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS n_dup FROM covered GROUP BY doc_id
        )
        SELECT tk.doc_id,
               CAST(len(tk.t) AS INT) AS n_tokens,
               CAST(COALESCE(pd.n_dup, 0) AS BIGINT) AS n_dup_tokens,
               CAST(COALESCE(pd.n_dup, 0) AS DOUBLE) / len(tk.t) AS dup_frac
        FROM toks tk LEFT JOIN per_doc pd ON tk.doc_id = pd.doc_id
    """,
    survey_ids=("UD5", "UD6", "F4", "F12"),
)
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring coverage per document (the shingle-marking
    approximation of suffix-array substring dedup — Lee et al. 2021):
    a token position is duplicated when its 8-token shingle occurs
    more than once corpus-wide; reports per-doc token count,
    duplicated-token count, and the duplicated fraction the
    remove-or-keep curation policy thresholds on.

    See :func:`operators.text.duplicate_span_stats` for the scale
    argument (linear shingling, hash-agg multiplicity, bounded k-row
    span explode — no all-pairs, no suffix array).
    """
    from end_end_data_pipeline__spark.operators.text import duplicate_span_stats

    docs = lake.load_table(spark, "documents", sf_dir)
    stats = duplicate_span_stats(docs, text_col="text", id_col="doc_id", k=8)
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_dup_tokens",
        (F.col("n_dup_tokens").cast("double") / F.col("n_tokens")).alias("dup_frac"),
    )


@register(
    "fuzzy_name_best_match",
    oracle="""
        WITH pairs AS (
            SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
                   levenshtein(a.c_name, b.c_name) AS dist
            FROM customer a JOIN customer b
              ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
             AND a.c_custkey <> b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 2
        ),
        ranked AS (
            SELECT a_id, b_id, dist,
                   row_number() OVER (PARTITION BY a_id
                                      ORDER BY dist, b_id) AS rn,
                   COUNT(*) OVER (PARTITION BY a_id) AS n_candidates
            FROM pairs
        )
        SELECT a_id AS c_custkey, b_id AS best_match_id,
               CAST(dist AS INT) AS best_distance,
               CAST(n_candidates AS BIGINT) AS n_candidates
        FROM ranked WHERE rn = 1
    """,
    survey_ids=("J9", "J3", "W2", "F1"),
)
def fuzzy_name_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the customer dimension: for every
    customer, the nearest OTHER customer name within edit distance 2
    AMONG SAME-BLOCK CANDIDATES, via a blocked levenshtein self-join
    (blocking key = the 16-char name prefix, i.e. the hundreds block)
    — an equi-join plus bounded in-block comparisons, never an
    all-pairs cross join.

    Prefix blocking trades recall for a hard comparison bound (a pair
    differing only in an earlier digit is never compared — the
    standard entity-resolution trade; multi-pass with rotated keys is
    the recall knob), and the oracle blocks identically, so parity
    measures the blocked contract.  Block size is the cost dial:
    hundreds blocks cap in-block work at 100², keeping total
    comparisons linear in the table (measured: 10× data → ~10× time
    at constant block size).

    See :func:`operators.relational.blocked_fuzzy_best_match`.
    """
    from end_end_data_pipeline__spark.operators.relational import (
        blocked_fuzzy_best_match,
    )

    customer = lake.load_table(spark, "customer", sf_dir)
    return blocked_fuzzy_best_match(
        customer,
        id_col="c_custkey",
        text_col="c_name",
        block=F.substring("c_name", 1, 16),
        max_dist=2,
    )


@register(
    "fuzzy_deletion_pairs",
    oracle="""
        SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    survey_ids=("J9", "J3", "UD6", "F2"),
)
def fuzzy_deletion_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT edit-distance-≤1 pair enumeration over customer names via
    the deletion-neighborhood (SymSpell) equi-join — the full-recall
    complement to ``fuzzy_name_best_match``'s blocked contract: no
    blocking key, so a pair differing in ANY single character position
    is found, yet never an all-pairs cross join (the oracle's O(n²)
    form is exactly what the operator avoids).

    Scale shape: one map-side explode (19 variants per 18-char name),
    one equi-join on near-unique variant strings, one ``levenshtein``
    per surviving candidate.  On structured keys like ``Customer#…``
    prefix/blocking schemes degenerate (every row shares the hot
    16-char block) — deletion variants keep the full discriminating
    suffix, so the join key stays uniform.  See
    :func:`operators.dedup.deletion_neighborhood_pairs`.
    """
    from end_end_data_pipeline__spark.operators.dedup import (
        deletion_neighborhood_pairs,
    )

    customer = lake.load_table(spark, "customer", sf_dir)
    return deletion_neighborhood_pairs(
        customer, id_col="c_custkey", text_col="c_name", max_dist=1
    )


@register(
    "embedding_kmeans_clusters",
    oracle="""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS q
            FROM embeddings
        ),
        c0 AS (SELECT vec_id AS cid, q AS c FROM q WHERE vec_id < 4),
        d1 AS (
            SELECT v.vec_id, c.cid,
                   SUM((v.q[i] - c.c[i]) * (v.q[i] - c.c[i])) AS d
            FROM q v CROSS JOIN c0 c, unnest(range(1, 65)) AS t(i)
            GROUP BY 1, 2
        ),
        a1 AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, cid) AS rn
                FROM d1) WHERE rn = 1
        ),
        cm AS (
            SELECT a.cid, t.i,
                   CAST((SUM(v.q[t.i]) + COUNT(*) * 1000000) // COUNT(*)
                        AS BIGINT) - 1000000 AS cval
            FROM a1 a JOIN q v USING (vec_id), unnest(range(1, 65)) AS t(i)
            GROUP BY 1, 2
        ),
        c1 AS (SELECT cid, list(cval ORDER BY i) AS c FROM cm GROUP BY cid),
        d2 AS (
            SELECT v.vec_id, c.cid,
                   SUM((v.q[i] - c.c[i]) * (v.q[i] - c.c[i])) AS d
            FROM q v CROSS JOIN c1 c, unnest(range(1, 65)) AS t(i)
            GROUP BY 1, 2
        ),
        a2 AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, cid) AS rn
                FROM d2) WHERE rn = 1
        )
        SELECT cid AS centroid_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(vec_id) AS BIGINT) AS member_id_sum
        FROM a2 GROUP BY cid
    """,
    survey_ids=("UD7", "F13", "A3"),
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering of the embedding corpus (k=4, two Lloyd
    assignment rounds) in fixed-point arithmetic — the distributed
    training step behind the IVF index (``embedding_ann_ivf_topk``
    consumes exactly such centroids).  Integer quantization makes
    every assignment bit-identical cross-engine, so the oracle can
    unroll the same two rounds in SQL and hash-match the final
    cluster memberships (reported as per-cluster size + member-id
    checksum).  See :func:`operators.similarity.kmeans_fixed_point`
    for the one-scan-per-iteration plan shape.
    """
    from end_end_data_pipeline__spark.operators.similarity import (
        kmeans_fixed_point,
    )

    emb = lake.load_table(spark, "embeddings", sf_dir)
    assigned = kmeans_fixed_point(emb, k=4, iterations=2)
    return assigned.groupBy(F.col("centroid_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("vec_id").alias("member_id_sum"),
    )


@register(
    "graph_triangle_count",
    oracle="""
        WITH raw AS (
            SELECT (o_orderkey % 100) + 1 AS a, (o_custkey % 100) + 1 AS b
            FROM orders WHERE o_orderkey % 11 = 0
        ),
        e AS (
            SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
            FROM raw WHERE a <> b
        ),
        tri AS (
            SELECT e1.u, e1.v, e2.v AS w
            FROM e e1 JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT 'n_edges' AS metric,
               CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS value
        UNION ALL
        SELECT 'n_nodes', CAST((SELECT COUNT(*) FROM
            (SELECT u FROM e UNION SELECT v FROM e)) AS BIGINT)
        UNION ALL
        SELECT 'n_triangles', CAST((SELECT COUNT(*) FROM tri) AS BIGINT)
    """,
    survey_ids=("J3", "A1"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of a densified transfer network (every 11th
    order links order-ring and customer-ring accounts on a 100-node
    universe): rings of accounts paying each other close triangles —
    the collusion signal components/pagerank cannot see.  Canonical
    id-orientation counts each triangle once; see
    :func:`operators.graph.triangle_count` for the degree-orientation
    scale knob."""
    from end_end_data_pipeline__spark.operators.graph import triangle_count

    orders = lake.load_table(spark, "orders", sf_dir)
    edges = orders.filter(F.col("o_orderkey") % 11 == 0).select(
        (F.col("o_orderkey") % 100 + 1).alias("src"),
        (F.col("o_custkey") % 100 + 1).alias("dst"),
    )
    return triangle_count(edges)


@register(
    "text_bm25_search",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   lower(unnest(string_split(trim(text), ' '))) AS term
            FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        s AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tok WHERE term IN ('spark', 'join', 'window')
            GROUP BY 1, 2
        ),
        dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        partials AS (
            SELECT t.doc_id,
                   CAST(floor(
                       (((s.n - CAST(d.df AS DOUBLE)) + CAST(0.5 AS DOUBLE))
                        / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                       * ((CAST(t.tf AS DOUBLE)
                           * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                          / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                             * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
                                + CAST(0.75 AS DOUBLE)
                                  * (CAST(l.dl AS DOUBLE) / s.avgdl))))
                       * CAST(1e9 AS DOUBLE)) AS BIGINT) AS q
            FROM tf t JOIN dfq d USING (term) JOIN dl l USING (doc_id), s
        ),
        scored AS (
            SELECT doc_id, SUM(q) AS score_q FROM partials GROUP BY doc_id
        ),
        top AS (
            SELECT doc_id, score_q,
                   row_number() OVER (ORDER BY score_q DESC, doc_id)
                       AS rank
            FROM scored
        )
        SELECT CAST(rank AS INT) AS rank, doc_id,
               CAST(score_q AS DOUBLE) / CAST(1e9 AS DOUBLE) AS score
        FROM top WHERE rank <= 10
    """,
    survey_ids=("UD5", "W2", "O2", "F4"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text search over the corpus: BM25 top-10 documents for the
    query {spark, join, window} with the log-free rational idf and
    floor-quantized integer score accumulation that make the ranking
    bit-identical cross-engine (see :func:`operators.text.bm25_topk`
    — TakeOrderedAndProject top-k, never a global sort)."""
    from end_end_data_pipeline__spark.operators.text import bm25_topk

    docs = lake.load_table(spark, "documents", sf_dir)
    return bm25_topk(docs, ["spark", "join", "window"], k=10)


@register(
    "spatial_radius_neighbors",
    oracle="""
        WITH pts AS (
            SELECT c_custkey AS id,
                   ((c_custkey % 10000) * (c_custkey % 10000) * 7919
                    + (c_custkey % 10000) * 104729) % 10000 AS x,
                   ((c_custkey % 10000) * (c_custkey % 10000) * 104729
                    + (c_custkey % 10000) * 7919) % 10000 AS y
            FROM customer
        ),
        cells AS (
            SELECT id, x, y,
                   CAST(floor(x / 150.0) AS INT) AS cx,
                   CAST(floor(y / 150.0) AS INT) AS cy
            FROM pts
        ),
        probe AS (
            SELECT c.id AS a_id, c.x AS ax, c.y AS ay,
                   c.cx + dx.d AS cx, c.cy + dy.d AS cy
            FROM cells c,
                 (SELECT unnest([-1, 0, 1]) AS d) dx,
                 (SELECT unnest([-1, 0, 1]) AS d) dy
        ),
        pairs AS (
            SELECT p.a_id, b.id AS b_id,
                   (p.ax - b.x) * (p.ax - b.x)
                 + (p.ay - b.y) * (p.ay - b.y) AS dist2
            FROM probe p JOIN cells b USING (cx, cy)
            WHERE p.a_id < b.id
        ),
        hits AS (SELECT * FROM pairs WHERE dist2 <= 150 * 150),
        endpoints AS (
            SELECT a_id AS id, dist2 FROM hits
            UNION ALL SELECT b_id, dist2 FROM hits
        )
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
               CAST(MIN(dist2) AS BIGINT) AS min_dist2
        FROM endpoints GROUP BY id
    """,
    survey_ids=("J7", "J9", "F13"),
)
def spatial_radius_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join over a deterministic planar embedding of the
    customer dimension (integer coordinates derived from the key):
    per-customer neighbor count and nearest-neighbor squared distance
    (quadratic key mixing — a plain linear-congruential embedding puts
    the points on a sparse lattice with no close pairs at all)
    within radius 150 — the geo-proximity join the reference's
    unpersisted address dict implies.  Grid-bucketed (cell side =
    radius, 3×3 probe neighborhood, each candidate pair produced
    exactly once) — one equi-join shuffle, constant 9× probe
    amplification, never all-pairs; exact integer distances, no
    sqrt/trig.  See ``operators/spatial.py``."""
    from end_end_data_pipeline__spark.operators.spatial import (
        grid_radius_pairs,
        radius_neighbor_stats,
    )

    customer = lake.load_table(spark, "customer", sf_dir)
    m = F.col("c_custkey") % 10000  # mod-first: no BIGINT overflow at any sf
    pts = customer.select(
        F.col("c_custkey").alias("id"),
        ((m * m * 7919 + m * 104729) % 10000).alias("x"),
        ((m * m * 104729 + m * 7919) % 10000).alias("y"),
    )
    pairs = grid_radius_pairs(pts, radius=150)
    return radius_neighbor_stats(pairs)


@register(
    "asof_forward_click_after_purchase",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, ts, event_id AS click_id, value AS click_value
            FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts,
               CASE WHEN c.ts IS NOT NULL
                     AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                    THEN c.ts END AS asof_ts,
               CASE WHEN c.ts IS NOT NULL
                     AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                    THEN c.click_id END AS asof_click_id,
               CASE WHEN c.ts IS NOT NULL
                     AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                    THEN c.click_value END AS asof_click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
    survey_ids=("J7", "W6"),
)
def asof_forward_click_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for every purchase, the next
    click by the same user at-or-after it, nulled out when more than
    an hour later (pandas merge_asof tolerance semantics — the row
    stays, the match goes null).  Same single-shuffle union + reversed
    ordered-window carry as the backward as-of
    (``operators.relational.asof_join(direction='forward')``); the
    oracle is DuckDB's native forward ``ASOF LEFT JOIN`` plus the
    tolerance CASE."""
    from end_end_data_pipeline__spark.operators.relational import asof_join

    events = lake.load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        direction="forward",
        tolerance_seconds=3600,
    )


@register(
    "hierarchy_flatten_paths",
    oracle="""
        WITH RECURSIVE p AS (
            SELECT c_custkey AS node,
                   CASE WHEN c_custkey >= 10 THEN c_custkey // 10 END
                       AS parent
            FROM customer
        ),
        -- the walk steps through the parent-pointer TABLE (an ancestor
        -- with no row is a root), exactly like the engine's left-join
        -- rounds.  An arithmetic step (cur // 10 unconditionally)
        -- only coincides with this on key sets closed under //10 —
        -- true for the contiguous driver fixtures, false in general
        -- (caught by the sf1-derived gate, whose shifted key blocks
        -- are sparse).
        walk(node, cur, depth, path, root) AS (
            SELECT node, parent, 0, CAST(node AS VARCHAR),
                   CAST(NULL AS BIGINT)
            FROM p
            UNION ALL
            SELECT w.node, pp.parent, w.depth + 1,
                   w.path || '/' || CAST(w.cur AS VARCHAR), w.cur
            FROM walk w LEFT JOIN p pp ON w.cur = pp.node
            WHERE w.cur IS NOT NULL
        )
        SELECT node, COALESCE(root, node) AS root,
               CAST(depth AS INT) AS depth, path
        FROM walk WHERE cur IS NULL
    """,
    survey_ids=("J5", "J3", "F1"),
)
def hierarchy_flatten_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal — the reporting-chain / BOM query
    class (recursive CTE in SQL engines): every customer walks its
    decimal ownership chain (parent = key div 10) to the root,
    producing (node, root, depth, '/'-joined path).  Iterative
    DataFrame rounds, one narrow equi-join shuffle per tree LEVEL with
    lineage truncation — see
    :func:`operators.graph.flatten_hierarchy`; the oracle is the
    equivalent recursive CTE."""
    from end_end_data_pipeline__spark.operators.graph import flatten_hierarchy

    customer = lake.load_table(spark, "customer", sf_dir)
    parents = customer.select(
        F.col("c_custkey").alias("node"),
        F.when(
            F.col("c_custkey") >= 10, F.expr("c_custkey div 10")
        ).alias("parent"),
    )
    # the decimal chain is acyclic by construction — drop the
    # operator's is_cut flag to keep the oracle's 4-column contract
    return flatten_hierarchy(parents).select("node", "root", "depth", "path")


@register(
    "behavior_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        t AS (
            SELECT prev_type, event_type AS next_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n,
               CAST(n AS DOUBLE)
                   / SUM(n) OVER (PARTITION BY prev_type) AS p
        FROM t
    """,
    survey_ids=("W3", "A3", "A5"),
)
def behavior_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every (previous event type → next event type) pair, the transition
    count and conditional probability — the click-path analysis mart.
    One window per user (shuffle on user_id, frames stream), one tiny
    hash agg, and a 25-row window for the row-normalization; the
    probability is the same exact-integer division on both sides.
    """
    events = lake.load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm)).alias("p"),
    )


_BPE_ROUND = """
        pairs{k} AS (
            SELECT s[i] AS a, s[i + 1] AS b, SUM(n) AS c
            FROM (
                SELECT unnest(range(1, len(s))) AS i, s, n
                FROM (
                    SELECT string_split(trim(sym), ' ') AS s, n
                    FROM vocab{j}
                )
            )
            GROUP BY 1, 2
        ),
        top{k} AS (
            SELECT a, b, c FROM pairs{k} ORDER BY c DESC, a, b LIMIT 1
        ),
        vocab{k} AS (
            SELECT regexp_replace(
                       v.sym,
                       ' ' || t.a || ' ' || t.b || ' ',
                       ' ' || t.a || t.b || ' ', 'g') AS sym,
                   v.n
            FROM vocab{j} v, top{k} t
        )"""

# The WITH prefix shared by the learn and tokenize-stats oracles: ONE
# definition of vocab0 + the three unrolled rounds, so the two
# contracts can never validate against different tokenizers.
_BPE_SQL_PREFIX = (
    """
        WITH vocab0 AS (
            SELECT ' ' || array_to_string(string_split(w, ''), ' ')
                       || ' ' AS sym,
                   n
            FROM (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS n
                FROM (
                    SELECT lower(unnest(string_split(trim(text), ' '))) AS w
                    FROM documents
                )
                WHERE regexp_matches(w, '^[a-z]+$')
                GROUP BY w
            )
        ),"""
    + _BPE_ROUND.format(k=1, j=0)
    + ","
    + _BPE_ROUND.format(k=2, j=1)
    + ","
    + _BPE_ROUND.format(k=3, j=2)
)


@register(
    "text_bpe_learn_merges",
    oracle=(
        _BPE_SQL_PREFIX
        + """
        SELECT 1 AS merge_rank, a AS left_sym, b AS right_sym,
               a || b AS merged, CAST(c AS BIGINT) AS pair_count
        FROM top1
        UNION ALL
        SELECT 2, a, b, a || b, CAST(c AS BIGINT) FROM top2
        UNION ALL
        SELECT 3, a, b, a || b, CAST(c AS BIGINT) FROM top3
    """
    ),
    survey_ids=("UD5", "F3", "A2"),
    bench=True,
)
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training: the first 3 BPE merges learned from the
    corpus (frequency BPE — count adjacent symbol pairs weighted by
    word frequency, merge the argmax, rewrite, repeat).  Exact
    integer counts, total-ordered argmax, and a delimiter-safe
    non-overlapping regex rewrite make every round bit-identical to
    the oracle's unrolled three rounds.  All post-wordcount work runs
    on the VOCABULARY, not the corpus — see
    :func:`operators.text.learn_bpe_merges`."""
    from end_end_data_pipeline__spark.operators.text import learn_bpe_merges

    docs = lake.load_table(spark, "documents", sf_dir)
    return learn_bpe_merges(docs, n_merges=3)


@register(
    "scd2_point_in_time_join",
    oracle="""
        WITH changes AS (
            SELECT o_orderkey, o_totalprice, 'c' AS op,
                   CAST(1 AS BIGINT) AS ts_ms
            FROM orders WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey, o_totalprice + 50.0, 'u', CAST(2 AS BIGINT)
            FROM orders WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey, NULL, 'd', CAST(3 AS BIGINT)
            FROM orders WHERE o_orderkey % 20 = 0
        ), versioned AS (
            SELECT o_orderkey, o_totalprice, op, ts_ms,
                   lead(ts_ms) OVER (PARTITION BY o_orderkey
                                     ORDER BY ts_ms,
                                              CASE op WHEN 'd' THEN 3
                                                      WHEN 'u' THEN 2
                                                      ELSE 1 END) AS next_ts
            FROM changes
        ), dim AS (
            SELECT o_orderkey, o_totalprice AS price,
                   ts_ms AS valid_from, next_ts AS valid_to
            FROM versioned WHERE op <> 'd'
        ), facts AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(l_linenumber % 3 + 1 AS BIGINT) AS fact_ts,
                   CAST(l_quantity AS DOUBLE) AS quantity
            FROM lineitem WHERE l_orderkey % 5 = 0
        )
        SELECT f.l_orderkey, f.l_linenumber, f.fact_ts, f.quantity,
               d.price AS price_at_fact
        FROM facts f LEFT JOIN dim d
          ON d.o_orderkey = f.l_orderkey
         AND d.valid_from <= f.fact_ts
         AND (d.valid_to IS NULL OR f.fact_ts < d.valid_to)
    """,
    survey_ids=("J7", "ST5", "W3", "J4"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 dimension: every
    lineitem fact joins the dim VERSION that was valid at its event
    time — the warehouse query SCD2 exists for.  A fact whose time
    falls after the key's delete (or before its insert) gets NULL —
    history is honest, not latest-wins.  Plan: the dim is built once
    via the CDC wire (same recipe as ``scd2_order_history``), then ONE
    equi-join on the key with the interval predicate in the join
    condition — fan-out bounded by versions-per-key (≤2 here), no
    range explosion."""
    orders = lake.load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice"
    )
    from end_end_data_pipeline__spark.sources import cdc

    inserts = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "*", F.lit("c").alias("op"), F.lit(1).cast("long").alias("ts_ms")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 50.0)
        .select("*", F.lit("u").alias("op"), F.lit(2).cast("long").alias("ts_ms"))
    )
    deletes = orders.filter(F.col("o_orderkey") % 20 == 0).select(
        "*", F.lit("d").alias("op"), F.lit(3).cast("long").alias("ts_ms")
    )
    wire = cdc.encode_envelope(
        inserts.unionByName(updates).unionByName(deletes), "op", "ts_ms", "orders"
    )
    changes = cdc.decode(
        cdc.parse_envelope(wire, inserts.drop("op", "ts_ms").schema),
        ["o_orderkey"],
    )
    hist = cdc.scd2_history(changes, ["o_orderkey"])
    dim = hist.filter(F.col("image").isNotNull()).select(
        F.col("o_orderkey").alias("d_orderkey"),
        F.col("image.o_totalprice").alias("price"),
        F.col("valid_from_ms").alias("valid_from"),
        F.col("valid_to_ms").alias("valid_to"),
    )
    facts = (
        lake.load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_orderkey") % 5 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_linenumber") % 3 + 1).cast("long").alias("fact_ts"),
            F.col("l_quantity").cast("double").alias("quantity"),
        )
    )
    joined = facts.join(
        dim,
        (F.col("d_orderkey") == F.col("l_orderkey"))
        & (F.col("valid_from") <= F.col("fact_ts"))
        & (F.col("valid_to").isNull() | (F.col("fact_ts") < F.col("valid_to"))),
        "left",
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "fact_ts",
        "quantity",
        F.col("price").alias("price_at_fact"),
    )


@register(
    "approx_percentile_error_bound",
    # sketch estimates are engine-specific: the oracle checks the
    # EXACT percentiles by value and the KLL-style sketch by its
    # accuracy contract (same shape as approx_distinct_users_daily)
    oracle="""
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS exact_p50,
               quantile_cont(o_totalprice, 0.9) AS exact_p90,
               TRUE AS approx_within_bound
        FROM orders GROUP BY o_orderpriority
    """,
    survey_ids=("A8", "A4"),
)
def approx_percentile_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile: ``approx_percentile`` (one-pass,
    mergeable, bounded memory) next to the exact form, checked by its
    ACCURACY CONTRACT — with accuracy=10000 the estimate must be a
    true order statistic within 1% rank error, which for these
    distributions keeps it within 2% of the exact value; a broken
    sketch misses by orders of magnitude.  Exact percentiles are
    value-checked against the oracle."""
    orders = lake.load_table(spark, "orders", sf_dir)
    agg = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("exact_p50"),
        F.percentile("o_totalprice", 0.9).alias("exact_p90"),
        F.approx_percentile("o_totalprice", 0.5, 10000).alias("ap50"),
        F.approx_percentile("o_totalprice", 0.9, 10000).alias("ap90"),
    )
    within = (
        (F.abs(F.col("ap50") - F.col("exact_p50")) <= 0.02 * F.col("exact_p50"))
        & (F.abs(F.col("ap90") - F.col("exact_p90")) <= 0.02 * F.col("exact_p90"))
    )
    return agg.select(
        "o_orderpriority",
        "exact_p50",
        "exact_p90",
        within.alias("approx_within_bound"),
    )


@register(
    "embedding_mmr_rerank",
    oracle="""
        WITH qv AS (
            SELECT list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
            FROM embeddings WHERE vec_id = 0
        ),
        vv AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
            FROM embeddings WHERE vec_id <> 0
        ),
        rel AS (
            SELECT vec_id, SUM(v[i] * q[i]) AS rel
            FROM vv, qv, unnest(range(1, 65)) AS t(i)
            GROUP BY vec_id
        ),
        pool AS (
            SELECT r.vec_id, r.rel, v.v
            FROM rel r JOIN vv v USING (vec_id)
            ORDER BY r.rel DESC, r.vec_id LIMIT 8
        ),
        sims AS (
            SELECT a.vec_id AS ia, b.vec_id AS ib, SUM(a.v[i] * b.v[i]) AS s
            FROM pool a, pool b, unnest(range(1, 65)) AS t(i)
            GROUP BY 1, 2
        ),
        p1 AS (
            SELECT vec_id, rel FROM pool ORDER BY rel DESC, vec_id LIMIT 1
        ),
        p2 AS (
            SELECT c.vec_id, c.rel
            FROM pool c, p1
            JOIN sims s1 ON s1.ia = c.vec_id AND s1.ib = p1.vec_id
            WHERE c.vec_id <> p1.vec_id
            ORDER BY c.rel - s1.s DESC, c.vec_id LIMIT 1
        ),
        p3 AS (
            SELECT c.vec_id, c.rel
            FROM pool c, p1, p2
            JOIN sims s1 ON s1.ia = c.vec_id AND s1.ib = p1.vec_id
            JOIN sims s2 ON s2.ia = c.vec_id AND s2.ib = p2.vec_id
            WHERE c.vec_id NOT IN (p1.vec_id, p2.vec_id)
            ORDER BY c.rel - greatest(s1.s, s2.s) DESC, c.vec_id LIMIT 1
        )
        SELECT 1 AS rank, vec_id, CAST(rel AS BIGINT) AS relevance FROM p1
        UNION ALL SELECT 2, vec_id, CAST(rel AS BIGINT) FROM p2
        UNION ALL SELECT 3, vec_id, CAST(rel AS BIGINT) FROM p3
    """,
    survey_ids=("UD7", "O2", "F13"),
)
def embedding_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval: MMR re-ranking of the query vec_id=0's
    top-8 neighbor pool down to 3 picks — each pick maximizes
    relevance minus max-similarity-to-already-picked, so the result
    set covers the space instead of clustering around the top hit.
    Distributed top-pool scan + client-side greedy over the bounded
    pool (MMR is inherently sequential), all in exact scaled-integer
    arithmetic — the oracle unrolls the same three picks.  See
    :func:`operators.similarity.mmr_rerank`."""
    from end_end_data_pipeline__spark.operators.similarity import mmr_rerank

    emb = lake.load_table(spark, "embeddings", sf_dir)
    return mmr_rerank(emb, query_id=0, k=3, pool=8)


@register(
    "governance_masked_customers",
    oracle="""
        SELECT c_custkey,
               md5(c_name) AS c_name,
               CASE WHEN len(CAST(c_nationkey AS VARCHAR)) > 4
                    THEN repeat('*', len(CAST(c_nationkey AS VARCHAR)) - 4)
                         || substr(CAST(c_nationkey AS VARCHAR),
                                   len(CAST(c_nationkey AS VARCHAR)) - 3, 4)
                    ELSE repeat('*', len(CAST(c_nationkey AS VARCHAR))) END
                   AS c_nationkey,
               CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS c_acctbal,
               c_mktsegment
        FROM customer
    """,
    survey_ids=("P7", "F4", "F1"),
)
def governance_masked_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level dynamic data masking over the customer dimension:
    names become deterministic md5 pseudonyms (still joinable),
    nation keys display-mask (short values star out fully), balances
    generalize to 1000-wide buckets (aggregates stay meaningful),
    segment passes through — pure codegen'd JVM expressions, no UDF.
    The masked frame keeps column names/types, so it is a drop-in
    serving view.  See ``functions/masking.py``."""
    from end_end_data_pipeline__spark.functions.masking import apply_policy

    customer = lake.load_table(spark, "customer", sf_dir)
    return apply_policy(
        customer,
        {
            "c_name": "hash",
            "c_nationkey": "partial",
            "c_acctbal": "bucket:1000",
        },
    )


@register(
    "integrity_table_checksums",
    oracle="""
        WITH o AS (
            SELECT md5(COALESCE(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|'
                       || COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>') || '|'
                       || COALESCE(o_orderstatus, '<NULL>') || '|'
                       || COALESCE(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                        AS VARCHAR), '<NULL>')
                       || '|' || COALESCE(strftime(o_orderdate,
                                          '%Y-%m-%d %H:%M:%S'), '<NULL>')
                       || '|' || COALESCE(o_orderpriority, '<NULL>')) AS h
            FROM orders
        ),
        c AS (
            SELECT md5(COALESCE(CAST(c_custkey AS VARCHAR), '<NULL>') || '|'
                       || COALESCE(c_name, '<NULL>') || '|'
                       || COALESCE(CAST(c_nationkey AS VARCHAR), '<NULL>')
                       || '|'
                       || COALESCE(CAST(CAST(c_acctbal AS DECIMAL(18,2))
                                        AS VARCHAR), '<NULL>')
                       || '|' || COALESCE(c_mktsegment, '<NULL>')) AS h
            FROM customer
        ),
        l AS (
            SELECT md5(COALESCE(CAST(l_orderkey AS VARCHAR), '<NULL>') || '|'
                       || COALESCE(CAST(l_linenumber AS VARCHAR), '<NULL>')
                       || '|'
                       || COALESCE(CAST(CAST(l_quantity AS DECIMAL(18,2))
                                        AS VARCHAR), '<NULL>')
                       || '|'
                       || COALESCE(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                        AS VARCHAR), '<NULL>')
                       || '|' || COALESCE(l_returnflag, '<NULL>') || '|'
                       || COALESCE(strftime(l_shipdate,
                                   '%Y-%m-%d %H:%M:%S'), '<NULL>')) AS h
            FROM lineitem
        )
        SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               bit_xor(('0x' || substr(h, 1, 13))::BIGINT) AS checksum
        FROM o
        UNION ALL
        SELECT 'customer', CAST(COUNT(*) AS BIGINT),
               bit_xor(('0x' || substr(h, 1, 13))::BIGINT)
        FROM c
        UNION ALL
        SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
               bit_xor(('0x' || substr(h, 1, 13))::BIGINT)
        FROM l
    """,
    survey_ids=("P7", "F4", "U1"),
)
def integrity_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints — the migration/replication
    validation primitive: each row canonicalizes to a fixed-format
    string (doubles through DECIMAL so rendering is engine-stable,
    timestamps through an explicit format, NULLs as an explicit
    sentinel so null placement is part of the fingerprint — a literal
    '<NULL>' string value is the one documented collision), hashes to
    a 52-bit md5
    slice, and the per-table checksum is the XOR of all row hashes —
    commutative and overflow-free, so ANY row-level drift between two
    copies of a table flips the checksum regardless of row order or
    partitioning.  One scan per table, map-side-combinable bit_xor
    agg."""
    def canon(parts):
        # concat_ws silently SKIPS nulls, which would both diverge from
        # the oracle's || (null-propagating) and make ('a',NULL,'b') and
        # (NULL,'a','b') collide — every part renders NULL explicitly
        safe = [F.coalesce(pp, F.lit("<NULL>")) for pp in parts]
        return F.md5(F.concat_ws("|", *safe).cast("binary"))

    def h52(c):
        return F.conv(F.substring(c, 1, 13), 16, 10).cast("long")

    def table_sum(df, name, parts):
        return df.select(h52(canon(parts)).alias("h")).agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("checksum"),
        )

    money = lambda c: F.col(c).cast("decimal(18,2)").cast("string")  # noqa: E731
    ts = lambda c: F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    orders = lake.load_table(spark, "orders", sf_dir)
    customer = lake.load_table(spark, "customer", sf_dir)
    lineitem = lake.load_table(spark, "lineitem", sf_dir)
    return (
        table_sum(
            orders, "orders",
            [
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                money("o_totalprice"),
                ts("o_orderdate"),
                F.col("o_orderpriority"),
            ],
        )
        .unionByName(
            table_sum(
                customer, "customer",
                [
                    F.col("c_custkey").cast("string"),
                    F.col("c_name"),
                    F.col("c_nationkey").cast("string"),
                    money("c_acctbal"),
                    F.col("c_mktsegment"),
                ],
            )
        )
        .unionByName(
            table_sum(
                lineitem, "lineitem",
                [
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    money("l_quantity"),
                    money("l_extendedprice"),
                    F.col("l_returnflag"),
                    ts("l_shipdate"),
                ],
            )
        )
    )


@register(
    "retention_dau_wau_stickiness",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        dau AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
        ),
        contrib AS (
            SELECT CAST(day + i * INTERVAL 1 DAY AS DATE) AS target_day,
                   user_id
            FROM du, unnest(range(0, 7)) AS t(i)
        ),
        wau AS (
            SELECT target_day AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM contrib GROUP BY 1
        )
        SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
               CAST(d.dau AS DOUBLE) / w.wau AS stickiness
        FROM dau d JOIN wau w ON d.day = w.day
    """,
    survey_ids=("A4", "A6", "W4"),
)
def retention_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU) per day — the
    growth-metrics mart.  The trailing DISTINCT count (which a window
    frame cannot stream) becomes a CONTRIBUTION explode: each
    (user, active day) pair contributes to the 7 target days it keeps
    the user active for, then one distinct-count per target day —
    linear × 7 in the distinct pairs, shuffles only on (day, user),
    no per-day rescan of the week.  Days are exact date arithmetic;
    stickiness is the same integer division on both sides.  Output is
    restricted to days with observed DAU (inner join), so partial
    leading weeks are visible via WAU > DAU."""
    events = lake.load_table(spark, "events", sf_dir)
    du = events.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "currency_asof_conversion",
    oracle="""
        WITH rates AS (
            SELECT c.cur, d.d AS rate_day,
                   CAST(1 + c.i AS DOUBLE)
                       + CAST(d.d AS DOUBLE) / CAST(100 AS DOUBLE) AS rate
            FROM (SELECT unnest(['USD','EUR','GBP','INR','CAD','AUD']) AS cur,
                         unnest([0, 1, 2, 3, 4, 5]) AS i) c,
                 (SELECT unnest(range(0, 30)) AS d) d
            WHERE d.d % 7 <> 0
        ),
        ev AS (
            SELECT CAST(date_diff('day', DATE '2024-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS day,
                   ['USD','EUR','GBP','INR','CAD','AUD']
                       [CAST(user_id % 6 AS INT) + 1] AS cur,
                   value
            FROM events
        ),
        matched AS (
            SELECT e.day, e.cur, e.value, r.rate
            FROM ev e ASOF LEFT JOIN rates r
              ON e.cur = r.cur AND e.day >= r.rate_day
        )
        SELECT cur, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(CAST(SUM(CAST(value * rate AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
                   AS usd_total
        FROM matched GROUP BY cur
    """,
    survey_ids=("J7", "A2", "F9"),
)
def currency_asof_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency conversion mart — the reference's CHAR(3) currency
    column (``SCHEMA.sql:16``, 6 currencies from ``generator.py:23``)
    finally used: every event converts at the LATEST rate posted
    at-or-before its day (rates gap on every 7th day, so the as-of
    backward join must carry Friday's rate over the gap — exactly why
    a plain equi-join on day is wrong), then rolls up to
    decimal-exact converted totals per currency.  Rates are a
    deterministic synthesized table; the conversion product is
    quantized to DECIMAL before summing so the rollup is
    order-independent.  One as-of join (single shuffle) + one hash
    agg."""
    from end_end_data_pipeline__spark.operators.relational import asof_join

    curs = ["USD", "EUR", "GBP", "INR", "CAD", "AUD"]
    events = lake.load_table(spark, "events", sf_dir)
    cur_of = F.element_at(
        F.array(*[F.lit(c) for c in curs]), (F.col("user_id") % 6 + 1).cast("int")
    )
    ev = events.select(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        cur_of.alias("cur"),
        "value",
    )
    # 6x25 literal rate dim, built driver-side (150 rows — a real
    # pipeline would read it; synthesizing via a join would put a
    # CartesianProduct in the plan for no reason)
    rate_rows = [
        (c, d, (1.0 + i) + d / 100.0)
        for i, c in enumerate(curs)
        for d in range(30)
        if d % 7 != 0
    ]
    rates = spark.createDataFrame(
        spark.sparkContext.parallelize(rate_rows, 1),
        "cur string, rate_day long, rate double",
    )
    # asof_join orders on the ts columns as-is — integer days join
    # directly, mirroring the oracle's integer-day ASOF comparison
    matched = asof_join(
        ev,
        rates.select("cur", F.col("rate_day").alias("ts"), "rate"),
        key="cur",
        left_ts="day",
        right_ts="ts",
    )
    return matched.groupBy("cur").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum(F.col("value") * F.col("asof_rate"), "usd_total"),
    )


@register(
    "fulfillment_latency_percentiles",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               quantile_cont(date_diff('day', o.o_orderdate, l.l_shipdate),
                             0.5) AS p50_days,
               quantile_cont(date_diff('day', o.o_orderdate, l.l_shipdate),
                             0.9) AS p90_days,
               CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate))
                    AS BIGINT) AS max_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    survey_ids=("A8", "J2", "F6"),
)
def fulfillment_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority — the SLA mart
    the reference's (account_id, created_at) index exists to serve:
    order ⋈ lineitem on the key, day lag per line, exact p50/p90 +
    max.  Integer day lags make the percentiles cross-engine exact."""
    orders = lake.load_table(spark, "orders", sf_dir)
    lineitem = lake.load_table(spark, "lineitem", sf_dir)
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("long")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.percentile("lag_days", 0.5).alias("p50_days"),
            F.percentile("lag_days", 0.9).alias("p90_days"),
            F.max("lag_days").alias("max_days"),
        )
    )


@register(
    "quality_event_disorder_rate",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts,
                   MAX(ts) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prior_max
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(CASE WHEN ts < prior_max THEN 1 END) AS BIGINT)
                   AS n_out_of_order,
               CAST(COUNT(CASE WHEN ts < prior_max THEN 1 END) AS DOUBLE)
                   / COUNT(*) AS disorder_rate,
               CAST(MAX(CASE WHEN ts < prior_max
                    THEN epoch_us(prior_max) - epoch_us(ts) END) AS BIGINT)
                   AS max_lateness_us
        FROM seq GROUP BY user_id
    """,
    survey_ids=("P7", "W1", "ST3"),
)
def quality_event_disorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-quality mart: how OUT-OF-ORDER each user's event stream
    arrives (event_id is the arrival proxy) — the measurement that
    justifies a watermark setting: an event is disordered when its
    event time precedes the running max of everything that arrived
    before it, and max_lateness_us is the per-user watermark bound a
    pipeline would need to not drop data.  One streamed window per
    user + one hash agg; the rate is the same exact-integer division
    on both sides."""
    events = lake.load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = events.select(
        "user_id", "ts", F.max("ts").over(w).alias("prior_max")
    )
    late = F.when(F.col("ts") < F.col("prior_max"), 1)
    lateness = F.when(
        F.col("ts") < F.col("prior_max"),
        F.unix_micros("prior_max") - F.unix_micros("ts"),
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(late).alias("n_out_of_order"),
        (F.count(late).cast("double") / F.count(F.lit(1))).alias("disorder_rate"),
        F.max(lateness).alias("max_lateness_us"),
    )


@register(
    "text_bpe_tokenize_stats",
    oracle=_BPE_SQL_PREFIX
    + """,
        wmap AS (
            SELECT replace(trim(sym), ' ', '') AS w,
                   CAST(len(string_split(trim(sym), ' ')) AS BIGINT)
                       AS n_sym
            FROM vocab3
        ),
        scoped AS (
            SELECT doc_id, w FROM (
                SELECT doc_id,
                       lower(unnest(string_split(trim(text), ' '))) AS w
                FROM documents
            ) WHERE regexp_matches(w, '^[a-z]+$')
        )
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(m.n_sym) AS BIGINT) AS n_bpe_tokens,
               CAST(SUM(CAST(length(s.w) AS BIGINT)) AS DOUBLE)
                   / CAST(SUM(m.n_sym) AS DOUBLE) AS chars_per_token
        FROM scoped s JOIN wmap m ON s.w = m.w
        GROUP BY s.doc_id
    """,
    survey_ids=("UD5", "F3", "F4"),
)
def text_bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the second half of
    ``text_bpe_learn_merges``: learn 3 merges from the corpus, then
    tokenize the corpus with them and report per-document BPE token
    counts and chars-per-token (the compression ratio every
    training-cost estimate and sequence-packing plan keys off).

    The trained tokenizer IS the rewritten vocabulary (word →
    post-merge symbol count), so application is a hash join of corpus
    tokens against that map — per-word merge work happens once per
    DISTINCT word form, never per occurrence (see
    :func:`operators.text.bpe_token_stats`).  The oracle replays the
    identical three unrolled rounds and the same join.
    """
    from end_end_data_pipeline__spark.operators.text import bpe_token_stats

    docs = lake.load_table(spark, "documents", sf_dir)
    return bpe_token_stats(docs, n_merges=3)


@register(
    "supplier_lead_time_stats",
    oracle="""
        WITH lt AS (
            SELECT l_suppkey,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) AS BIGINT) AS d
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        m AS (
            SELECT l_suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(d AS HUGEINT)) AS s,
                   SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS s2,
                   MIN(d) AS min_days, MAX(d) AS max_days
            FROM lt GROUP BY l_suppkey
        )
        SELECT m.l_suppkey AS suppkey, s_name AS supplier, n AS n_shipments,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_days,
               sqrt(CAST(n * s2 - s * s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std_days,
               CAST(min_days AS INT) AS min_days,
               CAST(max_days AS INT) AS max_days
        FROM m JOIN supplier ON m.l_suppkey = s_suppkey
    """,
    survey_ids=("A2", "F6", "J5"),
)
def supplier_lead_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per supplier (count, mean, population
    std, min, max in days) — the supplier-performance mart a
    procurement dashboard ranks on, and the variance input to any
    safety-stock formula.

    Exact integer day-count moments (n, Σd, Σd²) per supplier —
    map-side combinable, order-independent — with the mean/std combine
    as one double tree (sqrt is IEEE correctly-rounded); the supplier
    dimension joins broadcast.  At 100 TB the shuffle carries three
    numbers per supplier.
    """
    lineitem = lake.load_table(spark, "lineitem", sf_dir)
    orders = lake.load_table(spark, "orders", sf_dir)
    supplier = lake.load_table(spark, "supplier", sf_dir)
    d = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).cast(
        "bigint"
    )
    lt = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        "l_suppkey", d.alias("d")
    )
    d_dec = F.col("d").cast("decimal(38,0)")
    m = lt.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d_dec).alias("s"),
        F.sum(d_dec * d_dec).alias("s2"),
        F.min("d").alias("min_days"),
        F.max("d").alias("max_days"),
    )
    mean, std = exact_mean_std(F.col("n"), F.col("s"), F.col("s2"))
    return (
        m.join(F.broadcast(supplier), m.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier"),
            F.col("n").alias("n_shipments"),
            mean.alias("mean_days"),
            std.alias("std_days"),
            F.col("min_days").cast("int").alias("min_days"),
            F.col("max_days").cast("int").alias("max_days"),
        )
    )


@register(
    "clv_by_segment",
    oracle="""
        WITH per_cust AS (
            SELECT c_mktsegment AS segment, o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100
                            AS BIGINT)) AS cents,
                   CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                                  MAX(CAST(o_orderdate AS DATE)))
                        AS BIGINT) AS lifespan_days
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        )
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders,
               CAST(SUM(n_orders) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS orders_per_customer,
               CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
                   / (CAST(SUM(n_orders) AS DOUBLE) * 100.0)
                   AS mean_order_value,
               CAST(SUM(lifespan_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_lifespan_days,
               CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 100.0)
                   AS clv_historic
        FROM per_cust GROUP BY segment
    """,
    survey_ids=("A2", "A3", "F6"),
)
def clv_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historic customer-lifetime-value mart per market segment:
    customers, order frequency, mean order value, mean active lifespan
    (first→last order), and realized CLV (revenue per customer) — the
    finance readout the RFM segmentation feeds.

    Two hash aggs: fact → per-customer exact integers (cents, counts,
    min/max dates), then per-segment sums; every displayed ratio is
    one double division over exact sums.  Same shape as the Gini
    query: the fact-sized shuffle ends at the customer collapse.
    """
    orders = lake.load_table(spark, "orders", sf_dir)
    customer = lake.load_table(spark, "customer", sf_dir)
    per_cust = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(13,2)") * 100).cast(
                    "bigint"
                )
            ).alias("cents"),
            F.datediff(
                F.max(F.to_date("o_orderdate")), F.min(F.to_date("o_orderdate"))
            )
            .cast("bigint")
            .alias("lifespan_days"),
        )
    )
    n_cust = F.count(F.lit(1)).cast("bigint")
    sum_orders = F.sum("n_orders").cast("decimal(38,0)")
    sum_cents = F.sum(F.col("cents").cast("decimal(38,0)"))
    return per_cust.groupBy("segment").agg(
        n_cust.alias("n_customers"),
        sum_orders.cast("bigint").alias("n_orders"),
        (sum_orders.cast("double") / n_cust.cast("double")).alias(
            "orders_per_customer"
        ),
        (
            sum_cents.cast("double")
            / (sum_orders.cast("double") * F.lit(100.0))
        ).alias("mean_order_value"),
        (
            F.sum("lifespan_days").cast("double") / n_cust.cast("double")
        ).alias("mean_lifespan_days"),
        (
            sum_cents.cast("double") / (n_cust.cast("double") * F.lit(100.0))
        ).alias("clv_historic"),
    )


_ATTR_WINDOW_MIN = 120  # attribution lookback, minutes


@register(
    "attribution_linear_credit",
    oracle=f"""
        WITH clicks AS (
            SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
                   CAST(value AS DOUBLE) AS value
            FROM events WHERE event_type = 'purchase'
        ),
        touches AS (
            SELECT p.purchase_id, p.value, c.click_id,
                   CAST(COUNT(*) OVER (PARTITION BY p.purchase_id)
                        AS BIGINT) AS n_touches
            FROM purchases p JOIN clicks c
              ON p.user_id = c.user_id
             AND c.click_ts < p.purchase_ts
             AND c.click_ts >= p.purchase_ts
                              - INTERVAL {_ATTR_WINDOW_MIN} MINUTE
        )
        SELECT purchase_id, click_id, n_touches,
               value / CAST(n_touches AS DOUBLE) AS credit
        FROM touches
    """,
    survey_ids=("J7", "W1", "A5"),
)
def attribution_linear_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 2 hours
    before a purchase by the same user gets an equal share of the
    purchase value — the marketing-credit allocation one level up from
    last-touch (which ``asof_click_before_purchase`` already covers).

    Emitted at the (purchase, click) PAIR grain on purpose: each
    credit is one double division of exact inputs (deterministic
    row-wise), while aggregating credits here would sum doubles across
    rows — partition-order dependent, so that roll-up belongs in a
    decimal-quantized mart downstream.  Plan: user-keyed equi-join
    with the time band in the join condition (fan-out bounded by
    clicks-per-user-per-2h), then a per-purchase count window over the
    pair frame.
    """
    events = lake.load_table(spark, "events", sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").cast("double").alias("value"),
    )
    # explicit aliases: both sides project the same events frame, and
    # the repo convention (cf. selfjoin_same_day_order_pairs) is to
    # never lean on Spark's self-join disambiguation for the predicate
    p, c = purchases.alias("p"), clicks.alias("c")
    touches = p.join(
        c,
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.click_ts") < F.col("p.purchase_ts"))
        & (
            F.col("c.click_ts")
            >= F.col("p.purchase_ts")
            - F.expr(f"INTERVAL {_ATTR_WINDOW_MIN} MINUTE")
        ),
    ).select("p.purchase_id", "p.value", "c.click_id")
    w = Window.partitionBy("purchase_id")
    return touches.select(
        "purchase_id",
        "click_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_touches"),
        (
            F.col("value")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("credit"),
    )


@register(
    "supplier_return_rate",
    oracle="""
        SELECT l_suppkey AS suppkey, s_name AS supplier,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returned,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS return_rate,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN CAST(CAST(l_extendedprice AS DECIMAL(13,2))
                                       * 100 AS BIGINT) ELSE 0 END)
                    AS DOUBLE) / 100.0 AS returned_value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2
    """,
    survey_ids=("A5", "A2", "J5"),
)
def supplier_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate and returned value per supplier — the
    supplier-quality mart next to the lead-time stats: share of line
    items flagged returned and the money they carried.  One
    conditional hash agg over the broadcast-joined fact; exact
    integer counts and cents, two display divisions.
    """
    lineitem = lake.load_table(spark, "lineitem", sf_dir)
    supplier = lake.load_table(spark, "supplier", sf_dir)
    returned = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    ret_cents = F.when(
        F.col("l_returnflag") == "R",
        (F.col("l_extendedprice").cast("decimal(13,2)") * 100).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        lineitem.join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .groupBy(
            F.col("l_suppkey").alias("suppkey"), F.col("s_name").alias("supplier")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(returned).cast("bigint").alias("n_returned"),
            (
                F.sum(returned).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("return_rate"),
            (F.sum(ret_cents).cast("double") / F.lit(100.0)).alias(
                "returned_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization ADC search (round 6)
# ---------------------------------------------------------------------------


def _pq_oracle(m: int = 4, k: int = 4, dim: int = 64, scale: int = 1_000_000) -> str:
    """DuckDB replay of ``similarity.pq_encode`` (m independent
    2-iteration fixed-point k-means codebooks over contiguous
    subspaces) + ``pq_adc_topk`` for the query vector vec_id = 0.
    Generated per subspace from the proven kmeans-oracle template —
    same quantization, same argmin tie-break (d, cid), same
    offset-normalized floor division for centroid means."""
    w = dim // m
    parts = [f"""
        q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {scale})
                                 AS BIGINT)) AS q
            FROM embeddings
        ),
        qv AS (SELECT q FROM q WHERE vec_id = 0)"""]
    for s in range(m):
        lo, hi = s * w + 1, s * w + w + 1  # 1-based [lo, hi) slice
        parts.append(f"""
        c0_{s} AS (SELECT vec_id AS cid, q FROM q WHERE vec_id < {k}),
        d1_{s} AS (
            SELECT v.vec_id, c.cid,
                   SUM((v.q[i] - c.q[i]) * (v.q[i] - c.q[i])) AS d
            FROM q v CROSS JOIN c0_{s} c,
                 unnest(range({lo}, {hi})) AS t(i)
            GROUP BY 1, 2
        ),
        a1_{s} AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, cid) AS rn
                FROM d1_{s}) WHERE rn = 1
        ),
        cm_{s} AS (
            SELECT a.cid, t.i,
                   CAST((SUM(v.q[t.i]) + COUNT(*) * {scale}) // COUNT(*)
                        AS BIGINT) - {scale} AS cval
            FROM a1_{s} a JOIN q v USING (vec_id),
                 unnest(range({lo}, {hi})) AS t(i)
            GROUP BY 1, 2
        ),
        d2_{s} AS (
            SELECT v.vec_id, c.cid,
                   SUM((v.q[c.i] - c.cval) * (v.q[c.i] - c.cval)) AS d
            FROM q v CROSS JOIN cm_{s} c
            GROUP BY 1, 2
        ),
        a2_{s} AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, cid) AS rn
                FROM d2_{s}) WHERE rn = 1
        ),
        dt_{s} AS (
            SELECT c.cid,
                   SUM((qv.q[c.i] - c.cval) * (qv.q[c.i] - c.cval)) AS d
            FROM cm_{s} c CROSS JOIN qv
            GROUP BY 1
        )""")
    a_joins = " ".join(
        f"JOIN a2_{s} a{s} USING (vec_id)" for s in range(1, m)
    )
    dt_joins = " ".join(
        f"JOIN dt_{s} t{s} ON t{s}.cid = a{s}.cid" for s in range(m)
    )
    total = " + ".join(f"t{s}.d" for s in range(m))
    return f"""
        WITH {",".join(parts)}
        SELECT a0.vec_id, CAST({total} AS BIGINT) AS adc_dist
        FROM a2_0 a0 {a_joins} {dt_joins}
        ORDER BY adc_dist, a0.vec_id LIMIT 10
    """


@register(
    "embedding_pq_adc_topk",
    oracle=_pq_oracle(),
    survey_ids=("UD7", "J9", "F13"),
    bench=True,
)
def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011): 4 subspaces x 4
    fixed-point k-means codes compress each 64-dim vector to 4 small
    ints; search runs ASYMMETRIC DISTANCE (ADC) — the query's m x k
    distance table is precomputed driver-side and the corpus scan is
    m literal-array lookups per row, no join, no vector math,
    TakeOrderedAndProject for the top-10.  At 100 TB the index scan
    touches code bytes instead of float vectors (here 2000x less
    data; production k=256 gives 64x with byte codes).  Integer
    arithmetic end-to-end, so the oracle replays training + encoding
    + the ADC table bit-for-bit.  See
    :func:`operators.similarity.pq_encode` / :func:`pq_adc_topk`."""
    from end_end_data_pipeline__spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    emb = lake.load_table(spark, "embeddings", sf_dir)
    codes, books = pq_encode(emb, m=4, k=4, dim=64, iterations=2)
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return pq_adc_topk(codes, books, query, k_top=10)


@register(
    "embedding_centroid_classifier_eval",
    oracle="""
        WITH q AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS q
            FROM embeddings
        ),
        cm AS (
            SELECT label, i,
                   CAST((SUM(q[i]) + COUNT(*) * 1000000) // COUNT(*)
                        AS BIGINT) - 1000000 AS cval
            FROM q, unnest(range(1, 65)) AS t(i)
            GROUP BY 1, 2
        ),
        c1 AS (
            SELECT label AS clabel, list(cval ORDER BY i) AS c
            FROM cm GROUP BY label
        ),
        d AS (
            SELECT v.vec_id, v.label, c.clabel,
                   SUM((v.q[i] - c.c[i]) * (v.q[i] - c.c[i])) AS d
            FROM q v CROSS JOIN c1 c, unnest(range(1, 65)) AS t(i)
            GROUP BY 1, 2, 3
        ),
        pred AS (
            SELECT vec_id, label, clabel AS pred FROM (
                SELECT vec_id, label, clabel,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, clabel) AS rn
                FROM d) WHERE rn = 1
        )
        SELECT label, pred,
               CAST(COUNT(*) AS BIGINT) AS n_cell,
               CAST(SUM(vec_id) AS BIGINT) AS member_id_sum
        FROM pred GROUP BY label, pred
        ORDER BY label, pred
    """,
    survey_ids=("UD7", "F13", "A3"),
)
def embedding_centroid_classifier_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-quality evaluation by nearest-centroid (Rocchio)
    reclassification: train one mean vector per label on the corpus
    itself, reassign every vector to its nearest centroid in exact
    fixed-point squared-L2, and report the full confusion matrix
    (true label × predicted label, with a member-id checksum per
    cell).  The diagonal mass is the separability score of the
    embedding space; the heaviest off-diagonal cells name the label
    pairs a downstream classifier will confuse.  See
    :func:`operators.similarity.nearest_centroid_confusion` for the
    literal-centroid one-scan plan shape."""
    from end_end_data_pipeline__spark.operators.similarity import (
        nearest_centroid_confusion,
    )

    emb = lake.load_table(spark, "embeddings", sf_dir)
    pred = nearest_centroid_confusion(emb)
    return (
        pred.groupBy(
            F.col("__label").alias("label"), F.col("pred")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cell"),
            F.sum("__id").cast("long").alias("member_id_sum"),
        )
        .orderBy("label", "pred")
    )


# ---------------------------------------------------------------------------
# Feature engineering: hashing trick, LOO target encoding, group-safe split
# ---------------------------------------------------------------------------

def _u32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


@register(
    "features_hashing_trick",
    oracle=f"""
        WITH feats AS (
            SELECT c.c_custkey,
                   'n=' || n.n_name AS feat,
                   CAST(1 AS BIGINT) AS weight
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            UNION ALL
            SELECT c_custkey, 's=' || c_mktsegment AS feat,
                   CAST(1 AS BIGINT) AS weight
            FROM customer
            UNION ALL
            SELECT o_custkey AS c_custkey,
                   'p=' || o_orderpriority AS feat,
                   CAST(COUNT(*) AS BIGINT) AS weight
            FROM orders GROUP BY 1, 2
        ),
        hashed AS (
            SELECT c_custkey,
                   {_u32_sql('feat')} % 16 AS bucket,
                   CASE WHEN ({_u32_sql('feat')} // 16) % 2 = 0
                        THEN weight ELSE -weight END AS sval
            FROM feats
        )
        SELECT c_custkey, CAST(bucket AS BIGINT) AS bucket,
               CAST(SUM(sval) AS BIGINT) AS val
        FROM hashed
        GROUP BY c_custkey, bucket
        ORDER BY c_custkey, bucket
    """,
    survey_ids=("F4", "A3", "U1"),
)
def features_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick) per customer: categorical
    features (nation, market segment, per-priority order counts) are
    hashed into a FIXED 16-bucket signed vector — the dimensionality
    cap that makes categorical feature spaces of unbounded vocabulary
    trainable without a fitted vocabulary object (no stateful encoder
    to ship; new categories at serve time hash to the same space).

    Determinism: bucket = md5-u32(feat) mod 16 and the sign bit is the
    next hash bit — the engine-stable uniform, exactly replayable in
    SQL; cell values are signed integer weight sums (sparse — only
    non-zero cells are emitted).

    Scale shape: three feature extractors union into one (entity,
    feat, weight) stream (the priority counts pre-aggregated
    map-side), one hash agg on (entity, bucket) — no vocabulary
    broadcast, no fitted state, the defining scale property of the
    trick."""
    from end_end_data_pipeline__spark.plans.queries_llm import _md5_u32

    cust = lake.load_table(spark, "customer", sf_dir)
    nat = lake.load_table(spark, "nation", sf_dir)
    orders = lake.load_table(spark, "orders", sf_dir)
    feats = (
        cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .select(
            "c_custkey",
            F.concat(F.lit("n="), F.col("n_name")).alias("feat"),
            F.lit(1).cast("long").alias("weight"),
        )
        .unionByName(
            cust.select(
                "c_custkey",
                F.concat(F.lit("s="), F.col("c_mktsegment")).alias("feat"),
                F.lit(1).cast("long").alias("weight"),
            )
        )
        .unionByName(
            orders.groupBy(
                F.col("o_custkey").alias("c_custkey"),
                F.concat(F.lit("p="), F.col("o_orderpriority")).alias(
                    "feat"
                ),
            ).agg(F.count(F.lit(1)).cast("long").alias("weight"))
        )
    )
    h = _md5_u32(F.col("feat"))
    hashed = feats.select(
        "c_custkey",
        (h % 16).alias("bucket"),
        F.when((h.bitwiseAND(16) == 0), F.col("weight"))
        .otherwise(-F.col("weight"))
        .alias("sval"),
    )
    return (
        hashed.groupBy("c_custkey", "bucket")
        .agg(F.sum("sval").cast("long").alias("val"))
        .select(
            "c_custkey", F.col("bucket").cast("long").alias("bucket"), "val"
        )
        .orderBy("c_custkey", "bucket")
    )


@register(
    "features_target_encoding_loo",
    oracle="""
        WITH labeled AS (
            SELECT o.o_orderkey, c.c_mktsegment AS segment,
                   CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                     AS label
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        seg AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(label) AS BIGINT) AS pos
            FROM labeled GROUP BY segment
        )
        SELECT l.o_orderkey, l.segment, CAST(l.label AS BIGINT) AS label,
               CAST((s.pos - l.label) * 1000000 // (s.n - 1) AS BIGINT)
                 AS te_loo_ppm,
               CAST((s.pos * 1000000 + 20 * 500000) // (s.n + 20) AS BIGINT)
                 AS te_smooth_ppm
        FROM labeled l JOIN seg s ON l.segment = s.segment
        ORDER BY l.o_orderkey
    """,
    survey_ids=("A5", "J1", "F11"),
)
def features_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target encoding of the market segment against the urgent-order
    label, in the two leakage-aware forms a training pipeline needs:
    LEAVE-ONE-OUT (each row's own label removed from its category
    mean — the standard guard against the target leaking into its own
    feature) and prior-smoothed (m=20 pseudo-observations of the 50%
    prior — the guard against tiny categories memorizing).

    Exact integers: both encodings are fixed-point ppm floors of
    rational means — (pos−y)·10⁶/(n−1) and (pos·10⁶+m·½·10⁶)/(n+m) —
    no doubles, bit-identical cross-engine.

    Scale shape: one equi-join for labels, one map-side-combinable
    hash agg to category stats (segments — tiny), one broadcast join
    back to rows.  The LOO adjustment is per-row arithmetic on the
    joined stats, NOT a per-row re-aggregation."""
    orders = lake.load_table(spark, "orders", sf_dir)
    cust = lake.load_table(spark, "customer", sf_dir)
    labeled = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("label"),
    )
    seg = labeled.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("pos"),
    )
    return (
        labeled.join(F.broadcast(seg), "segment")
        .select(
            "o_orderkey",
            "segment",
            F.col("label").cast("long").alias("label"),
            F.expr(
                "CAST((pos - label) * 1000000 DIV (n - 1) AS BIGINT)"
            ).alias("te_loo_ppm"),
            F.expr(
                "CAST((pos * 1000000 + 20 * 500000) DIV (n + 20) AS BIGINT)"
            ).alias("te_smooth_ppm"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "corpus_groupwise_split",
    oracle=f"""
        WITH folded AS (
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(CAST(CAST(o.o_totalprice AS DECIMAL(13,2)) * 100
                        AS BIGINT) AS BIGINT) AS cents,
                   {_u32_sql('CAST(o.o_custkey AS VARCHAR)')} % 5 AS fold
            FROM orders o
        )
        SELECT CAST(fold AS BIGINT) AS fold,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS cents,
               CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_checksum
        FROM folded
        GROUP BY fold
        ORDER BY fold
    """,
    survey_ids=("F4", "F9", "A4"),
)
def corpus_groupwise_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware k-fold assignment: every order lands in the fold of
    its CUSTOMER's hash, so no customer ever spans folds — the
    leakage-safe cross-validation split (a row-level split leaks
    entity-level signal across folds; hashing the group key is the
    stateless fix).  Fold populations are reported with id checksums
    so the driver hash-verifies the exact membership, and
    ``n_customers`` sums to the distinct-customer total — the
    partition property itself.

    Scale shape: the fold is a projection (md5-u32 mod k on the group
    key — no shuffle, no fitted state), and the report is one hash
    agg.  distinct-customer per fold is exact because fold is a
    FUNCTION of the customer key."""
    from end_end_data_pipeline__spark.plans.queries_llm import _md5_u32

    orders = lake.load_table(spark, "orders", sf_dir)
    folded = orders.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(13,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        (_md5_u32(F.col("o_custkey")) % 5).alias("fold"),
    )
    return (
        folded.groupBy(F.col("fold").cast("long").alias("fold"))
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
            F.sum("o_orderkey").cast("long").alias("orderkey_checksum"),
        )
        .orderBy("fold")
    )


@register(
    "cohort_ltv_curve",
    oracle="""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk
            FROM events GROUP BY user_id
        ),
        cohort_size AS (
            SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM firsts GROUP BY cohort_wk
        ),
        rev AS (
            SELECT f.cohort_wk,
                   CAST(date_diff('day', f.cohort_wk,
                                  date_trunc('week', e.ts)) / 7 AS INT)
                     AS age_wk,
                   CAST(SUM(CAST(CAST(e.value AS DECIMAL(13,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM events e JOIN firsts f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase'
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT cohort_wk, age_wk, cents,
                   CAST(SUM(cents) OVER (PARTITION BY cohort_wk
                                         ORDER BY age_wk) AS BIGINT)
                     AS cum_cents
            FROM rev
        )
        SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
               c.age_wk, s.n_users, c.cents, c.cum_cents,
               CAST(c.cum_cents // s.n_users AS BIGINT)
                 AS cum_cents_per_user
        FROM cum c JOIN cohort_size s ON c.cohort_wk = s.cohort_wk
        ORDER BY cohort_week, age_wk
    """,
    survey_ids=("A6", "W1", "J1"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase revenue per signup-week
    cohort by week-of-life, absolute and per-user — the growth-
    accounting artifact that shows whether newer cohorts monetize
    faster (the retention table's revenue twin).  Exact integer
    cents; per-user LTV is a fixed-point floor.

    Plan shape mirrors ``cohort_weekly_retention``: min-agg per user,
    join back on user_id, purchase-only hash agg to the (cohort, age)
    grid, then ONE cumulative window over the bounded grid (cohorts ×
    ages — weeks, not rows) and a broadcast cohort-size join."""
    events = lake.load_table(spark, "events", sf_dir)
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    cohort_size = firsts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_wk",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_wk"))
                / 7
            )
            .cast("int")
            .alias("age_wk"),
        )
        .agg(
            F.sum(
                (F.col("value").cast("decimal(13,2)") * 100).cast("bigint")
            )
            .cast("long")
            .alias("cents"),
        )
    )
    wc = (
        Window.partitionBy("cohort_wk")
        .orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.select(
        "cohort_wk",
        "age_wk",
        "cents",
        F.sum("cents").over(wc).cast("long").alias("cum_cents"),
    )
    return (
        cum.join(F.broadcast(cohort_size), "cohort_wk")
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            "age_wk",
            "n_users",
            "cents",
            "cum_cents",
            F.expr("CAST(cum_cents DIV n_users AS BIGINT)").alias(
                "cum_cents_per_user"
            ),
        )
        .orderBy("cohort_week", "age_wk")
    )


@register(
    "behavior_interarrival_burstiness",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev_ts
            FROM events
        ),
        gaps AS (
            SELECT user_id,
                   CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS g
            FROM seq WHERE prev_ts IS NOT NULL
        ),
        st AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(SUM(g) AS BIGINT) AS s,
                   CAST(SUM(g * g) AS BIGINT) AS s2
            FROM gaps GROUP BY user_id
            HAVING COUNT(*) >= 10 AND SUM(g) > 0
        )
        SELECT user_id, n_gaps,
               CAST(s // n_gaps AS BIGINT) AS mean_gap_sec,
               CAST((CAST(n_gaps AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s)
                    * 1000000
                    // ((n_gaps - 1) * CAST(s AS HUGEINT)) AS BIGINT)
                 AS fano_scaled
        FROM st
        ORDER BY fano_scaled DESC, user_id ASC
        LIMIT 25
    """,
    survey_ids=("W3", "A2", "O2"),
)
def behavior_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user inter-arrival burstiness: the Fano factor
    (variance-to-mean ratio) of the gaps between consecutive events,
    top-25 burstiest users — the bot/scripted-traffic detector (a
    Poisson-like human stream has Fano ≈ mean gap; machine-gun bursts
    followed by silence blow it up).

    Exact multiply-through: Fano = var/mean =
    (n·Σg² − S²)/((n−1)·S), carried in 128-bit integers (second-
    moment sums of second-scale gaps overflow 2⁶³ once ×10⁶ enters)
    with one fixed-point scale — no doubles, no variance
    intermediate.  Gap order is
    pinned by (ts, event_id) so duplicate timestamps can't flip the
    lag pairing between engines.

    Scale shape: ONE per-user lag window (partitions by the user key
    space), one hash agg of three exact moments, TakeOrdered final
    cut."""
    events = lake.load_table(spark, "events", sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "ts", F.lag("ts").over(wu).alias("prev_ts")
    )
    gaps = seq.filter(F.col("prev_ts").isNotNull()).select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
        )
        .cast("long")
        .alias("g"),
    )
    st = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("g").cast("long").alias("s"),
            F.sum(F.col("g") * F.col("g")).cast("long").alias("s2"),
        )
        .filter((F.col("n_gaps") >= 10) & (F.col("s") > 0))
    )
    return (
        st.select(
            "user_id",
            "n_gaps",
            F.expr("CAST(s DIV n_gaps AS BIGINT)").alias("mean_gap_sec"),
            F.expr(
                "CAST((CAST(n_gaps AS DECIMAL(38,0)) * s2"
                " - CAST(s AS DECIMAL(38,0)) * s) * 1000000"
                " DIV ((n_gaps - 1) * CAST(s AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("fano_scaled"),
        )
        .orderBy(F.col("fano_scaled").desc(), F.col("user_id").asc())
        .limit(25)
    )
