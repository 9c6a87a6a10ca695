"""Window-function catalog (SURVEY.md §2.5, W1-W6) and the as-of join
(J7) — phrased on the ``events`` stream table (user_id, ts) which maps
to the reference's per-account time series served by its
(account_id, created_at) index (reference ``SCHEMA.sql:31``).

Determinism notes for the oracle comparison:
- every window ORDER BY ends with ``event_id`` (unique) so frames are
  total-ordered;
- frames are spelled ROWS/RANGE explicitly on both sides (engines
  differ in default frames with peers);
- running double sums accumulate as exact decimals (see
  ``functions.scalar.dec_sum`` rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.operators import relational as R
from end_end_data_pipeline__spark.operators import sketches
from end_end_data_pipeline__spark.plans.catalog import register
from end_end_data_pipeline__spark.sources import lake

ACC = "decimal(25,6)"


@register(
    "window_running_total_per_user",
    oracle="""
        SELECT event_id, user_id, ts, value,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS event_seq
        FROM events
    """,
    survey_ids=("W1", "W2", "A9"),
    bench=True,
)
def window_running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance reconstruction (A9): cumulative value per user in
    event order.  One shuffle on user_id; WindowExec streams each user's
    rows — no per-group buffering beyond the frame."""
    events = lake.load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(F.col("value").cast(ACC)).over(frame).cast("double").alias("running_total"),
        F.row_number().over(w).alias("event_seq"),
    )


@register(
    "window_lag_event_gap",
    oracle="""
        SELECT event_id, user_id, ts,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    """,
    survey_ids=("W3",),
)
def window_lag_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user (lag) — the inter-transaction-gap
    analysis implied by the reference's time-series index."""
    events = lake.load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "window_moving_avg_7d",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
                 / COUNT(value) OVER w AS avg_7d,
               COUNT(value) OVER w AS n_7d
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
    survey_ids=("W4",),
)
def window_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding average spend per user — RANGE frame over the
    epoch-micros ordering (event-time sliding window, W4)."""
    events = lake.load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(F.col("value").cast(ACC)).over(w).cast("double") / F.count("value").over(w)).alias(
            "avg_7d"
        ),
        F.count("value").over(w).alias("n_7d"),
    )


@register(
    "window_rank_customers_in_segment",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               rank() OVER w AS bal_rank,
               dense_rank() OVER w AS bal_dense_rank,
               ntile(4) OVER w AS bal_quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    survey_ids=("W2", "W5"),
)
def window_rank_customers_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value ranking + quartiles within segment (W2/W5)."""
    customer = lake.load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@register(
    "window_last_purchase_value",
    oracle="""
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_purchase_value
        FROM events
    """,
    survey_ids=("W6", "J7"),
)
def window_last_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of forward-fill (W6): most recent purchase value visible at each
    event — ``last(..., ignorenulls)`` over an unbounded-preceding frame."""
    events = lake.load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
        ).over(w).alias("last_purchase_value"),
    )


@register(
    "asof_click_before_purchase",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts,
               c.ts AS asof_ts, c.click_id AS asof_click_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (
              SELECT user_id, ts, MAX(event_id) AS click_id
              FROM events WHERE event_type = 'click'
              GROUP BY user_id, ts) c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    survey_ids=("J7",),
    bench=True,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    prior-or-simultaneous click (``operators.relational.asof_join`` —
    union + ordered window, one shuffle, no range explosion).  The
    click side is pre-deduped to one row per (user, ts) so the match is
    deterministic; oracle is DuckDB's native ASOF LEFT JOIN."""
    events = lake.load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    return R.asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        right_value_cols=["click_id"],
    )


@register(
    "timeseries_gap_fill_daily",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   COUNT(*) AS n_events,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
                       AS total_value
            FROM events GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
        ),
        cal AS (
            SELECT user_id,
                   CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                        AS DATE) AS d
            FROM spans
        ),
        dense AS (
            SELECT c.user_id, c.d, y.n_events, y.total_value
            FROM cal c LEFT JOIN daily y USING (user_id, d)
        )
        SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
               COALESCE(n_events, 0) AS n_events,
               COALESCE(total_value, 0.0) AS total_value,
               LAST_VALUE(total_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS carried_value,
               (n_events IS NULL) AS is_gap
        FROM dense
    """,
    survey_ids=("A6", "W6", "F6"),
)
def timeseries_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily activity series per user: silent days inside a
    user's active span become explicit rows — flagged ``is_gap``,
    additive measures zero-filled, and the day's total carried forward
    LOCF (``operators.timeseries.gap_fill``) — the regularization the
    reference's arrival-keyed daily marts silently lack (reference
    ``consumer/consumer.py:45-48``).  Dates emitted as strings (DATE
    cells compare engine-differently in the harness)."""
    from end_end_data_pipeline__spark.functions.scalar import dec_sum
    from end_end_data_pipeline__spark.operators import timeseries

    events = lake.load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.count("*").alias("n_events"),
        dec_sum("value", "total_value"),
    ).withColumn("carried_value", F.col("total_value"))
    filled = timeseries.gap_fill(
        daily,
        group_cols=["user_id"],
        date_col="d",
        zero_fill={"n_events": 0, "total_value": 0.0},
        locf_cols=["carried_value"],
    )
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_events",
        "total_value",
        "carried_value",
        "is_gap",
    )


# ---------------------------------------------------------------------------
# Count-min sketch (round 6) — mergeable frequency estimation (A4 family)
# ---------------------------------------------------------------------------


@register(
    "sketch_countmin_user_counts",
    oracle="""
        WITH cells AS (
            SELECT d.j,
                   CAST(('0x' || substr(md5(CAST(d.j AS VARCHAR) || '|'
                         || CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT
                        % 128 AS INTEGER) AS cell,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events e
            CROSS JOIN (SELECT unnest(range(0, 4)) AS j) d
            GROUP BY 1, 2
        ),
        top20 AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
            FROM events GROUP BY 1
            ORDER BY exact_cnt DESC, user_id LIMIT 20
        ),
        est AS (
            SELECT t.user_id, MIN(c.cnt) AS cms_est
            FROM top20 t
            JOIN cells c
              ON c.cell = CAST(('0x' || substr(md5(CAST(c.j AS VARCHAR)
                    || '|' || CAST(t.user_id AS VARCHAR)), 1, 8))::BIGINT
                    % 128 AS INTEGER)
            GROUP BY 1
        )
        SELECT t.user_id, t.exact_cnt, e.cms_est,
               e.cms_est - t.exact_cnt AS overcount
        FROM top20 t JOIN est e USING (user_id)
    """,
    survey_ids=("A4", "F4", "A10"),
)
def sketch_countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 128) over the event stream's
    user_id, point-estimated for the 20 most-active users next to
    their exact counts — ``overcount >= 0`` is the CMS one-sided error
    guarantee, visible per row.  The sketch build is one explode +
    hash agg whose partials combine map-side into <= d x w cells per
    task, and sketches MERGE by cell-wise addition
    (``operators/sketches.cms_merge``, exercised in
    tests/test_llm_ops.py), so per-day or per-partition sketches
    compose without re-reading data — the 100 TB path for "how often
    did X appear" questions.  Hashing is the engine-stable md5-u32
    recipe, so the DuckDB oracle replays the exact counter grid and
    estimates match bit-for-bit."""
    from end_end_data_pipeline__spark.operators import sketches

    events = lake.load_table(spark, "events", sf_dir)
    sk = sketches.cms_build(events, "user_id", depth=4, width=128)
    top20 = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(20)
    )
    est = sketches.cms_estimate(
        sk, top20.select("user_id"), "user_id", depth=4, width=128
    )
    return top20.join(est, "user_id").select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


@register(
    "sketch_bloom_membership",
    oracle="""
        WITH bkeys AS (
            SELECT DISTINCT o_custkey AS k FROM orders
        ),
        bits AS (
            SELECT DISTINCT
                   CAST(('0x' || substr(md5(CAST(d.j AS VARCHAR) || '|'
                         || CAST(b.k AS VARCHAR)), 1, 8))::BIGINT
                        % 4096 AS INTEGER) AS pos
            FROM bkeys b
            CROSS JOIN (SELECT unnest(range(0, 4)) AS j) d
        ),
        ppos AS (
            SELECT c.c_custkey AS k,
                   CAST(('0x' || substr(md5(CAST(d.j AS VARCHAR) || '|'
                         || CAST(c.c_custkey AS VARCHAR)), 1, 8))::BIGINT
                        % 4096 AS INTEGER) AS pos
            FROM customer c
            CROSS JOIN (SELECT unnest(range(0, 4)) AS j) d
        ),
        verdict AS (
            SELECT p.k, (COUNT(b.pos) = 4) AS bloom_member
            FROM ppos p LEFT JOIN bits b USING (pos)
            GROUP BY p.k
        ),
        joined AS (
            SELECT v.k, v.bloom_member,
                   (v.k IN (SELECT k FROM bkeys)) AS true_member
            FROM verdict v
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
               CAST(SUM(CASE WHEN true_member THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_true_members,
               CAST(SUM(CASE WHEN bloom_member THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bloom_positive,
               CAST(SUM(CASE WHEN bloom_member AND NOT true_member
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
               CAST(SUM(CASE WHEN true_member AND NOT bloom_member
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative
        FROM joined
    """,
    survey_ids=("A4", "F4", "J6"),
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (4096 bits x 4 hashes) built over the custkeys that
    appear in orders, probed with EVERY customer, and audited against
    the exact semi-join truth in one summary row: probe count, true
    members, bloom positives, false positives, and false negatives
    (zero by construction — the Bloom guarantee, hash-checked here).

    Why it earns a sketch-family slot at 100 TB: the filter is <= n_bits
    rows no matter the build input, built with one explode + map-side-
    combinable distinct, MERGES by union (``sketches.bloom_merge``),
    survives a parquet round-trip, and broadcast-prunes a huge probe
    side BEFORE its shuffle — the explicit, persistable form of the
    runtime bloom injection Spark already applies inside joins (which
    tests/test_plans.py plan-asserts separately).  md5-u32 positions
    make the DuckDB oracle replay the exact bit set."""
    from end_end_data_pipeline__spark.operators import sketches

    orders = lake.load_table(spark, "orders", sf_dir)
    cust = lake.load_table(spark, "customer", sf_dir)
    build = orders.select(F.col("o_custkey").alias("k"))
    bloom = sketches.bloom_build(build, "k", n_bits=4096, n_hashes=4)
    probe = cust.select(F.col("c_custkey").alias("k"))
    verdict = sketches.bloom_probe(bloom, probe, "k", n_bits=4096, n_hashes=4)
    truth = build.distinct().withColumn("__true", F.lit(1))
    joined = verdict.join(truth, "k", "left").select(
        "bloom_member", F.col("__true").isNotNull().alias("true_member")
    )
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum(F.when(F.col("true_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_members"),
        F.sum(F.when(F.col("bloom_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_positive"),
        F.sum(
            F.when(F.col("bloom_member") & ~F.col("true_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_positive"),
        F.sum(
            F.when(F.col("true_member") & ~F.col("bloom_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_negative"),
    )


@register(
    "sketch_hll_distinct_by_type",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                     AS u32
            FROM events WHERE user_id IS NOT NULL
        ),
        r AS (
            SELECT event_type, u32 % 256 AS idx,
                   CASE WHEN u32 // 256 = 0 THEN 25
                        ELSE 25 - length(ltrim(bin(u32 // 256), '0')) END AS rank
            FROM h
        ),
        regs AS (
            SELECT event_type, idx, MAX(rank) AS m FROM r GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type,
                   CAST(SUM(CAST(1 AS BIGINT) << (25 - m))
                        + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 25)
                        AS BIGINT) AS s_int,
                   CAST(256 - COUNT(*)
                        + SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zero_registers
            FROM regs GROUP BY 1
        ),
        est AS (
            SELECT event_type, n_zero_registers,
                   CASE WHEN n_zero_registers > 0
                         AND {sketches._HLL_NUM} // (1285395 * s_int) <= 640
                        THEN 256 * {sketches.hll_ln_table_sql()}
                               [CAST(n_zero_registers AS INT)] // 1000000
                        ELSE {sketches._HLL_NUM} // (1285395 * s_int)
                   END AS hll_estimate
            FROM s
        ),
        exact AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY 1
        )
        SELECT e.event_type, e.n_exact,
               CAST(x.hll_estimate AS BIGINT) AS hll_estimate,
               x.n_zero_registers,
               CAST(abs(x.hll_estimate - e.n_exact) * 1000000 // e.n_exact
                    AS BIGINT) AS rel_error_ppm
        FROM exact e JOIN est x USING (event_type)
    """,
    survey_ids=("A4", "F4", "A10"),
)
def sketch_hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit HyperLogLog registers (p=8, m=256) per event type, with
    the estimate audited against the exact distinct count — completing
    the mergeable-sketch triad (CMS frequency / Bloom membership / HLL
    cardinality).  Unlike ``approx_count_distinct`` (Spark's internal
    HLL++, estimate-only), the REGISTERS are first-class rows: they
    persist to parquet, merge by per-register MAX
    (``sketches.hll_merge``, exercised in tests), and the whole
    estimate — bias constant as the exact rational 923264/1285395
    multiplied through, harmonic sum as an integer sum of powers of
    two, small-range linear counting from a precomputed integer ln
    table — is BIGINT arithmetic end-to-end, so the DuckDB oracle
    replays it bit-for-bit.  Build is one map-side-combinable hash agg
    capped at m rows per group per task: the 100 TB shape for
    incremental distinct-count rollups."""
    from end_end_data_pipeline__spark.operators import sketches

    events = lake.load_table(spark, "events", sf_dir)
    regs = sketches.hll_build(events, "user_id", "event_type")
    est = sketches.hll_estimate(regs, "event_type")
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n_exact",
        "hll_estimate",
        "n_zero_registers",
        F.expr(
            "CAST(abs(hll_estimate - n_exact) * 1000000 DIV n_exact AS BIGINT)"
        ).alias("rel_error_ppm"),
    )


def _hll_est_case(s_int: str, n_zero: str) -> str:
    """See :func:`sketches.hll_estimate_sql` — one shared definition."""
    return sketches.hll_estimate_sql(s_int, n_zero)


@register(
    "sketch_hll_rolling_distinct",
    oracle=f"""
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS day, user_id FROM events
            WHERE user_id IS NOT NULL
        ),
        daily AS (
            SELECT day,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                     % 256 AS idx,
                   MAX(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                  1, 8))::BIGINT // 256 = 0 THEN 25
                        ELSE 25 - length(ltrim(bin(('0x' ||
                             substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                             // 256), '0')) END) AS m
            FROM ev GROUP BY 1, 2
        ),
        grid AS (
            SELECT d.day, datediff('day', DATE '1990-01-01', d.day) AS daynum,
                   i.idx
            FROM (SELECT DISTINCT day FROM ev) d,
                 (SELECT unnest(range(0, 256)) AS idx) i
        ),
        rolled AS (
            SELECT g.day, g.idx,
                   MAX(dl.m) OVER (
                       PARTITION BY g.idx ORDER BY g.daynum
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                   ) AS m
            FROM grid g LEFT JOIN daily dl
              ON dl.day = g.day AND dl.idx = g.idx
        ),
        s AS (
            SELECT day,
                   CAST(SUM(CAST(1 AS BIGINT) << (25 - m))
                        + (256 - COUNT(m)) * (CAST(1 AS BIGINT) << 25)
                        AS BIGINT) AS s_int,
                   CAST(256 - COUNT(m)
                        + SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zero
            FROM rolled GROUP BY day
        ),
        est AS (
            SELECT day, n_zero AS n_zero_registers,
                   {_hll_est_case("s_int", "n_zero")} AS hll_estimate
            FROM s
        ),
        pairs AS (SELECT DISTINCT day, user_id FROM ev),
        fan AS (
            SELECT day + (i.i * INTERVAL 1 DAY) AS tgt, user_id
            FROM pairs, (SELECT unnest(range(0, 7)) AS i) i
        ),
        exact AS (
            SELECT d.day, CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_exact
            FROM (SELECT DISTINCT day FROM ev) d
            JOIN fan f ON f.tgt = d.day
            GROUP BY d.day
        )
        SELECT strftime(e.day, '%Y-%m-%d') AS day, e.n_exact,
               CAST(x.hll_estimate AS BIGINT) AS hll_estimate,
               x.n_zero_registers,
               CAST(abs(x.hll_estimate - e.n_exact) * 1000000 // e.n_exact
                    AS BIGINT) AS rel_error_ppm
        FROM exact e JOIN est x USING (day)
    """,
    survey_ids=("A4", "A6", "A10", "W4"),
)
def sketch_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day WITHOUT re-deduplicating 7
    days of raw events per output day — the payoff of first-class HLL
    registers: build DAILY register rows once (one scan), then the
    rolling merge is a per-register MAX over a 6-day range window on
    the (days x 256) sketch grid — work proportional to days x m, not
    to data.  At 100 TB this turns an O(days x window-span) re-scan
    into one scan plus window algebra over a few KB of sketch rows per
    day; the same register rows persist and compose into any other
    window (weekly, monthly) for free.  Audited per day against the
    exact rolling distinct (7-way fan-out of distinct (day, user)
    pairs); estimates are the integer HLL pipeline, bit-replayed by
    the oracle."""
    from end_end_data_pipeline__spark.operators import sketches as sk

    events = lake.load_table(spark, "events", sf_dir)
    ev = events.filter(F.col("user_id").isNotNull()).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = sk.hll_build(ev, "user_id", "day")
    days = ev.select("day").distinct()
    grid = days.select(
        "day",
        F.datediff("day", F.lit("1990-01-01").cast("date")).alias("daynum"),
        F.explode(F.sequence(F.lit(0), F.lit(255))).alias("idx"),
    )
    rolled = (
        grid.join(daily, ["day", "idx"], "left")
        .select(
            "day",
            "idx",
            F.max("m")
            .over(
                Window.partitionBy("idx")
                .orderBy("daynum")
                .rangeBetween(-6, 0)
            )
            .alias("m"),
        )
        .filter(F.col("m").isNotNull())
    )
    est = sk.hll_estimate(rolled, "day")
    pairs = ev.distinct()
    fan = (
        pairs.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "day",
            "user_id",
        )
        .select(F.expr("date_add(day, i)").alias("tgt"), "user_id")
        .join(days.select(F.col("day").alias("tgt")), "tgt")
    )
    exact = fan.groupBy("tgt").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    ex, es = exact.alias("ex"), est.alias("es")
    return (
        ex.join(es, F.col("ex.tgt") == F.col("es.day"))
        .select(
            F.date_format(F.col("es.day"), "yyyy-MM-dd").alias("day"),
            "n_exact",
            "hll_estimate",
            "n_zero_registers",
            F.expr(
                "CAST(abs(hll_estimate - n_exact) * 1000000 DIV n_exact AS BIGINT)"
            ).alias("rel_error_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------

@register(
    "streaks_longest_active_run",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        grp AS (
            SELECT user_id, d,
                   date_diff('day', DATE '1990-01-01', d)
                     - row_number() OVER (PARTITION BY user_id ORDER BY d)
                     AS island
            FROM days
        ),
        islands AS (
            SELECT user_id, island,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(d) AS start_d
            FROM grp GROUP BY user_id, island
        ),
        best AS (
            SELECT user_id, len, start_d,
                   CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT)
                     AS n_active_days,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY len DESC, start_d ASC) AS rn
            FROM islands
        )
        SELECT user_id, n_active_days,
               len AS longest_streak,
               strftime(start_d, '%Y-%m-%d') AS streak_start
        FROM best WHERE rn = 1
        ORDER BY user_id
    """,
    survey_ids=("W2", "W1", "A6"),
)
def streaks_longest_active_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern (engagement scoring / habit metrics):
    distinct active days minus their per-user row_number is constant
    exactly while days are consecutive, so one window + one hash agg
    turns day rows into islands; the longest island (earliest start
    breaking ties) is each user's streak.

    Determinism: the island key is an INTEGER day ordinal difference
    (anchor-datediff minus rank — engine-identical), not engine date
    arithmetic; the winner is picked by (len DESC, start ASC) — a
    total order.

    Scale shape: distinct (user, day) is a map-side-combinable hash
    agg that bounds everything downstream at users × days; both
    windows partition by user_id (parallel across the user key
    space, never global)."""
    events = lake.load_table(spark, "events", sf_dir)
    days = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1990-01-01"))
            - F.row_number().over(wu)
        ).alias("island"),
    )
    islands = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("d").alias("start_d"),
    )
    wbest = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start_d").asc()
    )
    wsum = Window.partitionBy("user_id")
    best = islands.select(
        "user_id",
        "len",
        "start_d",
        F.sum("len").over(wsum).cast("long").alias("n_active_days"),
        F.row_number().over(wbest).alias("rn"),
    )
    return (
        best.filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_active_days",
            F.col("len").alias("longest_streak"),
            F.date_format("start_d", "yyyy-MM-dd").alias("streak_start"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Exact rolling 7-day median (order statistics in a sliding frame)
# ---------------------------------------------------------------------------

@register(
    "timeseries_rolling_median_7d",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        win AS (
            SELECT d, x,
                   list_sort(list(x) OVER (ORDER BY d
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS w
            FROM daily
        )
        SELECT strftime(d, '%Y-%m-%d') AS day, x AS cents,
               CAST(len(w) AS BIGINT) AS n_win,
               CAST(w[(len(w) + 1) // 2]
                    + w[len(w) // 2 + 1] AS BIGINT) AS med2_cents
        FROM win
        ORDER BY day
    """,
    survey_ids=("W4", "A8", "F12"),
)
def timeseries_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day median of daily order revenue — the
    outlier-robust smoother (a mean-based moving average chases every
    spike; the median window ignores them), i.e. order statistics
    inside a sliding frame, which no built-in windowed aggregate
    gives exactly.

    Exact-integer contract: the window's values are collected and
    sorted per frame, and the median is reported DOUBLED
    (``m_lo + m_hi``, = 2·middle for odd frames) so even frames never
    produce a fractional value — the repo's midpoint-median recipe.
    ``collect_list`` over a window has nondeterministic arrival
    order, so the frame array is ``array_sort``-ed before indexing —
    deterministic as a multiset.

    Scale shape: the frame rides the bounded daily spine (days, not
    raw rows; the expensive part at 100 TB is the map-side-combinable
    daily agg).  Frame width is a constant 7, so the per-row sort is
    O(1)."""
    orders = lake.load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(13,2)") * 100).cast(
                "bigint"
            )
        )
        .cast("long")
        .alias("x"),
    )
    w7 = Window.orderBy("d").rowsBetween(-6, 0)
    win = daily.select(
        "d",
        "x",
        F.array_sort(F.collect_list("x").over(w7)).alias("w"),
    )
    return win.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("cents"),
        F.size("w").cast("long").alias("n_win"),
        F.expr(
            "CAST(element_at(w, CAST((size(w) + 1) DIV 2 AS INT))"
            " + element_at(w, CAST(size(w) DIV 2 + 1 AS INT)) AS BIGINT)"
        ).alias("med2_cents"),
    ).orderBy("day")
