"""Audit / diagnostics catalog queries: Benford first-digit fraud
screening, market-concentration (HHI) indices, seasonal decomposition
and CUSUM changepoint detection over the daily event series, corpus
token-frequency quality scoring, directional association rules, an
equi-depth (ntile) histogram, sequence-gap (missing-id) detection,
and the duplicate-payment screen.

These are the controls/forensics layer a banking lakehouse runs over
the same facts the marts serve (the reference's schema declares the
CHECK constraints and status domains that imply an audit function —
reference ``docker/postgres/SCHEMA.sql:15,25`` money CHECKs,
``generator.py:49-54`` status distribution — but, like the dbt marts,
no such layer was ever built; SURVEY.md §0).

Cross-engine determinism (repo-wide recipe, see ``queries_analytics``
module docstring): every aggregate accumulates in exact BIGINT /
DECIMAL (order-independent), transcendental-free — the Benford
expectations log10(1 + 1/d) are *Python-precomputed double literals*
embedded identically in both engines, never evaluated engine-side —
and all follow-on arithmetic is the same scalar double expression
tree on both sides, hence bit-identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.plans.catalog import register
from end_end_data_pipeline__spark.sources import lake

# ---------------------------------------------------------------------------
# P7/A1: Benford first-digit audit of order totals
# ---------------------------------------------------------------------------

# Benford's law expectations, precomputed HERE so neither engine
# evaluates a log: P(d) = log10(1 + 1/d).
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}

_BENFORD_SQL_CASE = " ".join(
    f"WHEN {d} THEN CAST({_BENFORD[d]!r} AS DOUBLE)" for d in range(1, 10)
)


@register(
    "fraud_benford_digit_audit",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(
                       CAST(o_totalprice AS DECIMAL(13,2))) AS BIGINT)
                       AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders WHERE o_totalprice >= 1
        ),
        counted AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(COUNT(*) AS BIGINT)) OVER () AS n_total
            FROM digits GROUP BY digit
        )
        SELECT digit, n_orders,
               CAST(n_orders AS DOUBLE) / CAST(n_total AS DOUBLE)
                   AS observed_share,
               CASE digit {_BENFORD_SQL_CASE} END AS expected_share,
               (CAST(n_orders AS DOUBLE)
                - (CASE digit {_BENFORD_SQL_CASE} END)
                      * CAST(n_total AS DOUBLE))
               * (CAST(n_orders AS DOUBLE)
                - (CASE digit {_BENFORD_SQL_CASE} END)
                      * CAST(n_total AS DOUBLE))
               / ((CASE digit {_BENFORD_SQL_CASE} END)
                      * CAST(n_total AS DOUBLE)) AS chi2_cell
        FROM counted
    """,
    survey_ids=("P7", "A1", "F2"),
)
def fraud_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law — the classic fabricated-amounts fraud screen an
    auditor runs over a money column.  Reports per-digit counts,
    observed vs expected share, and the chi-square cell each digit
    contributes (per-cell so the hash check stays order-independent).

    Determinism: the leading digit is extracted *lexically* (decimal →
    bigint → string → first char), never via log10; the Benford
    expectations are Python-precomputed literals identical in both
    plans.  Sub-unit and non-positive amounts are excluded up front
    (identically on both sides): Benford's first-significant-digit
    law needs the fractional-magnitude walk, and a 0.50 total would
    otherwise produce digit 0 with no expectation — silently
    deflating every real digit's share.  Production note: route the
    excluded rows to their own screen rather than this one.  Plan:
    one scan, one 9-key hash agg (map-side combinable), a window over
    9 rows for the total — at 100 TB the shuffle carries nine
    numbers.
    """
    orders = lake.load_table(spark, "orders", sf_dir).filter(
        F.col("o_totalprice") >= 1
    )
    digit = F.substring(
        F.floor(F.col("o_totalprice").cast("decimal(13,2)"))
        .cast("bigint")
        .cast("string"),
        1,
        1,
    ).cast("int")
    counted = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("n_total", F.sum("n_orders").over(Window.partitionBy()))
    )
    expected = F.lit(None).cast("double")
    for d in range(1, 10):
        expected = F.when(F.col("digit") == d, F.lit(_BENFORD[d])).otherwise(
            expected
        )
    nd = F.col("n_orders").cast("double")
    totd = F.col("n_total").cast("double")
    dev = nd - expected * totd
    return counted.select(
        "digit",
        "n_orders",
        (nd / totd).alias("observed_share"),
        expected.alias("expected_share"),
        (dev * dev / (expected * totd)).alias("chi2_cell"),
    )


# ---------------------------------------------------------------------------
# A2/A3: Herfindahl–Hirschman market concentration per nation
# ---------------------------------------------------------------------------


@register(
    "market_hhi_concentration",
    oracle="""
        WITH rev AS (
            SELECT n_name AS nation, l_suppkey,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(25,6))) * 10000 AS BIGINT)
                       AS units
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        ),
        m AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   SUM(CAST(units AS HUGEINT)) AS total_units,
                   SUM(CAST(units AS HUGEINT) * CAST(units AS HUGEINT))
                       AS ssq,
                   MAX(units) AS max_units
            FROM rev GROUP BY nation
        )
        SELECT nation, n_suppliers,
               CAST(total_units AS DOUBLE) / 10000.0 AS total_revenue,
               CAST(ssq AS DOUBLE)
                   / (CAST(total_units AS DOUBLE)
                      * CAST(total_units AS DOUBLE)) AS hhi,
               CAST(max_units AS DOUBLE) / CAST(total_units AS DOUBLE)
                   AS top_supplier_share
        FROM m
    """,
    survey_ids=("A2", "A3", "J5"),
)
def market_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue
    within each nation (HHI = Σ share², 1/n .. 1), plus the top
    supplier's share — the antitrust/counterparty-concentration risk
    metric over the supply market.

    Numerics: per-supplier revenue collapses to exact integer
    *ten-thousandths* (the 4-dp product l_extendedprice·(1−discount)
    is exactly representable at DECIMAL(25,6), so ×10⁴ is an exact
    BIGINT); Σunits and Σunits² accumulate in DECIMAL(38,0)/HUGEINT —
    order-independent — and HHI is one double division, so
    Σshare² = Σunits² / (Σunits)² without ever summing doubles.

    Plan: fact scan → hash agg on (nation, supplier) with both dims
    broadcast, then a second tiny agg on nation.  Map-side combinable
    throughout; the shuffle carries one row per (nation, supplier).
    """
    lineitem = lake.load_table(spark, "lineitem", sf_dir)
    supplier = lake.load_table(spark, "supplier", sf_dir)
    nation = lake.load_table(spark, "nation", sf_dir)
    rev = (
        lineitem.join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(25,6)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("units")
        )
    )
    units_dec = F.col("units").cast("decimal(38,0)")
    m = rev.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(units_dec).alias("total_units"),
        F.sum(units_dec * units_dec).alias("ssq"),
        F.max("units").alias("max_units"),
    )
    tot = F.col("total_units").cast("double")
    return m.select(
        "nation",
        "n_suppliers",
        (tot / F.lit(10000.0)).alias("total_revenue"),
        (F.col("ssq").cast("double") / (tot * tot)).alias("hhi"),
        (F.col("max_units").cast("double") / tot).alias("top_supplier_share"),
    )


# ---------------------------------------------------------------------------
# W4/A6: classical seasonal decomposition of the daily event volume
# ---------------------------------------------------------------------------

# Day-of-week anchor: 1995-01-02 is a Monday, so dow 0 = Monday on
# both engines via the same integer datediff-mod-7 (neither engine's
# native dayofweek is used — their week-start conventions differ).
_DOW_ANCHOR = "1995-01-02"


@register(
    "timeseries_seasonal_decompose",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   CAST(date_diff('day', DATE '{_DOW_ANCHOR}',
                                  CAST(ts AS DATE)) % 7 AS INT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2, 3
        ),
        win AS (
            SELECT event_type, day, dow, n,
                   SUM(n) OVER w AS w7,
                   CAST(COUNT(*) OVER w AS INT) AS w_cnt
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        seas AS (
            SELECT event_type, dow,
                   SUM(7 * n - w7) AS s_dev,
                   CAST(COUNT(*) AS BIGINT) AS n_full
            FROM win WHERE w_cnt = 7
            GROUP BY 1, 2
        )
        SELECT w.event_type, w.day, w.dow, w.n AS n_events,
               CASE WHEN w.w_cnt = 7
                    THEN CAST(w.w7 AS DOUBLE) / 7.0 END AS trend,
               CAST(s.s_dev AS DOUBLE) / (7.0 * CAST(s.n_full AS DOUBLE))
                   AS seasonal,
               CASE WHEN w.w_cnt = 7 THEN
                   CAST(w.n AS DOUBLE) - CAST(w.w7 AS DOUBLE) / 7.0
                   - CAST(s.s_dev AS DOUBLE)
                         / (7.0 * CAST(s.n_full AS DOUBLE))
               END AS remainder
        FROM win w JOIN seas s
          ON w.event_type = s.event_type AND w.dow = s.dow
    """,
    survey_ids=("W4", "A6", "F6"),
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the per-type daily event
    volume: trend = centered 7-day moving average, seasonal = mean
    detrended deviation per day-of-week, remainder = the rest — the
    'is Monday always like this, or is something wrong?' series
    diagnostic (identity n = trend + seasonal + remainder holds
    exactly on every full-window day; proven in tests/test_audit.py).

    The 7-row centered window assumes a GAP-FREE daily series (a
    missing calendar day would make the frame span 8 days and bias
    the dow alignment) — on sparse series compose with
    ``timeseries_gap_fill_daily`` (zero-fill) first; the fixture
    series is dense.

    Determinism: the seasonal means come from Σ(7·n − w7) — an exact
    BIGINT in both engines because the ×7 clears the division — with
    ONE double division at the end; day-of-week is an integer
    datediff-mod-7 from a Monday anchor, never the engines'
    (different) native dayofweek.  Plan: hash agg to days, a window
    over the downsampled per-type series, a tiny per-(type, dow) agg
    joined back broadcast-size.
    """
    events = lake.load_table(spark, "events", sf_dir)
    day_date = F.to_date("ts")
    daily = events.groupBy(
        "event_type",
        F.date_format(day_date, "yyyy-MM-dd").alias("day"),
        (F.datediff(day_date, F.to_date(F.lit(_DOW_ANCHOR))) % 7)
        .cast("int")
        .alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "event_type",
        "day",
        "dow",
        "n",
        F.sum("n").over(w).alias("w7"),
        F.count(F.lit(1)).over(w).cast("int").alias("w_cnt"),
    )
    seas = (
        win.filter(F.col("w_cnt") == 7)
        .groupBy("event_type", "dow")
        .agg(
            F.sum(7 * F.col("n") - F.col("w7")).alias("s_dev"),
            F.count(F.lit(1)).alias("n_full"),
        )
    )
    seasonal = F.col("s_dev").cast("double") / (
        F.lit(7.0) * F.col("n_full").cast("double")
    )
    trend = F.when(
        F.col("w_cnt") == 7, F.col("w7").cast("double") / F.lit(7.0)
    )
    return (
        win.join(F.broadcast(seas), ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            "dow",
            F.col("n").alias("n_events"),
            trend.alias("trend"),
            seasonal.alias("seasonal"),
            F.when(
                F.col("w_cnt") == 7,
                F.col("n").cast("double")
                - F.col("w7").cast("double") / F.lit(7.0)
                - seasonal,
            ).alias("remainder"),
        )
    )


# ---------------------------------------------------------------------------
# W1/A6: CUSUM changepoint detection on the daily event series
# ---------------------------------------------------------------------------


@register(
    "timeseries_cusum_changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, day, n,
                   SUM(n) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS run,
                   CAST(row_number() OVER (PARTITION BY event_type
                                           ORDER BY day) AS BIGINT) AS k,
                   SUM(n) OVER (PARTITION BY event_type) AS s,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n_days
            FROM daily
        ),
        scored AS (
            SELECT event_type, day, n, n_days,
                   n_days * run - k * s AS cusum_num
            FROM cum
        )
        SELECT event_type, day, n AS n_events,
               CAST(cusum_num AS DOUBLE) / CAST(n_days AS DOUBLE) AS cusum,
               abs(cusum_num) = MAX(abs(cusum_num))
                   OVER (PARTITION BY event_type)
               AND MAX(abs(cusum_num)) OVER (PARTITION BY event_type) > 0
                   AS is_changepoint
        FROM scored
    """,
    survey_ids=("W1", "A6", "W2"),
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the per-type daily event volume:
    the cumulative deviation from the series mean, C_k = Σ_{i≤k}(n_i −
    mean), peaks at the most likely level-shift point (flagged per
    type) — the drift detector behind 'did traffic change regime on
    this day?'.  C_N ≡ 0 by construction (proven in
    tests/test_audit.py).

    Determinism: C_k is computed as the exact integer N·run_k − k·S
    (multiplying through by N clears the mean's division), one double
    division at the end; the peak flag compares exact integers.  A
    perfectly flat series has C_k ≡ 0 everywhere — the max>0 guard
    keeps it (and the forced-zero C_N endpoint) from flagging every
    day; genuine equal peaks intentionally all flag (ties are real
    candidates, pick by day downstream if one is needed).
    Plan: hash agg to days, then two window passes over the
    downsampled per-type series — thousands of rows per year of data
    regardless of source scale.
    """
    events = lake.load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "run"
        ),
        F.row_number().over(w_ord).cast("bigint").alias("k"),
        F.sum("n").over(w_all).alias("s"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_days"),
    )
    scored = cum.select(
        "event_type",
        "day",
        "n",
        "n_days",
        (F.col("n_days") * F.col("run") - F.col("k") * F.col("s")).alias(
            "cusum_num"
        ),
    )
    return scored.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        (F.col("cusum_num").cast("double") / F.col("n_days").cast("double")).alias(
            "cusum"
        ),
        (
            (
                F.abs(F.col("cusum_num"))
                == F.max(F.abs(F.col("cusum_num"))).over(
                    Window.partitionBy("event_type")
                )
            )
            & (
                F.max(F.abs(F.col("cusum_num"))).over(
                    Window.partitionBy("event_type")
                )
                > 0
            )
        ).alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# UD5/F4: token-frequency quality scoring (log-free LM-quality proxy)
# ---------------------------------------------------------------------------

_RARE_MAX_COUNT = 3  # corpus count below which a token is 'rare'


@register(
    "text_token_frequency_quality",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   lower(unnest(string_split(trim(text), ' '))) AS term
            FROM documents
        ),
        tc AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY term
        ),
        per_doc AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN tc.c < {_RARE_MAX_COUNT}
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
                   SUM(tc.c) AS sum_c
            FROM tok t JOIN tc ON t.term = tc.term
            GROUP BY t.doc_id
        )
        SELECT doc_id, n_tokens, n_rare,
               CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                   AS rare_frac,
               CAST(sum_c AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                   AS mean_token_count
        FROM per_doc
    """,
    survey_ids=("UD5", "F4", "A2"),
)
def text_token_frequency_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-frequency quality score: the fraction of
    tokens that are corpus-rare (count < 3) and the mean corpus count
    of the document's tokens — the log-free stand-in for LM-perplexity
    filtering (CCNet-style): gibberish and OCR noise score high
    rare_frac / low mean count, boilerplate scores the opposite.
    Transcendental-free by design: corpus counts stay exact BIGINTs
    and each score is one double division (a true log-prob would
    hash-diverge across engines' libm).

    Plan: one tokenize pass (split + explode, a Generate per doc),
    one hash agg for the vocabulary, then vocab⋈tokens hash join —
    the build side is unique per term, so Zipf-hot probe keys fan out
    rows 1:1 without row explosion — and a per-doc agg.  Everything
    map-side combinable; no all-pairs anywhere.
    """
    docs = lake.load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("raw"),
    ).select("doc_id", F.lower(F.col("raw")).alias("term"))
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        tok.join(tc, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("c") < _RARE_MAX_COUNT, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rare"),
            F.sum("c").alias("sum_c"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_rare",
        (
            F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")
        ).alias("rare_frac"),
        (
            F.col("sum_c").cast("double") / F.col("n_tokens").cast("double")
        ).alias("mean_token_count"),
    )


# ---------------------------------------------------------------------------
# J3/A5: directional association rules (confidence + lift)
# ---------------------------------------------------------------------------

# the same semantic threshold as the symmetric pair query — imported,
# not re-declared, so tuning one keeps the two consistent
from end_end_data_pipeline__spark.plans.queries_stats import (  # noqa: E402
    _MIN_PAIR_SUPPORT as _RULE_MIN_PAIR,
)


@register(
    "assoc_rules_brand_confidence",
    oracle=f"""
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS o, p_brand AS b
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
        bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM ob GROUP BY b),
        rules AS (
            SELECT a.b AS antecedent, c.b AS consequent,
                   CAST(COUNT(*) AS BIGINT) AS n_pair
            FROM ob a JOIN ob c ON a.o = c.o AND a.b <> c.b
            GROUP BY 1, 2
            HAVING COUNT(*) >= {_RULE_MIN_PAIR}
        )
        SELECT antecedent, consequent, n_pair,
               CAST(n_pair AS DOUBLE) / CAST(ba.nb AS DOUBLE) AS confidence,
               CAST(n_pair AS DOUBLE) / CAST(n.n_orders AS DOUBLE)
                   AS support,
               (CAST(n_pair AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
                   / (CAST(ba.nb AS DOUBLE) * CAST(bb.nb AS DOUBLE)) AS lift
        FROM rules
        CROSS JOIN n
        JOIN bc ba ON ba.b = rules.antecedent
        JOIN bc bb ON bb.b = rules.consequent
    """,
    survey_ids=("J3", "A5", "A1"),
)
def assoc_rules_brand_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over order-line brand
    co-occurrence: antecedent → consequent with confidence
    (P(consequent | antecedent)), support, and lift — the
    recommendation rule-mining step one level up from
    ``market_basket_brand_pairs`` (whose symmetric-pair plan notes
    apply: apriori-pruned distinct (order, brand) frame, per-order m²
    fan-out, never all-pairs across orders).  Each unordered pair
    yields both directions; only confidence differs between them,
    which is the point of mining rules rather than pairs.
    """
    lineitem = lake.load_table(spark, "lineitem", sf_dir)
    part = lake.load_table(spark, "part", sf_dir)
    ob = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_orders = ob.select("o").distinct().count()
    bc = ob.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    a, c = ob.alias("a"), ob.alias("c")
    rules = (
        a.join(c, (F.col("a.o") == F.col("c.o")) & (F.col("a.b") != F.col("c.b")))
        .groupBy(
            F.col("a.b").alias("antecedent"), F.col("c.b").alias("consequent")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _RULE_MIN_PAIR)
    )
    ba = bc.select(F.col("b").alias("antecedent"), F.col("nb").alias("na"))
    bb = bc.select(F.col("b").alias("consequent"), F.col("nb").alias("nbb"))
    nd = F.lit(float(n_orders))
    return (
        rules.join(F.broadcast(ba), "antecedent")
        .join(F.broadcast(bb), "consequent")
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            (F.col("n_pair").cast("double") / F.col("na").cast("double")).alias(
                "confidence"
            ),
            (F.col("n_pair").cast("double") / nd).alias("support"),
            (
                (F.col("n_pair").cast("double") * nd)
                / (F.col("na").cast("double") * F.col("nbb").cast("double"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# A8/W2: equi-depth histogram (ntile buckets)
# ---------------------------------------------------------------------------

_EQUIDEPTH_BUCKETS = 10


@register(
    "histogram_equidepth_order_value",
    oracle=f"""
        WITH cents AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT)
                       AS xc
            FROM orders
        ),
        tiled AS (
            SELECT xc,
                   ntile({_EQUIDEPTH_BUCKETS})
                       OVER (ORDER BY xc, o_orderkey) AS bucket
            FROM cents
        )
        SELECT CAST(bucket AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(xc) AS DOUBLE) / 100.0 AS lo_value,
               CAST(MAX(xc) AS DOUBLE) / 100.0 AS hi_value,
               CAST(SUM(CAST(xc AS HUGEINT)) AS DOUBLE) / 100.0
                   AS bucket_value
        FROM tiled GROUP BY bucket
    """,
    survey_ids=("A8", "W2"),
)
def histogram_equidepth_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order value in 10 ntile
    buckets — the complement of the fixed-width
    ``histogram_order_value``: bucket BOUNDARIES adapt to the data, so
    each holds ~n/10 rows regardless of skew; the [lo, hi] per bucket
    IS the decile boundary list a range-partitioner or a CBO histogram
    would use.  ntile over a total order (value, key) is exact and
    engine-identical (first n mod b buckets take one extra row).

    Plan (rewired in r07 — VERDICT r06 "What's wrong" #2): the exact
    population cut runs through ``operators/scale.global_ntile`` —
    range-partition on (xc, o_orderkey), per-partition counts, driver
    prefix offsets as plan literals, local row_number + the arithmetic
    ntile formula — bit-identical buckets to the window ``ntile`` with
    NO single-task sort of the fact table.  (An APPROXIMATE histogram
    would sample instead — ``repartitionByRange``'s sketch or
    approx_percentile — but exact boundaries are this query's
    contract.)
    """
    from end_end_data_pipeline__spark.operators.scale import global_ntile

    orders = lake.load_table(spark, "orders", sf_dir)
    cents = orders.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(13,2)") * 100)
        .cast("bigint")
        .alias("xc"),
    )
    tiled = global_ntile(
        cents, ["xc", "o_orderkey"], _EQUIDEPTH_BUCKETS
    ).select("xc", "bucket")
    return tiled.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.min("xc").cast("double") / F.lit(100.0)).alias("lo_value"),
        (F.max("xc").cast("double") / F.lit(100.0)).alias("hi_value"),
        (
            F.sum(F.col("xc").cast("decimal(38,0)")).cast("double")
            / F.lit(100.0)
        ).alias("bucket_value"),
    )


# ---------------------------------------------------------------------------
# P7/W3: sequence-gap detection (missing ids) — two-level, no global sort
# ---------------------------------------------------------------------------

_GAP_BUCKET = 100_000  # ids per bucket; boundary gaps handled separately


@register(
    "integrity_sequence_gaps",
    oracle=f"""
        WITH keyed AS (
            SELECT o_orderkey AS id, o_orderkey // {_GAP_BUCKET} AS b
            FROM orders
        ),
        intra AS (
            SELECT id + 1 AS gap_start, nxt - 1 AS gap_end
            FROM (
                SELECT id, lead(id) OVER (PARTITION BY b ORDER BY id) AS nxt
                FROM keyed
            ) WHERE nxt > id + 1
        ),
        bounds AS (
            SELECT b, MIN(id) AS mn, MAX(id) AS mx FROM keyed GROUP BY b
        ),
        inter AS (
            SELECT mx + 1 AS gap_start, nxt_mn - 1 AS gap_end
            FROM (
                SELECT mx, lead(mn) OVER (ORDER BY b) AS nxt_mn
                FROM bounds
            ) WHERE nxt_mn > mx + 1
        )
        SELECT gap_start, gap_end,
               CAST(gap_end - gap_start + 1 AS BIGINT) AS n_missing
        FROM (SELECT * FROM intra UNION ALL SELECT * FROM inter)
    """,
    survey_ids=("P7", "W3", "U1"),
)
def integrity_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id ranges in the order key sequence — the classic
    completeness audit over an auto-increment key (a gap in invoice /
    transaction numbers is a deletion or a loss; the reference's
    SERIAL PKs, ``SCHEMA.sql:3,12,22``, imply exactly this check).

    Two-level so there is NO global sort: lead() within id-range
    BUCKETS finds intra-bucket gaps in parallel (id div 100k — ranges,
    not hashes, so in-bucket adjacency is real adjacency), then a
    tiny per-bucket (min, max) frame — one row per NON-EMPTY bucket —
    is scanned once for cross-boundary gaps (consecutive present
    buckets pair up even across empty buckets).  At 100 TB the global
    window runs over the bucket SUMMARY, never the fact table.
    """
    orders = lake.load_table(spark, "orders", sf_dir)
    keyed = orders.select(
        F.col("o_orderkey").alias("id"),
        F.expr(f"o_orderkey div {_GAP_BUCKET}").alias("b"),
    )
    w_intra = Window.partitionBy("b").orderBy("id")
    intra = (
        keyed.withColumn("nxt", F.lead("id").over(w_intra))
        .filter(F.col("nxt") > F.col("id") + 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
        )
    )
    bounds = keyed.groupBy("b").agg(
        F.min("id").alias("mn"), F.max("id").alias("mx")
    )
    w_inter = Window.orderBy("b")
    inter = (
        bounds.withColumn("nxt_mn", F.lead("mn").over(w_inter))
        .filter(F.col("nxt_mn") > F.col("mx") + 1)
        .select(
            (F.col("mx") + 1).alias("gap_start"),
            (F.col("nxt_mn") - 1).alias("gap_end"),
        )
    )
    return intra.unionByName(inter).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1)
        .cast("bigint")
        .alias("n_missing"),
    )


# ---------------------------------------------------------------------------
# P7/W3: duplicate-payment screen (same payer, same amount, close dates)
# ---------------------------------------------------------------------------

_DUP_WINDOW_DAYS = 3


@register(
    "fraud_duplicate_payments",
    oracle=f"""
        WITH keyed AS (
            SELECT o_orderkey, o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT)
                       AS xc,
                   CAST(o_orderdate AS DATE) AS d
            FROM orders
        ),
        lagged AS (
            SELECT o_orderkey, o_custkey, xc, d,
                   lag(d) OVER (PARTITION BY o_custkey, xc
                                ORDER BY d, o_orderkey) AS prev_d
            FROM keyed
        )
        SELECT o_orderkey, o_custkey,
               CAST(xc AS DOUBLE) / 100.0 AS amount,
               strftime(d, '%Y-%m-%d') AS order_date,
               CAST(date_diff('day', prev_d, d) AS INT) AS days_since_prev
        FROM lagged
        WHERE prev_d IS NOT NULL
          AND date_diff('day', prev_d, d) <= {_DUP_WINDOW_DAYS}
    """,
    survey_ids=("P7", "W3", "A3"),
)
def fraud_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential duplicate payments: a second order by the SAME
    customer for the EXACT same amount within 3 days of the previous
    one — the standard accounts-payable double-charge screen (exact
    amount in integer cents, so float fuzz can't hide or invent a
    match).

    Plan: one lag() window partitioned by the (customer, amount-cents)
    composite — high-cardinality, so the sort parallelizes across
    thousands of tasks (the opposite regime from the robust-stats
    windows); each partition is a handful of rows.  Everything integer
    until the display division.
    """
    orders = lake.load_table(spark, "orders", sf_dir)
    keyed = orders.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(13,2)") * 100)
        .cast("bigint")
        .alias("xc"),
        F.to_date("o_orderdate").alias("d"),
    )
    w = Window.partitionBy("o_custkey", "xc").orderBy("d", "o_orderkey")
    lagged = keyed.withColumn("prev_d", F.lag("d").over(w))
    return lagged.filter(
        F.col("prev_d").isNotNull()
        & (F.datediff(F.col("d"), F.col("prev_d")) <= _DUP_WINDOW_DAYS)
    ).select(
        "o_orderkey",
        "o_custkey",
        (F.col("xc").cast("double") / F.lit(100.0)).alias("amount"),
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        F.datediff(F.col("d"), F.col("prev_d")).cast("int").alias(
            "days_since_prev"
        ),
    )


# ---------------------------------------------------------------------------
# P7/A5: round-number amount bias (psychological-pricing / fabrication)
# ---------------------------------------------------------------------------


@register(
    "fraud_round_number_bias",
    oracle="""
        WITH cents AS (
            SELECT o_orderpriority AS pri,
                   CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT)
                       AS xc
            FROM orders
        )
        SELECT pri AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN xc % 100 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_whole_dollar,
               CAST(SUM(CASE WHEN xc % 10000 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_whole_hundred,
               CAST(SUM(CASE WHEN xc % 100 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS whole_dollar_share,
               CAST(SUM(CASE WHEN xc % 100 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 0.01) AS whole_dollar_lift
        FROM cents GROUP BY pri
    """,
    survey_ids=("P7", "A5", "A1"),
)
def fraud_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number bias screen per priority: how many order totals
    land on whole dollars / whole hundreds, and the lift of the
    whole-dollar rate over the 1% a uniform cents distribution
    predicts — invented amounts cluster on round numbers (the
    companion screen to Benford: Benford tests the LEADING digit,
    this tests the TRAILING ones).  Exact integer-cent modulo tests;
    one conditional hash agg, map-side combinable, two display
    divisions.
    """
    orders = lake.load_table(spark, "orders", sf_dir)
    cents = orders.select(
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_totalprice").cast("decimal(13,2)") * 100)
        .cast("bigint")
        .alias("xc"),
    )
    whole = F.sum(F.when(F.col("xc") % 100 == 0, 1).otherwise(0))
    return cents.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        whole.cast("bigint").alias("n_whole_dollar"),
        F.sum(F.when(F.col("xc") % 10000 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_whole_hundred"),
        (whole.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "whole_dollar_share"
        ),
        (
            whole.cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(0.01))
        ).alias("whole_dollar_lift"),
    )
