"""Scalar-function battery (SURVEY.md §2.8, F1-F13) — wide selects
exercising string, date, math, conditional, and JSON expressions with
cross-engine-identical semantics.

Deliberately excluded from oracle checks: ``round`` (Spark HALF_UP vs
engine-dependent), ``pow``/``exp`` (libm last-ulp divergence) — the
engine exposes them, but parity queries stick to correctly-rounded ops
(``sqrt``) and exact integer/decimal arithmetic.  The reference's
ROUND_DOWN money quantize is ``functions.scalar.round_down``
(floor-based, exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.plans.catalog import register
from end_end_data_pipeline__spark.sources import lake


@register(
    "functions_string_battery",
    oracle="""
        SELECT c_custkey,
               lower(c_name) AS name_lower,
               upper(c_mktsegment) AS seg_upper,
               substring(c_name, 1, 8) AS name_prefix,
               CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS id_from_name,
               length(c_name) AS name_len,
               md5(c_name) AS name_md5,
               concat_ws('.', lower(c_mktsegment), CAST(c_custkey AS VARCHAR),
                         'example.com') AS synth_email,
               replace(c_name, 'Customer#', 'C-') AS short_name,
               string_split(c_name, '#')[-1] AS name_suffix
        FROM customer
    """,
    survey_ids=("F1", "F2", "F3", "F4"),
)
def functions_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions F1-F4: case, substring, regex extract, hash,
    concat (the generator's email-synthesis patterns,
    reference ``generator.py:90-111``)."""
    customer = lake.load_table(spark, "customer", sf_dir)
    return customer.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("id_from_name"),
        F.length("c_name").alias("name_len"),
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.concat_ws(
            ".", F.lower("c_mktsegment"), F.col("c_custkey").cast("string"),
            F.lit("example.com"),
        ).alias("synth_email"),
        F.regexp_replace("c_name", "Customer#", "C-").alias("short_name"),
        F.element_at(F.split("c_name", "#"), -1).alias("name_suffix"),
    )


@register(
    "functions_datetime_battery",
    oracle="""
        SELECT event_id,
               CAST(year(ts) AS INT) AS y,
               CAST(month(ts) AS INT) AS m,
               CAST(day(ts) AS INT) AS d,
               CAST(hour(ts) AS INT) AS h,
               strftime(ts, '%Y-%m-%d') AS day_str,
               strftime(ts, '%Y-%m-%d %H:00') AS hour_str,
               CAST(ts AS DATE) + INTERVAL 7 DAY AS ts_plus_7d,
               date_trunc('hour', ts) AS hour_bucket,
               CASE WHEN hour(ts) BETWEEN 9 AND 17 THEN 1 ELSE 0 END AS business_hours,
               epoch_us(ts) AS ts_us
        FROM events
    """,
    survey_ids=("F5", "F6"),
)
def functions_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions F5-F6: parts, formatting, truncation,
    arithmetic, the generator's business-hours predicate
    (reference ``generator.py:154-157``)."""
    events = lake.load_table(spark, "events", sf_dir)
    return events.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour_str"),
        (F.to_date("ts") + F.expr("INTERVAL 7 DAY")).cast("timestamp").alias("ts_plus_7d"),
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        F.when(F.hour("ts").between(9, 17), 1).otherwise(0).alias("business_hours"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )


@register(
    "functions_math_json_battery",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
               CAST(floor(value) AS BIGINT) AS value_floor,
               CAST(ceil(value) AS BIGINT) AS value_ceil,
               abs(value - 50.0) AS dist_from_50,
               sqrt(abs(value)) AS value_sqrt,
               greatest(value, 1.0) AS clamped,
               least(value, 100.0) AS capped,
               floor(value * 100) / 100 AS round_down_2dp,
               CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS value_band,
               coalesce(nullif(event_type, 'view'), 'viewed') AS type_or_viewed
        FROM events
    """,
    survey_ids=("F7", "F8", "F10", "F11", "F13"),
)
def functions_math_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/JSON/conditional functions: JSON envelope access (the CDC
    surface, F10), ROUND_DOWN quantize (reference ``generator.py:78-80``,
    F7), greatest/least clamp (reference ``generator.py:292``, F8)."""
    events = lake.load_table(spark, "events", sf_dir)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.floor("value").alias("value_floor"),
        F.ceil("value").alias("value_ceil"),
        F.abs(F.col("value") - 50.0).alias("dist_from_50"),
        F.sqrt(F.abs("value")).alias("value_sqrt"),
        F.greatest(F.col("value"), F.lit(1.0)).alias("clamped"),
        F.least(F.col("value"), F.lit(100.0)).alias("capped"),
        (F.floor(F.col("value") * 100) / 100).alias("round_down_2dp"),
        F.when(F.col("value") >= 50, "high").otherwise("low").alias("value_band"),
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("viewed")).alias(
            "type_or_viewed"
        ),
    )


@register(
    "functions_array_battery",
    oracle="""
        SELECT p_partkey,
               string_split(p_name, ' ')[1] AS first_word,
               string_split(p_name, ' ')[-1] AS last_word,
               len(string_split(p_name, ' ')) AS n_words,
               CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
               array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words
        FROM part
    """,
    survey_ids=("F3", "F12"),
)
def functions_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions (F12): split, index, size, sort —
    the nested-data extension surface (reference ``generator.py:125-133``,
    the unpersisted address struct)."""
    part = lake.load_table(spark, "part", sf_dir)
    words = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.size(words).alias("n_words"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.array_join(F.array_sort(words), ",").alias("sorted_words"),
    )


@register(
    "udtf_props_fanout",
    oracle="""
        WITH kv AS (
            SELECT event_type,
                   unnest(json_keys(props)) AS prop_key,
                   props
            FROM events WHERE props IS NOT NULL
        )
        SELECT event_type, prop_key,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(json_extract(props, '$.' || prop_key)
                             AS BIGINT)) AS BIGINT) AS total_val,
               CAST(MIN(CAST(json_extract(props, '$.' || prop_key)
                             AS BIGINT)) AS BIGINT) AS min_val,
               CAST(MAX(CAST(json_extract(props, '$.' || prop_key)
                             AS BIGINT)) AS BIGINT) AS max_val
        FROM kv
        GROUP BY 1, 2
    """,
    survey_ids=("UD4", "F10", "F12"),
)
def udtf_props_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python USER-DEFINED TABLE FUNCTION (the PySpark 4 `@udtf`
    surface, UD4): a per-row JSON property exploder registered as a
    SQL table function and applied via LATERAL — each event's props
    document fans out to (key, value) rows, then rolls up per event
    type.  UDTFs run row-at-a-time Python; this catalog keeps them for
    irregular fan-out API coverage and routes bulk JSON through the
    JVM `from_json` path (`cdc_roundtrip_latest_state`) — that trade
    is the docstring contract.  The oracle is DuckDB's native
    `json_each` lateral."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="prop_key string, prop_val long")
    class ParseProps:
        def eval(self, props: str):
            import json as _json

            if props:
                doc = _json.loads(props)
                for k in sorted(doc):
                    yield (k, int(doc[k]))

    spark.udtf.register("parse_props", ParseProps)
    lake.load_table(spark, "events", sf_dir).createOrReplaceTempView("udtf_events")
    return spark.sql(
        """
        SELECT e.event_type, t.prop_key,
               COUNT(*) AS n_events,
               SUM(t.prop_val) AS total_val,
               MIN(t.prop_val) AS min_val,
               MAX(t.prop_val) AS max_val
        FROM udtf_events e, LATERAL parse_props(e.props) t
        GROUP BY 1, 2
        """
    )
