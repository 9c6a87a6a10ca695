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


def load_all() -> dict[str, Query]:
    """Import every plans module so registrations run; return registry."""
    from end_end_data_pipeline__spark.plans import (  # noqa: F401
        queries_relational,
        queries_windows,
        queries_functions,
        queries_streaming,
        queries_llm,
        queries_pipeline,
        queries_tpch,
    )

    return QUERIES
