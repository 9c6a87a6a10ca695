"""Plan-shaping helpers for exploding *expensive* array expressions.

Two Catalyst behaviors make a naive ``select(explode(expensive_array))``
quadratic-ish for computed arrays (measured 10-30× on the shingle
pipeline, see ``operators.dedup``):

1. ``InferFiltersFromGenerate`` infers ``size(e) > 0 AND isnotnull(e)``
   from ``explode(e)`` and pushes it toward the scan — with the whole
   array expression **inlined** into the filter, so it evaluates 2 extra
   times per input row (and higher-order lambdas run interpreted,
   outside codegen's common-subexpression elimination).
2. ``CollapseProject`` / predicate pushdown will happily inline a
   multiply-referenced alias of the array (or of its token input) into
   every ``element_at`` reference.

``explode_safe`` sidesteps both at the *plan* level (no session conf
needed — the driver harness brings a vanilla SparkSession):
``explode_outer`` is exempt from filter inference, and the follow-up
null filter touches only the generated output attribute, which cannot
be pushed below the Generate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_safe(
    df: DataFrame, keep: list[str], array: Column, alias: str
) -> DataFrame:
    """``df.select(*keep, explode(array).alias(alias))`` without the
    inferred-filter re-evaluation of ``array`` (see module docstring).

    Rows whose array is empty or null are dropped, matching inner
    ``explode``.  DELIBERATE DIVERGENCE from inner explode: NULL
    *elements* inside a non-empty array are ALSO dropped (the
    post-explode ``isNotNull`` filter can't tell a null element from a
    null/empty array) — callers rely on this (cdc decode drops
    malformed payload entries through it), and every operator caller
    builds arrays of non-null elements, so the extra drop is the
    wanted semantics repo-wide.  If a future caller needs null
    elements preserved, it must wrap them in structs first."""
    return (
        df.select(*keep, F.explode_outer(array).alias(alias))
        .filter(F.col(alias).isNotNull())
    )
