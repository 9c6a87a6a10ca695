"""Time-series regularization: densify a per-group periodic series to
its full span, distinguishing synthesized gap rows, zero-filling
additive measures, and carrying state measures forward (LOCF).

The reference's consumer writes irregular event batches keyed by
arrival (reference ``consumer/consumer.py:45-48``); any downstream
daily mart built on it silently skips silent days.  Gap filling is the
operator that makes "no rows" an explicit zero/carried observation —
the precondition for correct moving averages, day-over-day deltas, and
SLA burn-down over sparse activity.

Scale: the calendar is generated per group from its own [min, max]
span (``sequence`` + ``explode`` — one Generate, linear in emitted
days, never a global calendar cross join); the densifying join is an
equi-join on (group, period); the LOCF window sorts within group only.
At 100 TB the row count is bounded by groups × span-days, which the
caller controls via the grouping — there is no quadratic stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_OBS = "__observed"


def gap_fill(
    df: DataFrame,
    group_cols: list[str],
    date_col: str,
    zero_fill: dict[str, object] | None = None,
    locf_cols: list[str] | None = None,
    gap_col: str = "is_gap",
) -> DataFrame:
    """Densify ``df`` (one row per group × date, date-typed) to every
    date in each group's [min, max] span.

    Synthesized rows get ``gap_col`` = true; columns in ``zero_fill``
    take their literal ON GAP ROWS ONLY (an observed row's genuine
    NULL measurement is preserved — a known day with an unknown value
    must stay distinguishable from a measured zero); columns in
    ``locf_cols`` carry the last non-null OBSERVED value onto gap rows
    (rows-preceding window, deterministic) while observed rows keep
    their own value untouched.  Leading rows are never gaps (each
    group's span starts at an observed date), so LOCF columns are
    null on gaps only if the group never observed a non-null value.
    """
    zero_fill = zero_fill or {}
    locf_cols = locf_cols or []
    marked = df.withColumn(_OBS, F.lit(True))
    spans = df.groupBy(*group_cols).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    cal = spans.select(
        *group_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(date_col),
    )
    dense = cal.join(marked, [*group_cols, date_col], "left")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_gap = F.col(_OBS).isNull()
    cols: list[Column] = []
    for name in dense.columns:
        if name == _OBS:
            continue
        c = F.col(name)
        if name in locf_cols:
            # mask gap rows out of the carry source so the window sees
            # only observed values; observed rows keep their own value
            carried = F.last(
                F.when(~is_gap, c), ignorenulls=True
            ).over(w)
            c = F.when(is_gap, carried).otherwise(c).alias(name)
        elif name in zero_fill:
            c = F.when(is_gap, F.lit(zero_fill[name])).otherwise(c).alias(name)
        cols.append(c)
    return dense.select(*cols, is_gap.alias(gap_col))
