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


def ewma_lags(
    value: Column | str,
    order_col: Column | str,
    partition_cols: list[str],
    decay: str = "0.9",
    n_lags: int = 8,
    value_scale: int = 0,
) -> Column:
    """Trailing exponentially-weighted moving average as a finite sum
    of window lags: ewma_t = Σ_{i<n} λ^i·x_{t−i} / Σ_{i<n} λ^i (terms
    with no row at lag i drop out of BOTH sums).

    Truncating at ``n_lags`` makes the recursion a fixed expression
    tree — one window shuffle, no recursion, SQL-replayable — and the
    tail loss is λ^n (< 0.5% of total weight at λ=0.9, n=8 is ~43% —
    pick n for the decay).  Weights are exact decimal powers of the
    DECIMAL string ``decay`` computed driver-side, so with integer or
    decimal ``value`` both numerator and denominator accumulate
    exactly; the single double division at the end is the only lossy
    step, bit-identical on any engine evaluating the same tree.

    ``value_scale``: decimal digits of the VALUE column (default 0 =
    integer counts).  Lags are cast to ``decimal(18, value_scale)``,
    so a fractional input (e.g. decimal(12,2) money) must pass its
    scale — at the default the cast would silently round every lag to
    whole units before weighting.
    """
    from decimal import Decimal

    lam = Decimal(decay)
    # Weight scale = the decimal digits of the longest power — kept
    # minimal (7 for λ=0.9, n=8) so numerator/denominator magnitudes
    # stay inside the exactly-double-convertible range (< 2^53 scaled
    # units); a fat scale like 18 would make the final decimal→double
    # cast double-round differently across engines (1-ulp drift).
    if not (0 < lam <= 1):
        raise ValueError(f"decay must be in (0, 1], got {decay}")
    s = -(lam ** (n_lags - 1)).as_tuple().exponent
    if n_lags > 10 or s + value_scale > 17:
        # Spark decimal headroom: the weight×lag product is
        # (s+2+18+1, s+value_scale) and each chained + widens precision
        # by one digit — these bounds keep every intermediate ≤
        # precision 38 so Spark never applies its lossy scale-reduction
        # fallback
        raise ValueError(
            f"n_lags must be <= 10 and decay digits + value_scale <= 17; "
            f"got n_lags={n_lags}, scale={s}, value_scale={value_scale}"
        )
    v = F.col(value) if isinstance(value, str) else value
    w = (
        Window.partitionBy(*partition_cols).orderBy(order_col)
        if partition_cols
        else Window.orderBy(order_col)
    )
    # lags are carried at the CALLER-DECLARED scale: decimal(18, 0)
    # would silently round a fractional value column (e.g. money at
    # scale 2) to whole units before weighting — value_scale exists so
    # the cast is lossless for the input's actual digits
    ns = s + value_scale  # numerator scale
    zero_n = F.lit("0").cast(f"decimal(28,{ns})")
    zero_d = F.lit("0").cast(f"decimal(28,{s})")
    num = zero_n
    den = zero_d
    for i in range(n_lags):
        coef = F.lit(str(lam**i)).cast(f"decimal({s + 2},{s})")
        xi = F.lag(v, i).over(w).cast(f"decimal(18,{value_scale})")
        num = num + F.coalesce((coef * xi).cast(f"decimal(28,{ns})"), zero_n)
        den = den + F.when(xi.isNotNull(), coef).otherwise(F.lit("0")).cast(
            f"decimal(28,{s})"
        )
    return (num.cast("double") / den.cast("double")).alias("ewma")
