"""Z-order (Morton) interleaving for multi-dimensional data skipping.

Lexicographic ``compact(cluster_by=["a", "b"])`` gives tight file
ranges on ``a`` but leaves ``b`` spread across every file — a
``b``-only predicate prunes nothing.  Sorting by the bit-interleaved
Morton value instead makes each file a small hyper-rectangle in
(a, b) space, so min/max stats prune on EITHER dimension (the Delta
OPTIMIZE ZORDER idea, 1 expression + the existing stats machinery).

Inputs must be small non-negative integers (bucketized/rank-coded by
the caller — raw values with wild ranges would let one dimension
starve the other's bits; classic Z-order implementations range-
partition each column first for the same reason).  The expression is
a pure bit chain — whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton value of two non-negative ints: bit i of ``a`` lands at
    position 2i, bit i of ``b`` at 2i+1.  ``bits`` per dimension
    (default 16 → a 32-bit Z value)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    al, bl = a.cast("long"), b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftright(al, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(bl, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


def bucketize(col: Column, lo: float, hi: float, n: int) -> Column:
    """Rank-code a numeric column into [0, n) buckets over [lo, hi] —
    the per-dimension normalization Z-ordering needs.  Clamps outliers
    into the edge buckets.  NULL inputs bucket to 0 EXPLICITLY: Spark's
    ``greatest``/``least`` SKIP null arguments, so an unguarded NULL
    would silently code as the TOP bucket n-1 and corrupt the
    clustering and per-file stats.  A degenerate range (hi == lo) also
    collapses to bucket 0 instead of dividing by zero."""
    if hi == lo:
        return F.lit(0).cast("long")
    scaled = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n))
    clamped = F.greatest(F.lit(0), F.least(F.lit(n - 1), scaled))
    # the guard must test the INPUT: least(n-1, NULL) already returns
    # n-1 (null-skipping), so a coalesce on the clamped value would
    # never see the null
    return F.when(col.isNull(), F.lit(0)).otherwise(clamped).cast("long")
