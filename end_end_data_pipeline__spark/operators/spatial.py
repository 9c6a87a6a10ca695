"""Spatial operators: grid-bucketed radius joins.

The reference has no spatial data, but its unpersisted nested address
dict (reference ``generator.py:125-133``, SURVEY.md §1.1) implies a
geo dimension the engine should serve; the synthetic fixture derives
integer planar coordinates from entity keys so the contract query is
exactly reproducible.

The radius join is the canonical "never all-pairs" spatial pattern:

1. bucket points into square grid cells whose side equals the search
   radius;
2. explode each PROBE point to its 3×3 cell neighborhood (a point
   within radius R of another is never more than one cell away when
   the cell side is R);
3. equi-join on the cell id — candidate pairs are exactly the
   9-cell-local ones, each produced ONCE (the unique matching cell
   offset), so no distinct is needed;
4. exact distance filter on the survivors.

Scale: one shuffle on the cell key with a constant 9× probe
amplification; density skew (a hot city cell) is handled like any hot
join key — salt the cell or subdivide it, the same knob as
``blocked_fuzzy_best_match``'s blocking function.  Distances compare
SQUARED in integer arithmetic — no sqrt, no trig (both are
engine-specific at the last ulp), bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_pairs(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Unordered pairs (a_id < b_id) of points within EUCLIDEAN
    ``radius`` of each other, with the squared distance.  Coordinates
    must be non-negative integers (exact arithmetic end to end)."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    cell = lambda c: F.floor(c.cast("double") / F.lit(float(radius))).cast("int")  # noqa: E731
    base = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
        cell(F.col(x_col)).alias("cx"),
        cell(F.col(y_col)).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = base.select(
        F.col("pid").alias("a_id"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    build = base.select(
        F.col("pid").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        "cx",
        "cy",
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", d2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(radius * radius))
    )


def radius_neighbor_stats(pairs: DataFrame) -> DataFrame:
    """Per-point degree + nearest-neighbor squared distance from the
    unordered pair list (both endpoints of each pair count)."""
    both = pairs.select(
        F.col("a_id").alias("id"), F.col("dist2")
    ).unionByName(pairs.select(F.col("b_id").alias("id"), F.col("dist2")))
    return both.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.min("dist2").alias("min_dist2"),
    )
