"""Relational operators: joins (incl. as-of), top-k, set ops, FK audits.

Covers SURVEY.md §2.3 (J1-J8), §2.6 (O1-O3), §2.7 (U1-U4).  All pure
DataFrame compositions — Catalyst picks broadcast vs sort-merge, AQE
handles skew; nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast hint (J1/J5).

    At 100 TB the fact side never moves: the dim ships to every
    executor, so no shuffle.  AQE would usually infer this, but the
    hint makes the plan deterministic regardless of stats freshness.
    """
    return fact.join(F.broadcast(dim), on, how)


def fk_orphans(child: DataFrame, parent: DataFrame, on) -> DataFrame:
    """FK-integrity audit (J6): child rows with no parent — left anti.

    The empty-result invariant is the lake analog of the reference's
    ``ON DELETE CASCADE`` FKs (reference ``SCHEMA.sql:13,23``)."""
    return child.join(parent, on, "left_anti")


def having_children(parent: DataFrame, child: DataFrame, on) -> DataFrame:
    """Parents with ≥1 child — left semi (J6), no duplication, no shuffle
    of child payload columns (semi joins only move the keys)."""
    return parent.join(child, on, "left_semi")


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k (O2).  ``orderBy().limit()`` plans as
    TakeOrderedAndProject: each partition keeps a k-heap, the driver
    merges k·p rows — no global sort even at 100 TB."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Per-group top-k (O3) via row_number ≤ k (W2 pattern).

    One shuffle on the group key; the window is rank-only so Spark's
    WindowExec streams each partition without buffering frames.
    ``order_cols`` must be a total order for deterministic results.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    strict: bool = False,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join (J7): for each left row, the closest right row per
    ``key`` — ``backward`` (default): latest with ``right_ts <=
    left_ts``; ``forward``: earliest with ``right_ts >= left_ts``
    (strict inequalities when ``strict``).  ``tolerance_seconds``
    nulls the match out when the matched gap exceeds it (pandas
    ``merge_asof`` tolerance semantics) — the match columns go null,
    the left row is kept.

    Spark has no native as-of join; the scalable formulation is the
    union + ordered window ``last(..., ignorenulls)`` trick:

    1. tag and union both inputs (one schema, right's value columns
       null on left rows);
    2. one window per key ordered by (ts, side) — right rows sort
       before left rows at equal ts so ties resolve to "<=";
    3. ``last(value, ignorenulls=True)`` over unbounded-preceding
       carries the most recent right values onto each left row.

    Cost: a single shuffle on ``key`` + one sort — same as one
    sort-merge join, with no range-explosion, no crossJoin, and no
    per-group pandas materialization, so it survives 100 TB inputs and
    skewed keys (AQE splits hot key partitions).
    DuckDB oracle equivalent: ``ASOF LEFT JOIN``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rvals = right_value_cols or [c for c in right.columns if c not in (key, right_ts)]

    # side marker: right=0 sorts first at equal ts => inclusive match
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rvals],
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType))

    tie = 0 if strict else 1  # strict: right at equal ts must NOT match
    # forward = the same carry trick over REVERSED time: walking ts
    # descending, "last right seen" is the next right at-or-after
    ts_ord = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    order = [ts_ord, F.col("__side").asc() if tie else F.col("__side").desc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = l.unionByName(r.select(*l.columns)).select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rvals
        ],
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__m_ts"),
    )
    matched = F.col("__m_ts").isNotNull()
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col("__m_ts")) - F.unix_micros(F.col("__ts"))
        if direction == "backward":
            gap = -gap
        matched = matched & (gap <= F.lit(int(tolerance_seconds * 1_000_000)))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__row")[c].alias(c) for c in left.columns],
        F.when(matched, F.col("__m_ts")).alias(f"asof_{right_ts}"),
        *[
            F.when(matched, F.col(f"__m_{c}")).alias(f"asof_{c}")
            for c in rvals
        ],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_lo: str,
    right_hi: str,
) -> DataFrame:
    """Equi-key + interval-containment join (J7 range form):
    ``left.left_key == right.right_key AND right_lo <= left_ts < right_hi``.

    The equi key keeps this a hash/sort-merge join (the range is a
    post-join filter Catalyst evaluates inside the join), never a
    cartesian product."""
    cond = (
        (left[left_key] == right[right_key])
        & (left[left_ts] >= right[right_lo])
        & (left[left_ts] < right[right_hi])
    )
    return left.join(right, cond)


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """U1: schema-aligned union of N inputs (missing columns null-filled)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def latest_per_key(
    df: DataFrame, key_cols: list[str], version_cols: list[Column]
) -> DataFrame:
    """U4/ST5 core: keep exactly one row per key — the max under
    ``version_cols`` ordering (latest-wins).  ``version_cols`` should
    end with a unique tiebreaker for determinism."""
    w = Window.partitionBy(*key_cols).orderBy(*[c.desc() for c in version_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def blocked_fuzzy_best_match(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Entity resolution by blocked edit-distance self-join: candidate
    pairs share a blocking key (an EQUI-join — never all-pairs), are
    kept when ``levenshtein <= max_dist``, and each record keeps its
    best candidate under the total order (distance, candidate id).

    Returns (id, best_match_id, best_distance, n_candidates).  Scale
    shape: one shuffle on the blocking key; comparisons are bounded by
    the largest block squared, so the blocking function is the knob —
    salt or refine it (e.g. add a length band or a q-gram key) if a
    block grows hot.  The per-record reduction is a bounded window,
    not a global sort.
    """
    a = df.select(
        F.col(id_col).alias("a_id"),
        F.col(text_col).alias("a_text"),
        block.alias("blk"),
    )
    b = df.select(
        F.col(id_col).alias("b_id"),
        F.col(text_col).alias("b_text"),
        block.alias("blk"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.levenshtein("a_text", "b_text").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("a_id").orderBy(F.asc("dist"), F.asc("b_id"))
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_candidates", F.count(F.lit(1)).over(Window.partitionBy("a_id")))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("a_id").alias(id_col),
            F.col("b_id").alias("best_match_id"),
            F.col("dist").alias("best_distance"),
            "n_candidates",
        )
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = False,
    minimize_y: bool = False,
) -> DataFrame:
    """2-D skyline / Pareto frontier (O-family): the distinct (x, y)
    points not DOMINATED by any other point, where p dominates q iff p
    is at-least-as-good on both dimensions and strictly better on one
    ("good" = larger, or smaller for a ``minimize_*`` dimension).

    The classic sort-scan formulation: after deduplicating (x, y) and
    sorting by (x best-first, y best-first), a point survives iff its y
    strictly beats the running best-y of all PRECEDING rows — every
    preceding row has x at-least-as-good, and with exact duplicates
    removed, a preceding row with equal y must have strictly better x,
    so ``y <= running_best`` ⇔ dominated.

    Scale: a single global sort-scan would serialize on one task, so
    this runs the textbook TWO-PHASE distributed skyline: the same
    sort-scan WITHIN each input partition first (a local skyline is a
    superset of the global one — dominance within a partition implies
    dominance globally), which prunes all but ~|skyline| points per
    partition, then the global pass runs over that tiny survivor set.
    The final window is single-task by construction but its input is
    O(n_parts × |skyline|), not O(n).

    Nulls in x/y are dropped (dominance is undefined on them).
    """
    bx = F.col("__x").asc() if minimize_x else F.col("__x").desc()
    # y normalized to maximize internally (__yn); output keeps originals
    by = F.col("__yn").desc()

    pts = (
        df.select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
        .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .distinct()
        .withColumn("__yn", F.col("__y") * F.lit(-1 if minimize_y else 1))
    )

    def scan(frame: DataFrame, *partition_cols: str) -> DataFrame:
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy(bx, by)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        run_best = F.max("__yn").over(w)
        return frame.withColumn("__rb", run_best).filter(
            F.col("__rb").isNull() | (F.col("__yn") > F.col("__rb"))
        ).drop("__rb")

    local = scan(pts.withColumn("__pid", F.spark_partition_id()), "__pid").drop(
        "__pid"
    )
    return scan(local).select(
        F.col("__x").alias(x_col), F.col("__y").alias(y_col)
    )
