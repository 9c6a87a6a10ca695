"""Iterative graph operators over the transfer network (SURVEY.md J3:
``related_account_id`` makes accounts an account↔account graph,
reference ``SCHEMA.sql:26``, ``generator.py:296-304``).

Connected components via min-label propagation — the canonical
"genuinely iterative, not SQL-expressible" operator class: a loop of
joins the driver orchestrates, each iteration a full DataFrame job.

Scale notes baked in:

- labels and edges are narrow (two longs) — per-iteration shuffle is
  the minimum possible;
- lineage is truncated with ``localCheckpoint`` every iteration —
  without it the plan doubles per loop and the optimizer chokes by
  iteration ~10 (classic iterative-Spark failure mode);
- convergence is checked with a cheap count of changed labels, so the
  loop runs O(graph diameter) iterations, not a fixed worst case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by min-label propagation.

    ``edges`` is an undirected edge list (each pair once is enough).
    Returns (node, component) with component = min node id reachable.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # candidate label per node = min over neighbors' labels and own
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # pointer jumping: follow the label's own label one hop —
        # compresses chains so convergence is O(log n) rounds instead
        # of O(diameter) (pure neighbor propagation crawls a path graph
        # one node per round)
        ptr = propagated.select(
            F.col("node").alias("cnode"), F.col("component").alias("ccomp")
        )
        updated = (
            propagated.join(ptr, propagated.component == ptr.cnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("ccomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate lineage every iteration
        )
        n_changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels = updated
        if n_changed == 0:
            break
    return labels
