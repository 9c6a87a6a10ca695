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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    acc_scale: int = 18,
) -> DataFrame:
    """Fixed-iteration PageRank (power method) over a directed edge
    list; returns (node, rank).  Parallel edges count toward degree —
    a node sending twice contributes twice, matching the multigraph
    reading of the transfer network.

    Deterministic by construction so a SQL oracle can replay it
    exactly: contributions and the dangling-mass sum are quantized to
    1e-18 with ``floor`` and accumulated as INTEGERS — floor and
    integer addition are bit-identical in every engine, where a
    double→decimal cast is not (engines disagree on the 1e-18 rounding
    ULP, which compounds over iterations; same order-independence
    rationale as ``functions.scalar.dec_sum``).  Every scalar step is
    the same IEEE double expression on both sides, and the iteration
    count is fixed rather than convergence-tested.

    Scale: per iteration ONE shuffle for the contribution agg (narrow
    rows: node + decimal) plus a broadcast-size scalar for dangling
    mass; lineage is truncated per iteration (``localCheckpoint``),
    the same discipline as :func:`connected_components`.  The two
    driver scalars (node count, dangling mass) are 1-row aggregates,
    not data collects."""
    q = float(10**acc_scale)  # 1e18 quantum: rank/deg ~<= 1 → <= 1e18,
    # exactly representable in int64; sums of ranks <= 1 stay in range
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = float(nodes.count())
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))  # empty graph
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            e.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.sum(F.floor(F.col("rank") / F.col("deg") * F.lit(q)))
                    .cast("double")
                    / F.lit(q)
                ).alias("contrib")
            )
        )
        dang_row = (
            ranks.join(
                deg.withColumnRenamed("src", "node"), "node", "left_anti"
            )
            .agg(F.sum(F.floor(F.col("rank") * F.lit(q))).cast("double") / F.lit(q))
            .collect()[0][0]
        )
        dang = float(dang_row) if dang_row is not None else 0.0
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.lit(dang / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


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


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of the UNDIRECTED simple graph induced by
    the edge list (self-loops and parallel/reverse duplicates
    collapse): the clustering/collusion-ring signal of the transfer
    network (a ring of accounts transferring to each other closes
    triangles; a star/hub does not).

    Algorithm: canonical id-orientation — every edge becomes (u < v),
    wedges (u,v),(v,w) with u < v < w join once, and a semi-join
    against the oriented edge set closes them.  Each triangle is
    counted exactly once.  Scale: two equi-join shuffles on node ids;
    fan-out is bounded by per-node out-degree in the orientation —
    production graphs with power-law hubs should orient by
    (degree, id) instead of id to bound the hub's out-degree at
    O(sqrt(edges)); the orientation column is the only change.

    Returns 3 rows: (metric, value) for nodes, edges, triangles.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)  # reused three times below
    )
    nodes = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("value"))
        .select(F.lit("n_nodes").alias("metric"), "value")
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("value")).select(
        F.lit("n_edges").alias("metric"), "value"
    )
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("u"),
            F.col("e2.v").alias("w"),
        )
    )
    closed = wedges.join(
        e.select(F.col("u").alias("u"), F.col("v").alias("w")),
        ["u", "w"],
        "inner",
    )
    triangles = closed.agg(F.count(F.lit(1)).alias("value")).select(
        F.lit("n_triangles").alias("metric"), "value"
    )
    return nodes.unionByName(n_edges).unionByName(triangles)


def flatten_hierarchy(
    parents: DataFrame,
    id_col: str = "node",
    parent_col: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """Flatten a parent-pointer hierarchy (org chart, BOM, account
    ownership chain) to (node, root, depth, path) — the recursive-CTE
    query class, done the iterative-DataFrame way: follow one ancestor
    level per round, stop when every walker reached a root (NULL
    parent).  ``path`` is the '/'-joined id chain from the node to its
    root.

    Scale: O(tree depth) rounds, each ONE equi-join shuffle of narrow
    rows (walker + string path), lineage truncated per round like
    :func:`connected_components`; cycles are cut off at ``max_depth``
    rather than looping forever, and flagged: output column ``is_cut``
    is true for walkers still mid-walk when the loop ended (a cycle or
    a deeper-than-max_depth chain — their ``root`` is just the last
    ancestor seen, not a real root).  For pathological
    depths (linked lists), pointer doubling halves the rounds at the
    cost of squaring the path-concat state — same trade
    ``connected_components`` documents.
    """
    pm = parents.select(
        F.col(id_col).alias("__pm_node"), F.col(parent_col).alias("__pm_parent")
    )
    state = parents.select(
        F.col(id_col).alias("node"),
        F.col(parent_col).alias("cur"),
        F.lit(0).alias("depth"),
        F.col(id_col).cast("string").alias("path"),
        # pre-seeded so an all-roots (or empty) forest — where the
        # loop below never runs — still resolves the final select
        F.lit(None).cast(parents.schema[id_col].dataType).alias("root_sofar"),
    ).localCheckpoint(eager=True)
    for _ in range(max_depth):
        pending = state.filter(F.col("cur").isNotNull()).limit(1).count()
        if pending == 0:
            break
        stepped = (
            state.join(pm, state["cur"] == pm["__pm_node"], "left")
            .select(
                "node",
                F.when(
                    F.col("cur").isNotNull(), F.col("__pm_parent")
                ).alias("next_cur"),
                F.when(F.col("cur").isNotNull(), F.col("depth") + 1)
                .otherwise(F.col("depth"))
                .alias("depth"),
                F.when(
                    F.col("cur").isNotNull(),
                    F.concat_ws("/", F.col("path"), F.col("cur").cast("string")),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.coalesce(F.col("cur"), F.col("root_sofar")).alias("root_sofar"),
            )
            .withColumnRenamed("next_cur", "cur")
        )
        state = stepped.select(
            "node", "cur", "depth", "path", "root_sofar"
        ).localCheckpoint(eager=True)
    return state.select(
        "node",
        F.coalesce("root_sofar", "node").alias("root"),
        "depth",
        "path",
        # still mid-walk when the loop ended ⇒ cycle / depth overflow
        F.col("cur").isNotNull().alias("is_cut"),
    )


def bfs_hops(
    edges: DataFrame,
    source: int,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 20,
    undirected: bool = True,
) -> DataFrame:
    """Single-source shortest path lengths (unweighted BFS) by
    iterative frontier expansion.

    Returns (node, hops) for every node reachable from ``source``
    within ``max_hops``.  Per iteration: join the current FRONTIER
    (only the nodes discovered last round, not the whole visited set)
    against the edge list, anti-join out already-visited nodes, union
    into the visited set.  Frontier-only joins keep per-iteration work
    proportional to the BFS wavefront, the same reason level-synchronous
    BFS scales on Pregel-style systems; ``localCheckpoint`` truncates
    lineage per level.  Oracle form: a recursive CTE taking MIN(hop)
    per node (equivalent because BFS discovers nodes in hop order).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if undirected:
        e = e.unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    e = e.filter(F.col("a").isNotNull() & F.col("b").isNotNull()).distinct()
    e = e.localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(int(source), 0)], schema="node long, hops int"
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.select(F.col("node").alias("a")), "a")
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def cheapest_paths_khop(
    edges: DataFrame,
    sources: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    undirected: bool = True,
) -> DataFrame:
    """Hop-bounded cheapest paths (weighted BFS / k rounds of
    Bellman-Ford relaxation) from a SET of source nodes: for every
    node reachable within ``k`` hops, the minimum total edge weight
    over all paths of at most ``k`` edges.

    The weighted complement of ``bfs_hops`` — weights must be
    non-negative INTEGERS (the repo determinism contract: min/+ over
    BIGINT is bit-identical in any engine; float costs would tie-break
    engine-specifically).  Per round: relax the FULL current estimate
    frame against the edge list and fold with min — k is small and
    user-chosen, so the oracle can unroll the same k rounds exactly;
    unlike BFS there is no early frontier shrink (a longer path found
    earlier may be undercut later), which is why hop-bounding, not
    convergence, is the contract.

    Scale: each round is one equi-join on node id + one map-side-
    combinable min-agg; ``localCheckpoint`` truncates lineage so round
    r doesn't replay rounds 0..r-1.  ``sources`` must have a ``node``
    column; output is (node, cost) with cost BIGINT.
    """
    from pyspark.sql.types import DecimalType, FractionalType

    wtype = edges.schema[weight].dataType
    # DecimalType extends FractionalType, but a scale<=0 decimal is
    # exactly integral and casts to long losslessly (r07 advice: the
    # blanket guard rejected exact integer-valued decimal weights)
    integral_decimal = isinstance(wtype, DecimalType) and wtype.scale <= 0
    if isinstance(wtype, FractionalType) and not integral_decimal:
        # enforce the documented integer contract instead of silently
        # truncating: cast('long') floors 0.9 to 0, so a many-hop path
        # of sub-unit edges would beat a direct weight-1 edge
        raise ValueError(
            f"cheapest_paths_khop: weight column {weight!r} is {wtype} — "
            "weights must be non-negative integers (scale fractional "
            "costs to integer units, e.g. cents, before calling)"
        )
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"),
        F.col(weight).cast("long").alias("w"),
    )
    if undirected:
        e = e.unionByName(
            edges.select(
                F.col(dst).alias("a"), F.col(src).alias("b"),
                F.col(weight).cast("long").alias("w"),
            )
        )
    e = (
        e.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))  # parallel edges: keep cheapest
        .localCheckpoint(eager=True)
    )
    dist = (
        sources.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(k):
        relaxed = (
            dist.join(e, dist["node"] == e["a"])
            .select(F.col("b").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    return dist
