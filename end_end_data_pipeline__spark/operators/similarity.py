"""Similarity search over embedding columns (SURVEY.md J9/UD7/UD8):
exact cosine top-k as the verifiable baseline, random-hyperplane LSH
bucketing as the scale path.

Vector math is pure higher-order Catalyst expressions
(``zip_with`` + ``aggregate`` left-fold) on double arrays — no UDFs,
bit-identical to a sequential engine (the DuckDB oracle), and
whole-stage-codegen'd.

Scale posture: brute force is O(probes × corpus) — fine for a
broadcastable probe set (the common "match new items against the
catalog" shape); the LSH variant buckets both sides so each probe
only scans its bucket (multi-probe over neighboring buckets trades
recall for fan-out).  At 100 TB the bucket join is an equi shuffle on
uniformly-distributed hash buckets — no skew, no cross join.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.functions.arrays import explode_safe
from end_end_data_pipeline__spark.operators.relational import top_k_per_group


def _probe_masks(n_planes: int, multiprobe_bits: int) -> list[int]:
    """XOR masks for multi-probe LSH: every nonzero mask of Hamming
    weight <= multiprobe_bits over ``n_planes`` bucket bits.  (r07
    review: the old inline code emitted only the weight-1 masks, so
    ``multiprobe_bits=2`` silently behaved exactly like 1 — a tuning
    knob that read as accepted but did nothing past its lowest
    setting.)  Mask count is sum_{w<=m} C(planes, w); each mask adds a
    probe-bucket struct variant to every hash table's plan, so the
    EXPRESSION count (not data) grows with it — at 16 planes,
    m=2 → 136 masks, m=3 → 696, m=4 → 3,060.  Capped at 1,024: past
    that, Catalyst analysis/codegen time dominates any recall gain and
    the right tool is more tables or more planes, not wider probing."""
    from itertools import combinations

    m = min(multiprobe_bits, n_planes)
    masks = [
        sum(1 << i for i in bits)
        for w in range(1, m + 1)
        for bits in combinations(range(n_planes), w)
    ]
    if len(masks) > 1024:
        raise ValueError(
            f"multi-probe mask count {len(masks)} (n_planes={n_planes}, "
            f"multiprobe_bits={multiprobe_bits}) exceeds 1024 — each mask "
            "is a per-table plan expression, so this would balloon "
            "analysis/codegen time; lower multiprobe_bits or raise "
            "n_tables instead"
        )
    return masks


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (order-deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for each probe (self-matches
    excluded): broadcast the probe set, scan the corpus once.

    Output: (probe_id, neighbor_id, cos) — deterministic tie-break on
    neighbor id."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    p = probes.select(F.col(id_col).alias("probe_id"), as_double(vec_col).alias("pv"))
    scored = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("cos", cosine(F.col("pv"), F.col("cv")))
        .select("probe_id", "neighbor_id", "cos")
    )
    return top_k_per_group(
        scored, ["probe_id"], [F.col("cos").desc(), F.col("neighbor_id").asc()], k
    )


def _plane_value(plane: int, dim: int, salt: str = "hyperplane") -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    md5-derived, reproducible across runs/partitions (no RNG state)."""
    h = hashlib.md5(f"{salt}:{plane}:{dim}".encode()).hexdigest()
    return int(h[:12], 16) / float(16**12) * 2.0 - 1.0


def hyperplanes(n_planes: int, n_dims: int) -> list[list[float]]:
    return [
        [_plane_value(p, d) for d in range(n_dims)] for p in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit_p = 1 iff vec · plane_p ≥ 0.  Pure
    Catalyst form — fine for a few planes; the hot multi-table path
    uses ``table_buckets_udf`` (one numpy matmul per Arrow batch)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, lit_plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def table_buckets_udf(
    n_tables: int, n_planes: int, n_dims: int, salt_prefix: str
):
    """Vectorized sign-LSH bucketing: one Arrow-batched pandas UDF
    computing ALL tables' bucket ids per vector — a single
    (batch × dims) @ (dims × tables·planes) numpy matmul + bit-pack,
    ~30× the interpreted per-plane fold (higher-order ``aggregate``
    runs interpreted per element).  Python UDFs are extracted into one
    ArrowEvalPython node, so downstream references read the
    materialized array — no re-evaluation hazard.

    Returns a UDF: array<double> vec → array<long> of ``n_tables``
    bucket ids (bit p of table t = sign(vec · plane_{t,p}))."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            [_plane_value(p, d, salt=f"{salt_prefix}{t}") for d in range(n_dims)]
            for t in range(n_tables)
            for p in range(n_planes)
        ]
    )  # (tables·planes, dims)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.stack(v.values).astype(np.float64)  # (batch, dims)
        signs = (mat @ planes.T) >= 0.0  # (batch, tables·planes)
        packed = signs.reshape(len(mat), n_tables, n_planes) @ weights
        return pd.Series(list(packed.astype(np.int64)))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    n_dims: int = 64,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent sign-LSH tables of
    ``n_planes`` bits each (OR-amplification — a pair is a candidate if
    it collides in ANY table), plus hamming-1 multi-probe per table.
    Rank candidates by exact cosine.

    Recall/cost dial: P(candidate) = 1 − (1 − p^planes)^tables with
    p = 1 − θ/π.  Fewer planes or more tables ⇒ higher recall, more
    candidates to score.  The default 4×8 holds even on weakly
    clustered corpora (validated in tests); genuinely clustered
    embeddings can run 8×4 or larger for sharper pruning.

    Output: (probe_id, neighbor_id, cos) — subset of brute force."""
    c_base = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    p_base = probes.select(
        F.col(id_col).alias("probe_id"), as_double(vec_col).alias("pv")
    )

    bk = table_buckets_udf(n_tables, n_planes, n_dims, "table")

    def tb_entries(with_multiprobe: bool) -> Column:
        """(table, bucket) structs from the materialized bucket array."""
        entries = []
        for t in range(n_tables):
            b0 = F.element_at(F.col("__bks"), t + 1)
            variants = [b0]
            if with_multiprobe and multiprobe_bits >= 1:
                variants += [
                    b0.bitwiseXOR(F.lit(m))
                    for m in _probe_masks(n_planes, multiprobe_bits)
                ]
            entries += [
                F.struct(F.lit(t).alias("t"), v.alias("b")) for v in variants
            ]
        return F.array(*entries)

    # candidate pair ids only through the bucket join (vectors rejoin
    # after the distinct — keeps the shuffle narrow)
    c = explode_safe(
        c_base.withColumn("__bks", bk(F.col("cv"))), ["neighbor_id"],
        tb_entries(False), "tb",
    )
    p = explode_safe(
        p_base.withColumn("__bks", bk(F.col("pv"))), ["probe_id"],
        tb_entries(True), "tb",
    )
    candidates = (
        c.join(F.broadcast(p), ["tb"])
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    scored = (
        candidates.join(F.broadcast(p_base), "probe_id")
        .join(c_base, "neighbor_id")
        .withColumn("cos", cosine(F.col("pv"), F.col("cv")))
        .select("probe_id", "neighbor_id", "cos")
    )
    return top_k_per_group(
        scored, ["probe_id"], [F.col("cos").desc(), F.col("neighbor_id").asc()], k
    )


def det_centroids(
    base: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """``n_centroids`` deterministic pseudo-random corpus vectors as
    centroids (md5-of-id order — reproducible, no RNG state, and
    replicable by the DuckDB oracle, which has no xxhash64).  Returns
    (cid, cvec)."""
    return (
        base.orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )


def nearest_centroid(
    base: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment (ids only — vectors rejoin after the
    argmin, keeping the agg narrow).  The max_by key is a struct
    (sim, -cid): max sim wins, exact-sim ties break to the smallest
    cid — a total order, so the assignment is deterministic and
    oracle-replicable, while staying a map-side-combinable hash agg
    (no window shuffle over the corpus).  One O(n × C) broadcast pass.
    Returns (id_col, cid)."""
    return (
        base.join(F.broadcast(cents))
        .select(
            id_col, "cid", cosine(F.col(vec_col), F.col("cvec")).alias("sim")
        )
        .groupBy(id_col)
        .agg(
            F.max_by(
                "cid", F.struct(F.col("sim"), (-F.col("cid")).alias("nc"))
            ).alias("cid")
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    tau: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    near-duplicate pruning for training corpora — cluster, then drop
    every document whose cosine to a LOWER-ID document in the SAME
    cluster is >= ``tau`` (keep-lowest-id is the deterministic stand-in
    for the paper's keep-one-per-semantic-group; greedy, so a dropped
    doc can itself be another doc's reason to drop — standard SemDeDup
    behavior).  Returns the kept (id, cid) rows.

    Scale: assignment is the IVF build — one broadcast-centroid scan,
    no shuffle beyond the tiny centroid sort.  The pairwise stage is an
    equi-join ON cid (never a global cross join): cost Σ c_i² over
    cluster sizes c_i ≈ n/C, which is the SemDeDup design point — C
    grows with the corpus (the paper runs 50k clusters on LAION) so
    per-cluster work stays bounded; skew in cluster sizes is AQE's
    skew-join case.  Cross-cluster near-dups are missed by design
    (that's the approximation the paper accepts; recall knob = C)."""
    base = corpus.select(
        F.col(id_col).alias("vid"), as_double(vec_col).alias("v")
    )
    cents = det_centroids(base, "vid", "v", n_centroids)
    assign = nearest_centroid(base, cents, "vid", "v").join(base, "vid")
    a = assign.select(
        F.col("cid"), F.col("vid").alias("keep_id"), F.col("v").alias("kv")
    )
    b = assign.select(
        F.col("cid"), F.col("vid").alias("cand_id"), F.col("v").alias("bv")
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("keep_id") < F.col("cand_id"))
        .filter(cosine(F.col("kv"), F.col("bv")) >= tau)
        .select(F.col("cand_id").alias("vid"))
        .distinct()
    )
    return (
        assign.join(dropped, "vid", "left_anti")
        .select(F.col("vid").alias(id_col), "cid")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 8,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning — the
    other classic ANN scale path next to LSH:

    1. pick ``n_centroids`` deterministic pseudo-random corpus vectors
       as centroids (md5-of-id order — reproducible, no RNG state, and
       replicable by the DuckDB oracle, which has no xxhash64);
    2. build the inverted lists: every corpus vector is assigned to its
       nearest centroid (broadcast centroids, one scan, one map-side-
       combinable ``max_by`` with a total-order tie-break);
    3. each probe searches only its ``n_probe`` nearest lists.

    Scale: the build is one O(n × C) broadcast pass (no shuffle beyond
    the tiny centroid sort); queries touch ~``n_probe/n_centroids`` of
    the corpus via an equi-join on centroid id — uniform buckets when
    the data is unclustered, and *better* than uniform when it is
    clustered (the IVF win).  On the synthetic unclustered fixture
    expected recall ≈ n_probe/n_centroids (tests assert the floor);
    clustered real embeddings are where IVF beats LSH.

    Output: (probe_id, neighbor_id, cos) — subset of brute force."""
    c_base = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    p_base = probes.select(
        F.col(id_col).alias("probe_id"), as_double(vec_col).alias("pv")
    )
    cents = det_centroids(c_base, "neighbor_id", "cv", n_centroids)
    c_assign = nearest_centroid(c_base, cents, "neighbor_id", "cv")
    # probe → its n_probe nearest lists
    p_assign = top_k_per_group(
        p_base.join(F.broadcast(cents)).select(
            "probe_id", "cid", cosine(F.col("pv"), F.col("cvec")).alias("sim")
        ),
        ["probe_id"],
        [F.col("sim").desc(), F.col("cid").asc()],
        n_probe,
    ).select("probe_id", "cid")
    candidates = (
        p_assign.join(c_assign, "cid")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id")
    )
    scored = (
        candidates.join(F.broadcast(p_base), "probe_id")
        .join(c_base, "neighbor_id")
        .withColumn("cos", cosine(F.col("pv"), F.col("cv")))
        .select("probe_id", "neighbor_id", "cos")
    )
    return top_k_per_group(
        scored, ["probe_id"], [F.col("cos").desc(), F.col("neighbor_id").asc()], k
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth
    reduction step for ANN at corpus scale (4× smaller than float32,
    8× than float64; dot products stay int32-accumulable).

    q_i = clamp(floor(x_i · 127/max|x| + 0.5), −127, 127), scale
    stored per vector for dequantization.  The rounding is written as
    ``floor(v + 0.5)`` explicitly — engine-neutral arithmetic (Spark's
    ``round`` is HALF_UP on decimals, numpy's is banker's; floor+0.5
    is bit-identical everywhere), so the DuckDB oracle replays it
    exactly.  All higher-order Catalyst expressions; no UDF.

    Output: (id, scale double, q array<int>, max_abs_err double) where
    ``max_abs_err`` is the max |x − q/scale| reconstruction error —
    bounded by 0.5/scale, which the tests assert."""
    v = as_double(vec_col)
    amax = F.aggregate(
        F.transform(v, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))
    return (
        df.select(
            F.col(id_col).alias("id"),
            v.alias("__v"),
            scale.alias("__scale"),
        )
        .withColumn("__q", F.transform(F.col("__v"), lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x * F.col("__scale") + F.lit(0.5)).cast("int")),
        )))
        .select(
            "id",
            F.col("__scale").alias("scale"),
            F.col("__q").alias("q"),
            F.aggregate(
                F.zip_with(
                    F.col("__v"),
                    F.col("__q"),
                    lambda x, qi: F.abs(x - qi.cast("double") / F.col("__scale")),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("max_abs_err"),
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
    n_dims: int = 64,
    n_tables: int = 4,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Embedding near-duplicate pairs (cos ≥ threshold) via LSH-bucketed
    self-join with OR-amplification: a pair is a candidate if it
    collides in ANY of ``n_tables`` independent sign-hash tables
    (hamming-1 multi-probe widens each table), then exact cosine
    verifies every candidate — so precision is exact and only recall
    depends on the LSH parameters.

    Recall: per table, a θ-apart pair agrees per plane w.p.
    p = 1 − θ/π; with hamming-1 multi-probe a table catches
    p^planes + planes·p^(planes−1)(1−p), so miss ≈ (1 − that)^tables —
    ~5e-8 at the 16×4 default for cos ≥ 0.99 (p ≈ 0.991), i.e.
    oracle-exact on any realistic corpus.  Plane count doubles as the
    candidate-volume dial: random pairs collide at ~2^-planes per
    table, so 16 planes ⇒ ~0.1% of the O(n²) pair space scored.  For
    looser thresholds (≈0.95) drop to 8-12 planes and add tables —
    recall falls off the p^planes cliff fast."""
    v = df.select(F.col(id_col).alias("doc"), as_double(vec_col).alias("v"))
    bk = table_buckets_udf(n_tables, n_planes, n_dims, "neardup")

    def tb_entries(with_multiprobe: bool) -> Column:
        entries = []
        for t in range(n_tables):
            b0 = F.element_at(F.col("__bks"), t + 1)
            variants = [b0]
            if with_multiprobe and multiprobe_bits >= 1:
                variants += [
                    b0.bitwiseXOR(F.lit(m))
                    for m in _probe_masks(n_planes, multiprobe_bits)
                ]
            entries += [
                F.struct(F.lit(t).alias("t"), var.alias("b")) for var in variants
            ]
        return F.array(*entries)

    # candidate pair ids only through the bucket join (vectors rejoin
    # after the distinct — keeps the shuffle narrow)
    vb = v.withColumn("__bks", bk(F.col("v")))
    left = explode_safe(vb, ["doc"], tb_entries(True), "tb")
    right = explode_safe(vb, ["doc"], tb_entries(False), "tb")
    cand = (
        left.alias("a")
        .join(right.alias("b"), ["tb"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    return (
        cand.join(v.select(F.col("doc").alias("doc_a"), F.col("v").alias("va")), "doc_a")
        .join(v.select(F.col("doc").alias("doc_b"), F.col("v").alias("vb")), "doc_b")
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", "cos")
    )


def kmeans_fixed_point(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 2,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means in FIXED-POINT arithmetic: vectors quantize to
    scaled BIGINTs (``floor(x * scale)``), distances and centroid
    means stay in exact integer arithmetic, so every assignment is
    bit-identical across engines and runs — the property float
    k-means cannot give (sum order changes the means).  Init:
    centroid ``j`` is the vector with id ``j``.  ``iterations``
    counts ASSIGNMENTS (assign → update → ... → assign): the return
    is the final membership (id, centroid id).

    Centroid means use a floor division normalized to non-negative
    numerators (``(s + n*scale) div n - scale``) because trunc-vs-
    floor semantics differ between engines on negatives.

    Scale shape: centroids travel as plan literals (k × dim ints —
    the broadcast-join degenerate case), so each iteration is ONE
    scan of the quantized vectors: a codegen'd array-fold distance
    per centroid plus an argmin over a k-struct array, then a
    (k × dim)-group hash agg for the update.  The only driver-side
    data ever collected is the k × dim centroid table.  IVF handoff:
    the final centroids are exactly what ``ann_ivf_topk`` needs.
    """
    assigned, _ = kmeans_fixed_point_with_centroids(
        emb, k, iterations, scale, id_col, vec_col
    )
    return assigned.select(
        F.col("__id").alias(id_col), F.col("cid").alias("centroid_id")
    )


def _argmin_cid_sql(cent: list[tuple[int, list[int]]], vec_sql: str) -> str:
    """SQL text of the nearest-centroid pick over centroid literals:
    ``array_min`` of (squared-distance, cid) structs, distance = the
    zip_with/aggregate fold over ``vec_sql``.

    r13: built as ONE ``F.expr`` parse instead of hundreds of py4j
    ``Column`` constructions — the r12 form spent more driver
    wall-clock building the expression tree through py4j (k·dim lit
    casts + k lambda conversions per call, ~2.8 s at k=4/dim=64)
    than executing it (0.15 s warm).  The parsed SQL lowers to the
    SAME Catalyst operators (ZipWith/ArrayAggregate/named_struct/
    array_min) with the same long arithmetic and (d, cid) struct
    tie-break, so assignments are bit-identical to the Column form."""
    entries = []
    for cid, vec in cent:
        arr = ", ".join(f"{int(v)}L" for v in vec)
        entries.append(
            f"named_struct('d', aggregate(zip_with({vec_sql}, array({arr})"
            ", (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
            f", 'cid', {int(cid)}L)"
        )
    return f"array_min(array({', '.join(entries)})).cid"


def _collect_seed_centroids(q: DataFrame, k: int) -> list[tuple[int, list[int]]]:
    """Collect the k seed rows (ids 0..k-1) from a quantized (__id, q)
    frame and validate them — shared by the kmeans and PQ trainers
    (ADVICE r12: the validation lived in two verbatim copies, and a
    set-equality check could not see duplicate ids).  Sorted-list
    comparison enforces 'exactly once' for real: k rows, ids 0..k-1,
    no duplicates."""
    cent = sorted(
        (r["__id"], list(r["q"]))
        for r in q.filter(F.col("__id") < k).collect()  # k rows, bounded
    )
    if [cid for cid, _ in cent] != list(range(k)):
        raise ValueError(
            f"k={k} seeds require ids 0..{k - 1} to exist exactly once; "
            f"found ids {sorted(c for c, _ in cent)} — pass a frame "
            "containing the seed ids (no duplicates) or re-key it"
        )
    return cent


def kmeans_fixed_point_with_centroids(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 2,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list]:
    """:func:`kmeans_fixed_point` plus the centroid table the final
    assignment used — ``(assignments, [(cid, [int, ...]), ...])``.
    The centroids are what index builders consume: IVF partitioning
    and the product-quantization codebooks (:func:`pq_encode`) both
    need the trained centers, not just the memberships."""
    q = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * scale).cast("long")
        ).alias("q"),
    ).localCheckpoint(eager=True)  # quantize once; reused every iteration

    cent = _collect_seed_centroids(q, k)

    def assign(centroids):
        # carry q through the assignment: the centroid update reads the
        # member vectors, and projecting them here (same scan) saves the
        # assigned⋈q self-join per Lloyd round the r11 plan paid — one
        # Exchange and one re-read of the checkpoint per iteration
        # (guide §2.4: remove shuffles outright).
        return q.select(
            "__id", "q", F.expr(_argmin_cid_sql(centroids, "q")).alias("cid")
        )

    assigned = assign(cent)
    for _ in range(iterations - 1):
        cm = (
            assigned
            .select("cid", F.posexplode("q").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.expr(
                    f"(sum(val) + count(1) * {scale}L) div count(1)"
                    f" - {scale}L"
                ).alias("cval")
            )
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in cm.collect():  # k × dim rows, bounded
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["cval"]
        cent = sorted(
            (cid, [comps[p] for p in sorted(comps)])
            for cid, comps in by_cid.items()
        )
        assigned = assign(cent)
    # the internal quantized column ``q`` stays inside the Lloyd loop —
    # the advertised contract is (assignments = (__id, cid), centroids)
    # (ADVICE r12: returning ``q`` leaked a schema change to consumers
    # doing select('*')/unionByName on the assignments)
    return assigned.select("__id", "cid"), cent


def mmr_rerank(
    emb: DataFrame,
    query_id: int,
    k: int = 3,
    pool: int = 8,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: diversified top-k — each
    pick maximizes ``relevance − max-similarity-to-already-picked``
    (λ=0.5 MMR; the λ factor scales both terms equally so it cancels
    from the argmax).  The retrieval pattern behind "don't return five
    copies of the same document".

    Two stages, costed separately: the DISTRIBUTED stage scans the
    corpus for the top-``pool`` candidates by quantized-integer dot
    product (TakeOrderedAndProject — this is the part that sees all N
    vectors); the greedy re-rank then runs over that bounded pool
    client-side — the textbook split, since MMR is inherently
    sequential and the pool is k-sized.  All arithmetic is exact
    scaled-BIGINT (same quantization as ``kmeans_fixed_point``), so
    picks are bit-deterministic and SQL-replicable.  Ties break on id.

    Returns (rank, id, relevance) for the k picks.
    """
    spark = emb.sparkSession
    qv = F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * scale).cast("long")
    )
    q = emb.filter(F.col(id_col) == query_id).select(qv.alias("q"))
    q_rows = q.collect()  # one bounded row
    if not q_rows:
        raise ValueError(f"query id {query_id!r} not found in {id_col!r}")
    qvec = q_rows[0]["q"]
    lit_q = F.array(*[F.lit(int(c)).cast("long") for c in qvec])
    dot_q = F.aggregate(
        F.zip_with(qv, lit_q, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pool_df = (
        emb.filter(F.col(id_col) != query_id)
        .select(F.col(id_col).alias("id"), qv.alias("v"), dot_q.alias("rel"))
        .orderBy(F.desc("rel"), F.asc("id"))
        .limit(pool)
    )
    cands = [(r["id"], r["rel"], list(r["v"])) for r in pool_df.collect()]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    picked: list[tuple[int, int]] = []  # (id, rel)
    picked_vecs: list[list[int]] = []
    remaining = list(cands)
    for _ in range(min(k, len(cands))):
        best = max(
            remaining,
            key=lambda c: (
                c[1] - max((dot(c[2], s) for s in picked_vecs), default=0),
                -c[0],
            ),
        )
        picked.append((best[0], best[1]))
        picked_vecs.append(best[2])
        remaining = [c for c in remaining if c[0] != best[0]]
    rows = [(i + 1, pid, rel) for i, (pid, rel) in enumerate(picked)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        f"rank int, {id_col} long, relevance long",
    )


def pq_encode(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    dim: int = 64,
    iterations: int = 2,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, list]]:
    """Product quantization (Jegou et al. 2011): split each vector into
    ``m`` contiguous subvectors, train an independent ``k``-centroid
    codebook per subspace (fixed-point k-means — every assignment
    bit-identical cross-engine, see :func:`kmeans_fixed_point`), and
    encode each vector as its ``m`` nearest-centroid ids.

    Compression: dim x float64 → m x log2(k) bits (64 doubles → 4
    2-bit codes here = 2000x in the fixture config; production PQ uses
    k=256 per byte).  The codes, not the vectors, are what an ANN
    index stores and scans — see :func:`pq_adc_topk` for the matching
    search side.

    Scale shape (r12 joint-training rewrite, guide §1.2 step 1 /
    §2.4): the m per-subspace Lloyd runs are trained TOGETHER — the
    corpus is quantized and checkpointed ONCE (the r11 plan paid one
    localCheckpoint per subspace), every Lloyd round is ONE scan that
    assigns all m subspaces and one (m·k·w)-group hash agg for all m
    codebook updates (vs m scans + m assigned⋈q joins), and the final
    codes are ONE projection computing code_0..code_{m-1} from the
    trained codebook literals (vs an m-way id equi-join of m
    single-code frames — 3 BroadcastExchanges gone from the sf0.1
    plan).  Arithmetic is unchanged: per-subspace fixed-point slices,
    distances, floor means and tie-breaks are the exact expressions
    the per-subspace runs evaluated, so codes and codebooks are
    bit-identical to the r11 output.

    Returns ``(codes, codebooks)``: codes = (id, code_0..code_{m-1}),
    codebooks = {subspace: [(cid, [int centroid components]), ...]}.
    """
    if dim % m != 0:
        raise ValueError(f"pq_encode: dim={dim} not divisible by m={m}")
    w = dim // m
    # quantize the FULL vector once — floor(x·scale) commutes with the
    # subspace slicing, so slicing the quantized longs is bit-identical
    # to quantizing per-subspace double slices
    q = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * scale).cast("long")
        ).alias("q"),
    ).localCheckpoint(eager=True)

    # seeds: subspace s's centroid j = slice s of the vector with id j
    # (identical to the per-subspace kmeans init)
    seeds = _collect_seed_centroids(q, k)
    books: dict[int, list] = {
        s: [(cid, vec[s * w:(s + 1) * w]) for cid, vec in seeds]
        for s in range(m)
    }

    def code_col(s: int, cent: list) -> Column:
        """argmin centroid for subspace ``s`` — the same array-fold
        distance + (d, cid) struct-min tie-break as kmeans' assign."""
        return F.expr(_argmin_cid_sql(cent, f"slice(q, {s * w + 1}, {w})"))

    def all_codes() -> DataFrame:
        return q.select(
            "__id", "q",
            *[code_col(s, books[s]).alias(f"code_{s}") for s in range(m)],
        )

    for _ in range(iterations - 1):
        # joint centroid update: explode the full vector once; position
        # pos belongs to subspace pos div w at in-subspace offset
        # pos mod w and groups under that subspace's assignment — the
        # same (cid, pos, sum, count) cells the m per-subspace aggs
        # produced, collected in one job (m·k·w rows, bounded)
        cs = F.array(*[F.col(f"code_{s}") for s in range(m)])
        cm = (
            all_codes()
            .select(F.posexplode("q").alias("pos", "val"), cs.alias("cs"))
            .select(
                (F.col("pos") / w).cast("int").alias("s"),
                F.element_at(F.col("cs"), (F.col("pos") / w).cast("int") + 1).alias("cid"),
                (F.col("pos") % w).alias("p"),
                "val",
            )
            .groupBy("s", "cid", "p")
            .agg(
                F.expr(
                    f"(sum(val) + count(1) * {scale}L) div count(1)"
                    f" - {scale}L"
                ).alias("cval")
            )
        )
        by_s: dict[int, dict[int, dict[int, int]]] = {}
        for r in cm.collect():  # m × k × w rows, bounded
            by_s.setdefault(r["s"], {}).setdefault(r["cid"], {})[r["p"]] = r["cval"]
        books = {
            s: sorted(
                (cid, [comps[p] for p in sorted(comps)])
                for cid, comps in by_s.get(s, {}).items()
            )
            for s in range(m)
        }

    codes = all_codes().select(
        F.col("__id").alias(id_col),
        *[F.col(f"code_{s}") for s in range(m)],
    )
    return codes, books


def pq_adc_topk(
    codes: DataFrame,
    books: dict[int, list],
    query: list[float],
    k_top: int = 10,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: quantize the
    query once, precompute the m x k table of per-subspace squared
    distances query-to-centroid DRIVER-SIDE (tiny — m·k integers),
    and scan the codes adding m literal-array lookups per row.

    This is the textbook PQ search shape and the whole point of the
    encoding: the scan touches only the code columns (m small ints per
    row — at 100 TB that is the difference between scanning vectors
    and scanning bytes), does NO join and NO vector arithmetic, and
    plans as one codegen'd projection + TakeOrderedAndProject.
    Distances are exact integer arithmetic on the fixed-point grid, so
    a SQL oracle replays them bit-for-bit.

    Output: (id, adc_dist) — the ``k_top`` smallest estimated
    distances, ties broken by id.
    """
    m = len(books)
    w = len(query) // m
    qq = [int(__import__("math").floor(x * scale)) for x in query]
    dist_tab: dict[int, list[int | None]] = {}
    for s, cent in books.items():
        qs = qq[s * w:(s + 1) * w]
        # Key the LUT by cid, not by position: a Lloyd round that
        # empties a cluster drops its cid from ``cent``, so surviving
        # cids can be NON-contiguous — a positional LUT would then map
        # codes to the wrong slot.  Unreferenced slots hold NULL
        # (no code carries a dropped cid, so they are never read).
        by_cid = {
            int(cid): sum((a - b) * (a - b) for a, b in zip(qs, cvec))
            for cid, cvec in cent
        }
        dist_tab[s] = [by_cid.get(c) for c in range(max(by_cid) + 1)]
    total = None
    for s in range(m):
        lut = F.array(*[F.lit(d).cast("long") for d in dist_tab[s]])
        term = F.element_at(lut, F.col(f"code_{s}").cast("int") + 1)
        total = term if total is None else total + term
    return (
        codes.select(F.col(id_col), total.alias("adc_dist"))
        # nulls LAST as a belt-and-suspenders tie-down: an impossible
        # NULL distance must never displace a real top-k entry
        .orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col))
        .limit(k_top)
    )


def nearest_centroid_confusion(
    emb: DataFrame,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification of every vector
    against its corpus's own label centroids — the embedding-quality
    evaluation step of a training-data pipeline: if the labels are
    meaningful, the per-label mean vectors should reclassify most
    members correctly, and the confusion off-diagonal names the label
    pairs whose embedding regions overlap.

    Fixed-point contract (same arithmetic as
    :func:`kmeans_fixed_point`): vectors quantize to
    ``floor(x · scale)`` BIGINTs, label centroids use the
    negative-safe floor mean ``(Σq + n·scale) div n − scale``, and
    distances are exact integer squared-L2 with ties broken by the
    smaller label — every prediction bit-identical across engines.

    Returns (__id, __label, pred) — one row per vector.

    Scale shape: the centroid table is one posexplode + hash agg
    (labels × dim rows, map-side combinable); only that bounded table
    is collected, and the centroids re-enter the plan as literals, so
    the assignment is ONE scan with a codegen'd fold per label — no
    vec × label shuffle.  At 1000 labels the literal array still
    beats a join: 1000 × dim ints is a few MB of plan."""
    q = emb.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("long").alias("__label"),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * scale).cast("long")
        ).alias("q"),
    ).localCheckpoint(eager=True)  # quantize once: centroid agg + assignment
    cm = (
        q.select("__label", F.posexplode("q").alias("pos", "val"))
        .groupBy("__label", "pos")
        .agg(
            F.expr(
                f"(sum(val) + count(1) * {scale}L) div count(1) - {scale}L"
            ).alias("cval")
        )
    )
    by_label: dict[int, dict[int, int]] = {}
    for r in cm.collect():  # labels × dim rows, bounded
        by_label.setdefault(r["__label"], {})[r["pos"]] = r["cval"]
    cent = sorted(
        (lbl, [comps[p] for p in sorted(comps)])
        for lbl, comps in by_label.items()
    )
    return q.select(
        "__id",
        "__label",
        F.expr(_argmin_cid_sql(cent, "q")).alias("pred"),
    )
