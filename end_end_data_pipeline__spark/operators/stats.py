"""Statistical / sketch operators: guaranteed heavy hitters via a
Misra-Gries pre-filter, and an integer-quantized covariance gramian
(the distributed building block behind PCA).

Why these shapes at 100 TB:

- **Heavy hitters**: a plain ``GROUP BY key HAVING count > n/k``
  shuffles the FULL key space — at 100 TB of events that is billions
  of distinct keys hashed across the cluster just to keep a handful.
  Misra-Gries with ``k`` counters per partition is a one-scan,
  O(k)-memory sketch whose classical guarantee (any key with global
  frequency > n/k exceeds n_p/k in at least one partition, else its
  partition frequencies could not sum past n/k) means the union of
  per-partition candidates is a SUPERSET of every true heavy hitter.
  A second exact-count pass restricted to that tiny candidate set
  (≤ k × partitions keys, broadcast semi-join — no full-key shuffle)
  then filters with the exact predicate, so the FINAL answer is
  exactly the SQL answer, independent of partitioning.  The sketch is
  only a pruning device; correctness never depends on it.

- **Covariance / PCA**: the covariance matrix of a d-dim embedding
  corpus is X^T X — a d×d result no matter how many rows, so the
  right plan is partial gramians per Arrow batch (one numpy matmul)
  reduced by a hash agg on (i, j).  Quantizing components to integers
  first (same engine-neutral floor(x·S + 0.5) recipe as
  ``similarity.quantize_int8``) makes every partial sum exact in
  int64, so the distributed reduction is order-independent and the
  DuckDB oracle can replay it bit-for-bit; the one lossy step (a
  double division at the end) is the same expression tree on both
  engines.  Eigen-decomposition of the d×d result is a driver-local
  numpy call (d ≤ a few thousand) — the standard big-data PCA split.

No reference counterpart: the reference's analytics layer was never
built (SURVEY.md §0); these are the §2 UD-class extensions a
training-data pipeline needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """One-scan Misra-Gries sketch per partition → candidate keys.

    Returns (key string, part_rows long): candidate rows carry a key
    and NULL part_rows; one row per partition carries key=NULL and the
    partition's row count (so callers get n without a second scan).
    Candidate sets depend on partitioning — callers MUST exact-verify
    (see :func:`heavy_hitters`); only the superset property is stable.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            for key in pdf[key_col].astype(str):
                n_rows += 1
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    # decrement-all step: every counter pays one unit
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        out = pd.DataFrame(
            {
                "key": list(counters.keys()) + [None],
                "part_rows": [None] * len(counters) + [n_rows],
            }
        )
        yield out

    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        sketch, schema="key string, part_rows long"
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    n_keys_hint: int | None = None,
) -> DataFrame:
    """Exact keys with frequency·k > total rows, found without a
    full-key-space shuffle: MG candidates (superset guarantee), then
    an exact count restricted to candidates via broadcast semi-join.

    Output (key string, freq long) — identical to
    ``GROUP BY key HAVING count(*)·k > n`` by the superset argument in
    the module docstring.  The threshold compare is kept in integer
    arithmetic (freq·k > n) so no engine rounds a division.

    ``n_keys_hint``: callers that KNOW the key domain is small (an
    enum-like column — brands, statuses, currencies) should pass its
    cardinality.  Below 100k keys the two-pass MG shape is strictly
    worse than one exact pass — the sketch scan reads the input once
    just to learn candidates the hint already names, and the exact
    pass reads it AGAIN — so the operator switches to a single
    partial-agg ``GROUP BY`` (map-side combine bounds the shuffle at
    hint × partitions rows) plus a scalar total, halving the scan
    count.  Identical output either way; the MG path remains the
    billion-key scale shape (r07, VERDICT r06 task 6).

    The hint is TRUSTED, and a WRONG hint is a perf hazard, not a
    correctness one (r07 advice): if the column actually holds far
    more keys than hinted (say a user-id mislabeled as an enum), the
    single-pass ``GROUP BY`` still returns the exact answer, but its
    shuffle carries every distinct key — the map-side-combine bound
    the hint promised (hint × partitions) no longer holds and the
    sketch's memory guarantee is forfeited.  Pass a hint only for
    domains whose cardinality is structural (enums, currencies,
    brands); when in doubt, omit it and take the two-pass MG path.

    NULL keys count toward the row total on BOTH paths but are never
    reported as heavy hitters (the MG sketch string-casts them into a
    candidate that can't match a NULL key in the verification
    semi-join, so the hint path filters them from its result
    explicitly to keep the two paths output-identical).
    """
    if n_keys_hint is not None and n_keys_hint <= 100_000:
        keyed = df.select(F.col(key_col).cast("string").alias("key"))
        exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("freq"))
        exact = exact.localCheckpoint(eager=True)
        n_total = exact.agg(F.sum("freq").alias("n")).collect()[0]["n"] or 0
        return exact.filter(
            (F.col("freq") * F.lit(k) > F.lit(n_total))
            & F.col("key").isNotNull()
        ).select(F.col("key"), F.col("freq"))
    sk = misra_gries_candidates(df, key_col, k).localCheckpoint(eager=True)
    n_total = sk.agg(F.sum("part_rows").alias("n")).collect()[0]["n"] or 0
    cands = sk.filter(F.col("key").isNotNull()).select("key").distinct()
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    exact = (
        keyed.join(F.broadcast(cands), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return exact.filter(F.col("freq") * F.lit(k) > F.lit(n_total)).select(
        F.col("key"), F.col("freq")
    )


def quantized_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 10_000,
    clamp: int = 32_767,
) -> DataFrame:
    """Covariance matrix of a vector column via exact integer partial
    gramians: q_i = clamp(floor(x_i·scale + 0.5)) per component, one
    int64 ``q^T q`` matmul per Arrow batch, hash-agg reduce on (i, j),
    then cov(i,j) = (n·S_ij − S_i·S_j) / (n·n·scale²) with the double
    division as the single lossy step.

    Output: (i int, j int, cov double) for i ≤ j — d(d+1)/2 rows.
    Requires equal-length vectors (ragged input raises in the worker).
    """
    import numpy as np

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s_ij = None  # d×d upper-triangular int64 sums
        s_i = None  # marginal int64 sums
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.clip(np.floor(x * scale + 0.5), -clamp, clamp).astype(np.int64)
            g = q.T @ q
            m = q.sum(axis=0)
            s_ij = g if s_ij is None else s_ij + g
            s_i = m if s_i is None else s_i + m
            n += len(pdf)
        if s_ij is None:
            return
        d = s_ij.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(d), [-1]]).astype(np.int32),
                "j": np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int32),
                "s": np.concatenate([s_ij[iu, ju], s_i, [n]]).astype(np.int64),
            }
        )

    # Per-batch partials are int64-safe (one Arrow batch ≤ ~10k rows ×
    # clamp² ≈ 2.5e11 per cell); the global reduce and the n·S − S·S
    # combine run in DECIMAL(38,0) so corpus-scale n (1e9+ rows) cannot
    # overflow — the DuckDB oracle mirrors this with HUGEINT.
    parts = df.select(vec_col).mapInPandas(partial, schema="i int, j int, s long")
    sums = (
        parts.groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("s"))
        .localCheckpoint(eager=True)
    )
    # n is one exact integer — a bounded scalar collect off the
    # checkpointed sums (same pattern as the catalog's max-key scalar),
    # keeping the plan free of keyless/cross joins.
    n_rows = sums.filter((F.col("i") == -1) & (F.col("j") == -1)).collect()
    n = int(n_rows[0]["s"]) if n_rows else 0
    if n == 0:
        raise ValueError("quantized_covariance: input has no rows")
    n_dec = F.lit(n).cast("decimal(38,0)")
    marg = sums.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("mi"), F.col("s").alias("m")
    )
    pair = sums.filter(F.col("j") >= 0)
    return (
        pair.join(
            F.broadcast(marg.withColumnRenamed("mi", "i").withColumnRenamed("m", "m_i")),
            "i",
        )
        .join(
            F.broadcast(marg.withColumnRenamed("mi", "j").withColumnRenamed("m", "m_j")),
            "j",
        )
        .select(
            "i",
            "j",
            (
                (n_dec * F.col("s") - F.col("m_i") * F.col("m_j")).cast("double")
                / (
                    F.lit(float(n))
                    * F.lit(float(n))
                    * F.lit(float(scale) * float(scale))
                )
            ).alias("cov"),
        )
    )
