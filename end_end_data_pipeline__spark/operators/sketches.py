"""Count-min sketch: mergeable frequency estimation at stream/lake
scale (SURVEY.md §2 A4 family, alongside HLL distinct counting).

The CMS answers "how many times did key k appear?" with a d x w counter
grid: each of the ``depth`` rows hashes k to one of ``width`` cells and
increments it; the estimate is the MIN over the d cells, which
overestimates by at most n/width with probability 1 - (1/2)^depth
(Cormode & Muthukrishnan 2005).  Why it matters at 100 TB: the sketch
is d x w rows NO MATTER the input size, the build is one groupBy whose
partial aggregation combines map-side (every executor folds its rows
into <= d x w cells before the shuffle), and two sketches MERGE by
cell-wise addition — per-partition, per-day, or per-stream-batch
sketches compose without re-reading data, the property the reference's
row-at-a-time consumer could never offer.

Hashing is the repo-wide engine-stable md5-u32 recipe (row salt ``j``
prepended), so a DuckDB oracle replays the exact grid — estimates are
bit-identical, not just statistically close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(key, j: int, width: int):
    """Cell index of ``key`` in CMS row ``j``: first 32 md5 bits of
    "j|key" modulo width.  DuckDB replica:
    ``('0x' || substr(md5(j || '|' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % width``."""
    s = F.concat_ws("|", F.lit(str(j)), key.cast("string"))
    u32 = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    return (u32 % width).cast("int")


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: one row per non-empty (j, cell) with its count.

    One Generate (explode of ``depth`` per-row cells) + one hash agg;
    partial aggregation caps the shuffle at d x w rows per map task.
    Keys with NULL are skipped (no frequency to attribute).
    """
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cell(key, j, width).alias("cell"))
            for j in range(depth)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): cell-wise sum.
    This is the whole scale story — daily/partition sketches compose
    into weekly/global ones without touching the source data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "cell").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over its d cells.

    The keys frame re-derives its (j, cell) coordinates with the same
    hash, broadcast-joins the (<= d x w row) sketch, and takes the min;
    a missing cell means count 0 (only possible for keys absent from
    the build input).  Output: one row per distinct ``key_col`` value
    + ``cms_est`` (other ``keys`` columns are NOT carried — re-join on
    the key for payloads).  A NULL probe key estimates 0: ``cms_build``
    never counts NULLs, and hashing one here would drop the null from
    the ``concat_ws`` salt and probe the bare row-salt cells — a bogus
    nonzero estimate (same hazard class as ``bloom_probe``'s NULL fix).
    """
    key = F.col(key_col)
    coords = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cell(key, j, width).alias("cell"))
            for j in range(depth)
        ]
    )
    exploded = keys.select(key_col, F.explode(coords).alias("c")).select(
        key_col, F.col("c.j").alias("j"), F.col("c.cell").alias("cell")
    )
    joined = exploded.join(F.broadcast(sketch), ["j", "cell"], "left")
    est = F.min(F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(key_col).agg(
        F.when(key.isNull(), F.lit(0))
        .otherwise(est)
        .cast("long")
        .alias("cms_est")
    )


def _bit_pos(key, j: int, n_bits: int):
    """Bit position of ``key`` under hash ``j``: same md5-u32 recipe as
    the CMS cells (row salt prepended), modulo ``n_bits``.  DuckDB
    replica: ``('0x' || substr(md5(j || '|' || CAST(k AS VARCHAR)), 1,
    8))::BIGINT % n_bits``."""
    s = F.concat_ws("|", F.lit(str(j)), key.cast("string"))
    u32 = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    return (u32 % n_bits).cast("int")


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 4096, n_hashes: int = 4
) -> DataFrame:
    """Bloom filter over ``key_col``: one row per SET bit position.

    Sparse-set representation instead of a packed bitmap: at most
    ``n_bits`` rows regardless of input size, built with one Generate
    (explode of the k per-key positions) + one distinct whose partial
    agg combines map-side.  Two filters with the same (n_bits,
    n_hashes) MERGE by union+distinct — per-partition/per-day filters
    compose without re-reading data, and the set survives a parquet
    round-trip (unlike an in-memory bitmap).  NULL keys are skipped.
    """
    key = F.col(key_col)
    positions = F.array(
        *[_bit_pos(key, j, n_bits) for j in range(n_hashes)]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(positions).alias("pos"))
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge same-shape Bloom filters: union of set positions."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Membership verdict per probe key: member iff ALL ``n_hashes``
    positions are set.  No false negatives by construction; false-
    positive rate ~ (1 - e^(-kn/m))^k.

    The probe re-derives its positions, broadcast-joins the (<= n_bits
    row) filter, and counts hits — the explicit form of the bloom-prune
    a 100 TB join wants on its big probe side before the shuffle.
    Output: one row per DISTINCT probe key + boolean ``bloom_member``.
    Probe keys are de-duplicated first: a repeated key would double
    its group's row count and make ``count == n_hashes`` report a true
    member as False — violating the no-false-negatives guarantee.
    A NULL probe key gets ``bloom_member = false`` (its row is kept):
    ``bloom_build`` skips NULLs so NULL is never a member, and hashing
    one here would silently drop the null from the ``concat_ws`` salt
    (probing the bare salt strings — a bogus verdict that could read
    true, diverging from a NULL-propagating SQL replica).
    """
    key = F.col(key_col)
    positions = F.array(
        *[_bit_pos(key, j, n_bits) for j in range(n_hashes)]
    )
    uniq = keys.select(key_col).distinct()
    exploded = uniq.select(key_col, F.explode(positions).alias("pos"))
    marked = bloom.withColumn("__hit", F.lit(1))
    return (
        exploded.join(F.broadcast(marked), "pos", "left")
        .groupBy(key_col)
        .agg(
            (key.isNotNull() & (F.count("__hit") == F.lit(n_hashes))).alias(
                "bloom_member"
            )
        )
    )


# --- HyperLogLog (p=8, m=256 registers), integer-exact estimation ----------
#
# The estimate pipeline is pure BIGINT arithmetic so DuckDB replays it
# bit-for-bit: the harmonic sum uses S_int = sum_j 2^(25 - M_j) (an
# integer - every term a power of two), the bias constant alpha_256 =
# 0.7213/(1 + 1.079/256) is carried as the exact rational
# 923264/1285395 multiplied through, and the small-range linear-
# counting correction m*ln(m/V) comes from a 255-entry precomputed
# integer table (scaled 1e6) inlined in BOTH engines - a lookup, not a
# runtime transcendental (ln is engine-ulp-unstable, the repo-wide
# determinism rule).
_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256
_HLL_WBITS = 32 - _HLL_P  # 24 hash bits feed the rank
# numerator of alpha_m * m^2 * 2^WBITS+1 ... kept as one literal:
# 923264 * 65536 * 2^25  (fits in int64: ~2.03e18)
_HLL_NUM = 923264 * (_HLL_M * _HLL_M) * (1 << (_HLL_WBITS + 1))
_HLL_DEN = 1285395
_HLL_SMALL = 5 * _HLL_M // 2  # 2.5 m - the linear-counting regime bound

import math as _math

# ln-table[v] = round(1e6 * ln(256 / v)) for v in 1..255 (v = count of
# zero registers).  Generated once; inlined into the DuckDB oracle via
# hll_ln_table_sql().
_HLL_LN_TABLE = tuple(
    int(round(1_000_000 * _math.log(_HLL_M / v))) for v in range(1, _HLL_M)
)


def hll_ln_table_sql() -> str:
    """The linear-counting table as a DuckDB list literal (1-based)."""
    return "[" + ", ".join(str(v) for v in _HLL_LN_TABLE) + "]"


def hll_build(df: DataFrame, key_col: str, *group_cols: str) -> DataFrame:
    """HLL registers over ``key_col``, optionally per group: one row
    per (group, idx) with the max rank.  idx = md5-u32 % 256; rank =
    25 - floor_log2(remaining 24 bits) (25 when they are all zero),
    computed via the length of the leading-zero-trimmed binary string
    - exact on integers in any engine.  One hash agg, map-side
    combinable to <= m rows per group per task; NULL keys skipped."""
    key = F.col(key_col)
    u32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    w = (u32 / F.lit(_HLL_M)).cast("long")  # u32 DIV 256
    rank = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.conv(w, 10, 2))
    )
    return (
        df.filter(key.isNotNull())
        .select(
            *group_cols,
            (u32 % _HLL_M).cast("int").alias("idx"),
            rank.cast("int").alias("rank"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rank").alias("m"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge same-shape register sets: per-register MAX — per-day or
    per-partition sketches compose without re-reading data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    non_m = [c for c in out.columns if c != "m"]
    return out.groupBy(*non_m).agg(F.max("m").alias("m"))


def hll_estimate(registers: DataFrame, *group_cols: str) -> DataFrame:
    """Integer-exact cardinality estimate per group from the register
    rows: raw = alpha*m^2 / sum 2^-M_j carried as ``NUM DIV (DEN *
    S_int)``; when V zero-registers exist and raw <= 2.5m, the
    small-range linear-counting correction ``m * ln(m/V)`` applies via
    the precomputed integer table.  Output: group cols +
    ``hll_estimate`` (BIGINT) + ``n_zero_registers``."""
    wb = _HLL_WBITS + 1
    agg = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {wb} - m)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << wb).cast("long")
        ).alias("s_int"),
        (
            F.lit(_HLL_M)
            - F.count(F.lit(1))
            + F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        )
        .cast("long")
        .alias("n_zero_registers"),
    )
    raw = F.expr(f"CAST({_HLL_NUM} AS BIGINT) DIV ({_HLL_DEN} * s_int)")
    lc = F.expr(
        f"CAST({_HLL_M} AS BIGINT) * element_at("
        + "array("
        + ", ".join(f"CAST({v} AS BIGINT)" for v in _HLL_LN_TABLE)
        + "), CAST(n_zero_registers AS INT)) DIV 1000000"
    )
    est = F.when(
        (F.col("n_zero_registers") > 0) & (raw <= F.lit(_HLL_SMALL)), lc
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        est.cast("long").alias("hll_estimate"),
        "n_zero_registers",
    )


def hll_estimate_sql(s_int: str, n_zero: str) -> str:
    """The integer HLL estimate as DuckDB SQL over precomputed
    fragments — ONE definition shared by every HLL oracle (per-type,
    rolling, streaming) so the estimate arithmetic can never fork."""
    raw = f"{_HLL_NUM} // ({_HLL_DEN} * {s_int})"
    lc = f"{_HLL_M} * {hll_ln_table_sql()}[CAST({n_zero} AS INT)] // 1000000"
    return (
        f"CASE WHEN {n_zero} > 0 AND {raw} <= {_HLL_SMALL} "
        f"THEN {lc} ELSE {raw} END"
    )
