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
    the build input).  Output: keys columns + ``cms_est``.
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
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est")
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
    Output: ``keys`` columns + boolean ``bloom_member``.
    """
    key = F.col(key_col)
    positions = F.array(
        *[_bit_pos(key, j, n_bits) for j in range(n_hashes)]
    )
    exploded = keys.select(key_col, F.explode(positions).alias("pos"))
    marked = bloom.withColumn("__hit", F.lit(1))
    return (
        exploded.join(F.broadcast(marked), "pos", "left")
        .groupBy(key_col)
        .agg(
            (F.count("__hit") == F.lit(n_hashes)).alias("bloom_member")
        )
    )
