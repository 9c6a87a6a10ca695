"""Manifest-committed table (MCT): a minimal transactional layout for
hash-bucketed parquet — the missing piece `streaming.upsert.merge_batch`
documents (its plain-parquet dynamic overwrite has a non-atomic
delete+rename window it can only DETECT; a table format is what
actually closes it; this container ships no Delta/Iceberg, so this is
the Spark-first ~150-line equivalent of their core commit protocol).

Layout::

    target/
      data/v{N}/p_bucket={b}/part-*.parquet   -- immutable once written
      manifest-v{N}.json                      -- {"version": N,
                                                  "buckets": {b: [files]}}

Commit protocol (single writer, optimistic):

1. read the current manifest (highest N); compute the affected buckets;
2. write the NEW state of those buckets under ``data/v{N+1}/`` —
   existing files are never touched or deleted;
3. write ``_tmp-manifest-v{N+1}`` carrying forward the unaffected
   buckets' file lists and swapping in the new files, then ``rename``
   it to ``manifest-v{N+1}.json``.

The rename is the commit point: atomic on local/HDFS-like stores, and
it FAILS if the destination exists — which doubles as optimistic
concurrency control (a racing writer loses cleanly).  A crash anywhere
before the rename leaves only orphan data files; the current manifest
— and therefore every reader and the next merge — still sees the old
committed state.  No ambiguity, no refusal path, no re-seed risk.
Object stores without atomic rename (S3) need a conditional-put
catalog instead; that swap is isolated to ``_commit_manifest``.

Readers pin a manifest version → snapshot isolation and time travel
for free (``read_snapshot(..., version=K)``).  ``vacuum`` drops data
dirs unreferenced by the kept manifests.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.sources import cdc

BUCKET_COL = "p_bucket"
_MANIFEST_RE = re.compile(r"manifest-v(\d+)\.json$")


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _jpath(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def list_versions(spark: SparkSession, target: str) -> list[int]:
    fs, jvm = _fs(spark, target)
    root = _jpath(jvm, target)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        m = _MANIFEST_RE.match(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_manifest(spark: SparkSession, target: str, version: int) -> dict:
    # read through Spark's text source — filesystem-agnostic, and py4j
    # cannot surface JVM-side byte[] mutations (FSDataInputStream
    # readFully into a gateway array reads back zeros)
    lines = spark.read.text(f"{target}/manifest-v{version}.json").collect()
    return json.loads("\n".join(r[0] for r in lines))


def read_snapshot(
    spark: SparkSession, target: str, version: int | None = None
) -> DataFrame:
    """The committed state at ``version`` (default: latest) — snapshot-
    isolated: the manifest's file list is immutable, so the read is
    unaffected by any concurrent commit or vacuum of other versions."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    manifest = _read_manifest(spark, target, v)
    files = [f for fl in manifest["buckets"].values() for f in fl]
    if not files:
        raise FileNotFoundError(f"version {v} of {target!r} is empty")
    return _read_files(spark, target, files)


def _read_files(spark: SparkSession, target: str, rel_files: list[str]) -> DataFrame:
    """Read manifest-relative files spanning multiple ``data/v{N}``
    dirs.  Each version dir is its own partition-discovery base (one
    shared basePath would make Spark see conflicting ``v1``/``v2``
    levels); the bucket partition column is dropped — manifests, not
    directory layout, are the source of truth for bucket membership."""
    by_vdir: dict[str, list[str]] = {}
    for f in rel_files:
        vdir = "/".join(f.split("/")[:2])  # data/vN
        by_vdir.setdefault(vdir, []).append(f"{target}/{f}")
    parts = [
        spark.read.option("basePath", f"{target}/{vdir}")
        .parquet(*fl)
        .drop(BUCKET_COL)
        for vdir, fl in sorted(by_vdir.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_keys(
    spark: SparkSession,
    target: str,
    key_cols: list[str],
    keys: list[tuple],
    n_buckets: int = 64,
    version: int | None = None,
) -> DataFrame:
    """Bucket-pruned point lookup: the key→bucket mapping is immutable
    (same xxhash64 the merge uses), so a lookup reads only the manifest
    files of the touched buckets — O(touched/n_buckets) of the table,
    the lakehouse stand-in for the reference's primary-key index.
    ``n_buckets`` must match the table's layout."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    v = version if version is not None else versions[-1]
    manifest = _read_manifest(spark, target, v)
    key_df = spark.createDataFrame(keys, key_cols)
    wanted = {
        str(r[0])
        for r in key_df.select(
            F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    }
    files = [
        f for b, fl in manifest["buckets"].items() if b in wanted for f in fl
    ]
    if not files:
        # none of the touched buckets exist → empty result, keyed schema
        return _read_files(
            spark, target,
            [f for fl in manifest["buckets"].values() for f in fl],
        ).limit(0).join(key_df, key_cols, "inner")
    return _read_files(spark, target, files).join(
        F.broadcast(key_df), key_cols, "inner"
    )


def _commit_manifest(
    spark: SparkSession, target: str, manifest: dict
) -> None:
    """Write-then-rename commit.  The rename refuses (returns false) if
    the destination manifest already exists — a racing writer committed
    first; surface that instead of clobbering."""
    fs, jvm = _fs(spark, target)
    v = manifest["version"]
    tmp = _jpath(jvm, f"{target}/_tmp-manifest-v{v}")
    final = _jpath(jvm, f"{target}/manifest-v{v}.json")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    # pre-check + rename-result check: HDFS rename refuses an existing
    # destination; some local filesystems overwrite instead, so the
    # explicit exists() guard keeps the optimistic-concurrency contract
    # everywhere (the residual check-to-rename window is the documented
    # single-writer assumption — same as Delta on non-atomic stores)
    if fs.exists(final) or not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"commit of version {v} lost the race: {final} already exists "
            "(concurrent writer) — re-read the new state and retry"
        )


def _bucket_files(spark: SparkSession, data_dir: str) -> dict[str, list[str]]:
    """bucket id → files actually produced under data/v{N}/ (relative
    to the table root)."""
    fs, jvm = _fs(spark, data_dir)
    root = _jpath(jvm, data_dir)
    out: dict[str, list[str]] = {}
    if not fs.exists(root):
        return out
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith(f"{BUCKET_COL}="):
            continue
        b = name.split("=", 1)[1]
        files = [
            f2.getPath().getName()
            for f2 in fs.listStatus(st.getPath())
            if not f2.getPath().getName().startswith(("_", "."))
        ]
        rel_dir = "/".join(data_dir.rstrip("/").split("/")[-2:])
        out[b] = [f"{rel_dir}/{name}/{f2}" for f2 in sorted(files)]
    return out


def merge_versioned(
    batch: DataFrame,
    target: str,
    key_cols: list[str],
    version_col: str = "ts_ms",
    n_buckets: int = 64,
) -> int:
    """Latest-wins merge with an ATOMIC commit; returns the committed
    version.  Same change-row contract and per-bucket cost model as
    ``streaming.upsert.merge_batch`` (reads back only the affected
    buckets), but existing files are never modified — a crash at any
    point leaves the previous version fully intact and visible.
    """
    spark = batch.sparkSession
    bucket_of = lambda cols: F.pmod(F.xxhash64(*cols), F.lit(n_buckets))  # noqa: E731
    versions = list_versions(spark, target)
    current_v = versions[-1] if versions else 0
    affected = sorted(
        str(r[0])
        for r in batch.select(
            bucket_of([F.col(k) for k in key_cols]).alias(BUCKET_COL)
        )
        .distinct()
        .collect()
    )
    carried: dict[str, list[str]] = {}
    if versions:
        manifest = _read_manifest(spark, target, current_v)
        current_files = [
            f for b in affected for f in manifest["buckets"].get(b, [])
        ]
        carried = {
            b: fl
            for b, fl in manifest["buckets"].items()
            if b not in affected
        }
        if current_files:
            current = _read_files(spark, target, current_files)
            as_changes = current.select(
                *[F.col(k) for k in key_cols],
                F.lit("c").alias("op"),
                F.lit(-1).cast("long").alias(version_col),
                F.struct(*[F.col(c) for c in current.columns]).alias("after"),
            )
            all_changes = batch.unionByName(as_changes)
        else:
            all_changes = batch
    else:
        all_changes = batch
    new_state = cdc.apply_latest_state(
        all_changes, key_cols, version_col=version_col
    ).withColumn(BUCKET_COL, bucket_of(key_cols))
    new_v = current_v + 1
    data_dir = f"{target}/data/v{new_v}"
    new_state.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_dir)
    new_files = _bucket_files(spark, data_dir)  # only non-empty buckets
    buckets = dict(carried)
    for b in affected:
        buckets.pop(b, None)
        if b in new_files:
            buckets[b] = new_files[b]
    _commit_manifest(
        spark, target, {"version": new_v, "buckets": buckets}
    )
    return new_v


def vacuum(spark: SparkSession, target: str, keep_last: int = 2) -> list[int]:
    """Drop data versions referenced ONLY by manifests older than the
    ``keep_last`` newest; returns removed manifest versions.  Readers
    of kept versions are unaffected (their manifests and files stay)."""
    versions = list_versions(spark, target)
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    if not drop:
        return []
    fs, jvm = _fs(spark, target)
    referenced: set[str] = set()
    for v in keep:
        m = _read_manifest(spark, target, v)
        referenced |= {
            f.split("/")[1] for fl in m["buckets"].values() for f in fl
        }  # data/<vdir>/... → vdir
    for v in drop:
        fs.delete(_jpath(jvm, f"{target}/manifest-v{v}.json"), False)
    data_root = _jpath(jvm, f"{target}/data")
    if fs.exists(data_root):
        for st in fs.listStatus(data_root):
            name = st.getPath().getName()
            if name not in referenced:
                fs.delete(st.getPath(), True)
    return drop
