"""Manifest-committed table (MCT): a minimal transactional layout for
hash-bucketed parquet — the missing piece `streaming.upsert.merge_batch`
documents (its plain-parquet dynamic overwrite has a non-atomic
delete+rename window it can only DETECT; a table format is what
actually closes it; this container ships no Delta/Iceberg, so this is
the Spark-first ~150-line equivalent of their core commit protocol).

Layout::

    target/
      data/v{N}-{token}/p_bucket={b}/part-*.parquet  -- immutable once written
      manifest-v{N}.json   -- {"version": N, "schema": <json>,
                               "buckets": {b: [files]},
                               "stats": {file: {col: [min, max]}}}

Per-file column [min, max] stats ride in the manifest (files are
immutable, so stats are too — carried forward untouched for files a
commit keeps), giving ``read_where`` Delta-style data skipping on
range/point predicates without opening a single pruned file; see
``compact(cluster_by=...)`` for the layout that makes skipping
selective on an upsert table.

Commit protocol (optimistic, multi-writer safe):

1. read the current manifest (highest N); compute the affected buckets;
2. write the NEW state of those buckets under a WRITER-UNIQUE dir
   ``data/v{N+1}-{token}/`` — existing files are never touched or
   deleted, and two racers writing the same target version cannot
   clobber each other's part files (each attempt owns its own dir);
3. write ``_tmp-manifest-v{N+1}`` carrying forward the unaffected
   buckets' file lists and swapping in the new files, then ``rename``
   it to ``manifest-v{N+1}.json``.

The rename is the commit point: atomic on local/HDFS-like stores, and
it FAILS if the destination exists — which doubles as optimistic
concurrency control.  The losing racer's data dir is an orphan the
loser deletes on the way out (and ``vacuum`` would reap anyway); the
committed manifest only ever references files under the winner's dir,
so "a racing writer loses cleanly" holds for data files too.  A crash
anywhere before the rename leaves only orphan data files; the current
manifest — and therefore every reader and the next merge — still sees
the old committed state.  Object stores without atomic rename (S3)
need a conditional-put catalog instead; that swap is isolated to
``_commit_manifest``.  ``merge_versioned_retry`` is the bounded
re-read/re-merge/re-commit loop a loser runs.

Readers pin a manifest version → snapshot isolation and time travel
for free (``read_snapshot(..., version=K)``).  ``vacuum`` drops data
dirs unreferenced by the kept manifests.  The manifest carries the
table schema, so an empty committed state (a merge that deleted every
key) reads back as an empty DataFrame, not an error, and point lookups
hash keys with the TABLE's column types (Spark's ``xxhash64`` is
type-sensitive: a long hashes differently from an int, so bucketing
inferred-type Python literals directly could silently prune to the
wrong buckets).
"""

from __future__ import annotations

import json
import re
import uuid

import datetime as _dt
import time
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    AtomicType,
    BinaryType,
    BooleanType,
    DecimalType,
    StructType,
    TimestampType,
)

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


def _manifest_schema(manifest: dict) -> StructType | None:
    """The table schema persisted at commit time (None for pre-schema
    manifests)."""
    sj = manifest.get("schema")
    return StructType.fromJson(sj) if sj else None


def read_snapshot(
    spark: SparkSession,
    target: str,
    version: int | None = None,
    as_of: "_dt.datetime | float | None" = None,
) -> DataFrame:
    """The committed state at ``version`` (default: latest) — snapshot-
    isolated: the manifest's file list is immutable, so the read is
    unaffected by any concurrent commit or vacuum of other versions.
    ``as_of`` (datetime or epoch seconds) instead picks the newest
    version committed at-or-before that wall-clock time — TIMESTAMP AS
    OF time travel (versions from before commit times were recorded
    never match)."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    if as_of is not None:
        if version is not None:
            raise ValueError("pass either version or as_of, not both")
        cutoff = (
            as_of.timestamp() if isinstance(as_of, _dt.datetime) else float(as_of)
        )
        eligible = [
            v
            for v in versions
            if (ts := _read_manifest(spark, target, v).get("committed_at"))
            is not None
            and ts <= cutoff
        ]
        if not eligible:
            raise FileNotFoundError(
                f"no version of {target!r} committed at or before {as_of}"
            )
        version = eligible[-1]
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    manifest = _read_manifest(spark, target, v)
    files = [f for fl in manifest["buckets"].values() for f in fl]
    schema = _manifest_schema(manifest)
    if not files:
        # a merge that deleted every key is a legitimate empty state
        if schema is None:
            raise FileNotFoundError(f"version {v} of {target!r} is empty")
        return spark.createDataFrame([], schema)
    out = _read_files(spark, target, files)
    if schema is not None:
        # pin the snapshot to ITS version's schema (column order, and
        # nulls for columns newer files carry that this version's
        # pre-evolution files lack)
        out = _pin_schema(out, schema)
    return out


def _read_files(spark: SparkSession, target: str, rel_files: list[str]) -> DataFrame:
    """Read manifest-relative files spanning multiple ``data/v{N}``
    dirs.  Each version dir is its own partition-discovery base (one
    shared basePath would make Spark see conflicting ``v1``/``v2``
    levels); the bucket partition column is dropped — manifests, not
    directory layout, are the source of truth for bucket membership.
    ``allowMissingColumns`` handles schema evolution: files written
    before a column was added read back with nulls for it."""
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
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def read_keys(
    spark: SparkSession,
    target: str,
    key_cols: list[str],
    keys: list[tuple],
    n_buckets: int | None = None,
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
    n_buckets = _resolve_n_buckets(manifest, n_buckets, target)
    schema = _manifest_schema(manifest)
    key_df = spark.createDataFrame(keys, key_cols)
    if schema is not None:
        # pin the probe keys to the TABLE's column types before hashing
        # — xxhash64(int) != xxhash64(long), so inferred-literal types
        # would silently prune to the wrong buckets
        table_types = {f.name: f.dataType for f in schema.fields}
        key_df = key_df.select(
            *[F.col(k).cast(table_types[k]).alias(k) for k in key_cols]
        )
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
        # none of the touched buckets exist → empty result, table schema
        # straight from the manifest (no file listing / footer reads)
        if schema is not None:
            return spark.createDataFrame([], schema)
        all_files = [f for fl in manifest["buckets"].values() for f in fl]
        if not all_files:
            raise FileNotFoundError(
                f"version {v} of {target!r} is empty and pre-dates "
                "manifest schemas — cannot derive a result schema"
            )
        # pre-schema fallback: one file is enough for the schema
        return (
            _read_files(spark, target, all_files[:1])
            .limit(0)
            .join(key_df, key_cols, "inner")
        )
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


def _stats_eligible(dtype) -> bool:
    """Columns worth min/max stats: atomic, orderable, and losslessly
    JSON-encodable.  Decimals are excluded (a float round-trip could
    shave a boundary and mis-prune); binary/bool carry no range
    selectivity; arrays/structs/maps are not orderable."""
    return isinstance(dtype, AtomicType) and not isinstance(
        dtype, (BinaryType, BooleanType, DecimalType)
    )


def _enc_stat(v):
    """JSON-native, ORDER-PRESERVING encoding of a stat or predicate
    value: numbers stay numbers; strings stay strings; dates become
    ISO-8601 strings (ordinal-based, timezone-free); TIMESTAMPS become
    epoch-MICROSECOND integers — the absolute instant, immune to the
    JVM/Python local zone.  A NAIVE datetime is interpreted as UTC
    wall time (the repo-wide pin): ``datetime.isoformat()`` or a
    Python-side ``.collect()`` round-trip would both shift with the
    process ``TZ`` (PySpark converts TimestampType through the LOCAL
    calendar, not the session zone), which the round-7 hostile-TZ
    invariance sweep caught live (``versioned_stats_skipping`` read a
    band shifted by +14 h under TZ=Pacific/Kiritimati)."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _rel_file(path: str) -> str:
    """input_file_name() URI → manifest-relative ``data/v{N}-{token}/
    p_bucket={b}/part-*`` (the last three path segments under data/)."""
    return "data/" + "/".join(path.rstrip("/").split("/")[-3:])


def _collect_stats(
    spark: SparkSession, data_dir: str
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] for every stats-eligible column of a freshly
    written version dir — one bounded O(new data) scan grouped by
    ``input_file_name()``.  (At production scale these numbers already
    sit in the parquet footers the write produced; lifting them from
    there is a zero-scan swap isolated to this function.  min/max skip
    nulls, so an all-null file stores [null, null] and is kept by every
    prune — conservative, never wrong.)"""
    df = spark.read.parquet(data_dir).drop(BUCKET_COL)
    cols = [f.name for f in df.schema.fields if _stats_eligible(f.dataType)]
    null_cols = [f.name for f in df.schema.fields]  # null counts: ALL cols
    # timestamp bounds leave the JVM as epoch-micros (unix_micros), never
    # as Python datetimes: a ``.collect()`` of TimestampType converts
    # through the PROCESS-LOCAL zone, so the ISO string it encodes to
    # would shift with TZ — the manifest must store the absolute instant
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    def _bound(c: str, fn) -> Column:
        a = fn(c)
        return F.unix_micros(a) if isinstance(dtypes[c], TimestampType) else a

    aggs = [
        a
        for c in cols
        for a in (
            _bound(c, F.min).alias(f"mn__{c}"),
            _bound(c, F.max).alias(f"mx__{c}"),
        )
    ]
    aggs += [F.count(F.lit(1)).alias("rows__")]
    aggs += [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"nl__{c}")
        for c in null_cols
    ]
    rows = df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    return {
        _rel_file(r["__f"]): {
            **{
                c: [_enc_stat(r[f"mn__{c}"]), _enc_stat(r[f"mx__{c}"])]
                for c in cols
            },
            # reserved keys (not valid column names in practice): row
            # and per-column null counts power isnull/notnull pruning
            "__rows": r["rows__"],
            "__nulls": {c: r[f"nl__{c}"] for c in null_cols},
        }
        for r in rows
    }


def _carry_stats(
    prev: dict[str, dict], buckets: dict[str, list[str]], new_stats: dict[str, dict]
) -> dict[str, dict]:
    """Stats for the next manifest: fresh entries for new files, prior
    entries carried for every file the new manifest still references
    (files are immutable, so their stats are too)."""
    live = {f for fl in buckets.values() for f in fl}
    out = {f: s for f, s in prev.items() if f in live}
    out.update({f: s for f, s in new_stats.items() if f in live})
    return out


def _file_matches(stats: dict[str, list] | None, col: str, op: str, v) -> bool:
    """Can a file with these [min, max] / null-count stats possibly
    satisfy ``col op v``?  Missing stats (pre-stats file, unknown
    column, all-null file) ⇒ True — pruning is only ever an
    optimization.  ``isnull``/``notnull`` ops (v ignored) prune via
    the per-file null counts."""
    if not stats:
        return True
    if op in ("isnull", "notnull"):
        nulls = stats.get("__nulls", {})
        if col not in nulls:
            return True
        if op == "isnull":
            return nulls[col] > 0
        nrows = stats.get("__rows")
        return nrows is None or nulls[col] < nrows
    if col not in stats:
        return True
    lo, hi = stats[col]
    if lo is None or hi is None:
        return True
    if any(isinstance(b, float) and b != b for b in (lo, hi)):
        return True  # NaN bound (Spark max treats NaN as +inf) — keep
    ev = _enc_stat(v)
    # encoding-generation guard: a manifest written before the
    # epoch-micros timestamp encoding stores ISO strings; comparing
    # those against a micros predicate would be meaningless — keep the
    # file (pruning is only ever an optimization)
    if isinstance(ev, str) != isinstance(lo, str):
        return True
    if op == "=":
        return lo <= ev <= hi
    if op == "<":
        return lo < ev
    if op == "<=":
        return lo <= ev
    if op == ">":
        return hi > ev
    if op == ">=":
        return hi >= ev
    raise ValueError(f"unsupported prune op {op!r} (use = < <= > >=)")


def prune_files(
    manifest: dict, conjuncts: list[tuple[str, str, object]]
) -> list[str]:
    """The file subset of ``manifest`` that can satisfy ALL conjuncts
    ``(col, op, value)`` — pure manifest-driven data skipping, no
    filesystem access.  Exposed separately so tests and operators can
    measure skipping effectiveness."""
    stats = manifest.get("stats", {})
    return [
        f
        for fl in manifest["buckets"].values()
        for f in fl
        if all(_file_matches(stats.get(f), c, op, v) for c, op, v in conjuncts)
    ]


def _conjunct_pred(conjuncts: list[tuple[str, str, object]]) -> Column:
    """Row-level predicate for ``(col, op, value)`` conjuncts — the ONE
    builder shared by ``read_where``'s residual filter and the DML
    rewrite, so pruning and filtering always compare the same instant.
    Naive datetime values mean UTC wall time (the ``_enc_stat``
    contract) and enter the plan as ``timestamp_micros`` literals: a
    bare datetime converts to internal micros through the
    PROCESS-LOCAL calendar, which would shift the selected band with
    the TZ env var — for DML that meant a partially-applied,
    TZ-dependent DELETE/UPDATE (pruning on UTC, row filter on local)."""
    preds: list[Column] = []
    for c, op, val in conjuncts:
        col = F.col(c)
        if isinstance(val, _dt.datetime):
            val = F.timestamp_micros(F.lit(_enc_stat(val)))
        preds.append(
            {
                "=": col == val,
                "<": col < val,
                "<=": col <= val,
                ">": col > val,
                ">=": col >= val,
                "isnull": col.isNull(),
                "notnull": col.isNotNull(),
            }[op]
        )
    return reduce(lambda a, b: a & b, preds) if preds else F.lit(True)


def _pin_schema(df: DataFrame, schema: StructType) -> DataFrame:
    return df.select(
        *[
            F.col(f.name).cast(f.dataType)
            if f.name in df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )


def read_where(
    spark: SparkSession,
    target: str,
    conjuncts: list[tuple[str, str, object]],
    version: int | None = None,
) -> DataFrame:
    """Snapshot read with manifest-stats data skipping: files whose
    [min, max] cannot satisfy the conjunction are never opened, then
    the full predicate is re-applied row-level on the survivors — so
    the result is exactly ``read_snapshot(...).filter(...)`` at
    O(matching files) scan cost.  This is the range-predicate
    complement of ``read_keys``'s hash-bucket pruning: hash bucketing
    is blind to time/value ranges, file stats are blind to point keys;
    together they cover both the reference's indexed lookups and its
    date-partitioned scans.  Skipping selectivity follows the physical
    layout — tightest after ``compact(cluster_by=[...])``."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    manifest = _read_manifest(spark, target, v)
    schema = _manifest_schema(manifest)
    kept = prune_files(manifest, conjuncts)

    def residual(df: DataFrame) -> DataFrame:
        return df.filter(_conjunct_pred(conjuncts))

    if not kept:
        if schema is None:
            raise FileNotFoundError(
                f"version {v} of {target!r} pre-dates manifest schemas — "
                "cannot derive an empty result schema"
            )
        return residual(spark.createDataFrame([], schema))
    out = _read_files(spark, target, kept)
    if schema is not None:
        out = _pin_schema(out, schema)
    return residual(out)


def merge_versioned(
    batch: DataFrame,
    target: str,
    key_cols: list[str],
    version_col: str = "ts_ms",
    n_buckets: int | None = None,
) -> int:
    """Latest-wins merge with an ATOMIC commit; returns the committed
    version.  Same change-row contract and per-bucket cost model as
    ``streaming.upsert.merge_batch`` (reads back only the affected
    buckets), but existing files are never modified — a crash at any
    point leaves the previous version fully intact and visible.
    ``n_buckets`` may be omitted on an existing table (the committed
    layout is used); a mismatching value is refused (see
    ``_resolve_n_buckets``)."""
    spark = batch.sparkSession
    versions = list_versions(spark, target)
    current_v = versions[-1] if versions else 0
    carried: dict[str, list[str]] = {}
    manifest: dict | None = None
    after_fields = None  # batch's after-struct fields (evolution target)
    if versions:
        manifest = _read_manifest(spark, target, current_v)
    n_buckets = _resolve_n_buckets(manifest, n_buckets, target)
    _check_key_cols(manifest, key_cols, target)
    bucket_of = lambda cols: F.pmod(F.xxhash64(*cols), F.lit(n_buckets))  # noqa: E731
    if manifest is not None:
        schema = _manifest_schema(manifest)
        if schema is not None:
            # xxhash64 is type-sensitive: a batch whose key columns
            # drifted (int vs long) would bucket to different ids than
            # the committed layout — refuse loudly, never merge wrong
            table_types = {f.name: f.dataType for f in schema.fields}
            for k in key_cols:
                bt = batch.schema[k].dataType
                if bt != table_types[k]:
                    raise TypeError(
                        f"key column {k!r} is {bt.simpleString()} in the "
                        f"batch but {table_types[k].simpleString()} in "
                        f"{target!r} — cast the batch before merging "
                        "(bucket hashing is type-sensitive)"
                    )
            # schema evolution: NEW after-struct columns are allowed
            # (existing rows read back null for them); dropping or
            # retyping existing columns is refused — a latest-wins
            # merge with partial rows would silently null data
            after_fields = batch.schema["after"].dataType.fields
            batch_types = {f.name: f.dataType for f in after_fields}
            missing = sorted(set(table_types) - set(batch_types))
            if missing:
                raise ValueError(
                    f"batch after-struct lacks existing column(s) "
                    f"{missing} of {target!r} — merges carry full rows; "
                    "to drop a column, rewrite the table"
                )
            for name, bt in batch_types.items():
                if name in table_types and bt != table_types[name]:
                    raise TypeError(
                        f"column {name!r} is {bt.simpleString()} in the "
                        f"batch but {table_types[name].simpleString()} "
                        f"in {target!r} — type changes need a rewrite"
                    )
    affected = sorted(
        str(r[0])
        for r in batch.select(
            bucket_of([F.col(k) for k in key_cols]).alias(BUCKET_COL)
        )
        .distinct()
        .collect()
    )
    if manifest is not None:
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
            if after_fields is not None:
                # mirror the BATCH's after-struct shape exactly (field
                # order and any evolved new columns, null for rows
                # that predate them) so the union is type-identical
                struct_cols = [
                    (
                        F.col(f.name)
                        if f.name in current.columns
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in after_fields
                ]
            else:
                struct_cols = [F.col(c) for c in current.columns]
            as_changes = current.select(
                *[F.col(k) for k in key_cols],
                F.lit("c").alias("op"),
                F.lit(-1).cast("long").alias(version_col),
                F.struct(*struct_cols).alias("after"),
            )
            all_changes = batch.unionByName(as_changes)
        else:
            all_changes = batch
    else:
        all_changes = batch
    new_state = cdc.apply_latest_state(
        all_changes, key_cols, version_col=version_col
    ).withColumn(BUCKET_COL, bucket_of(key_cols))
    constraints = manifest.get("constraints", {}) if manifest else {}
    if constraints:
        _check_constraints(
            new_state.drop(BUCKET_COL), constraints, "merge_versioned state"
        )
    return _commit_state(
        spark, target, new_state, affected, carried,
        manifest.get("stats", {}) if manifest else {}, current_v + 1,
        operation="merge_versioned", constraints=constraints,
        n_buckets=n_buckets, key_cols=key_cols,
    )


def _commit_state(
    spark: SparkSession,
    target: str,
    new_state: DataFrame,
    affected: list[str],
    carried: dict[str, list[str]],
    prev_stats: dict[str, dict],
    new_v: int,
    operation: str = "merge",
    constraints: dict[str, str] | None = None,
    n_buckets: int | None = None,
    key_cols: list[str] | None = None,
) -> int:
    """Shared commit tail for every state-rewriting operation: write
    the affected buckets' new state to a writer-unique dir (racing
    writers targeting the same version can never overwrite each
    other's part files; the loser's dir becomes an unreferenced orphan
    it deletes below), splice the manifest, collect file stats, and
    atomically rename-commit."""
    data_dir = f"{target}/data/v{new_v}-{uuid.uuid4().hex[:8]}"
    new_state.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_dir)
    new_files = _bucket_files(spark, data_dir)  # only non-empty buckets
    buckets = dict(carried)
    for b in affected:
        buckets.pop(b, None)
        if b in new_files:
            buckets[b] = new_files[b]
    schema_json = new_state.drop(BUCKET_COL).schema.jsonValue()
    stats = _carry_stats(
        prev_stats,
        buckets,
        _collect_stats(spark, data_dir) if new_files else {},
    )
    try:
        _commit_manifest(
            spark, target,
            {
                "version": new_v,
                "schema": schema_json,
                "buckets": buckets,
                "stats": stats,
                "committed_at": time.time(),
                "operation": operation,
                "constraints": constraints or {},
                "n_buckets": n_buckets,
                "key_cols": key_cols,
            },
        )
    except RuntimeError:
        fs, jvm = _fs(spark, target)
        fs.delete(_jpath(jvm, data_dir), True)  # own orphan, safe to drop
        raise
    return new_v


def _resolve_n_buckets(
    manifest: dict | None, n_buckets: int | None, target: str
) -> int:
    """The table's bucket count is part of its physical layout: every
    key's bucket is ``pmod(xxhash64(key), n_buckets)``, so merging or
    point-reading with a DIFFERENT count silently maps keys to other
    buckets — a merge would leave stale copies of the same key alive
    in the old bucket (duplicate keys), and a lookup would prune to
    the wrong files.  The count is therefore persisted in the manifest;
    callers may omit it (None → the table's), and a mismatching
    explicit value is refused.  New tables default to 64.  Use
    :func:`rebucket` to change the layout."""
    recorded = manifest.get("n_buckets") if manifest else None
    if recorded is not None:
        if n_buckets is not None and n_buckets != recorded:
            raise ValueError(
                f"n_buckets={n_buckets} does not match the committed "
                f"layout of {target!r} (n_buckets={recorded}) — keys "
                "would hash to different buckets, leaving stale "
                "duplicates; use rebucket() to change the layout"
            )
        return int(recorded)
    return n_buckets if n_buckets is not None else 64


def _check_key_cols(
    manifest: dict | None, key_cols: list[str], target: str
) -> None:
    """Like the bucket count, the merge key is part of the physical
    layout (it is what gets hashed): merging with different keys would
    leave the same logical row alive under two bucket ids.  The key
    set is recorded at commit time; a mismatching explicit key is
    refused (tables committed before key recording pass silently)."""
    recorded = manifest.get("key_cols") if manifest else None
    if recorded is not None and list(recorded) != list(key_cols):
        raise ValueError(
            f"key_cols {key_cols} do not match the committed key "
            f"{list(recorded)} of {target!r} — rows would hash to "
            "different buckets; rebucket() to change the key layout"
        )


def _check_constraints(
    state: DataFrame, constraints: dict[str, str], context: str
) -> None:
    """Enforce table CHECK constraints on the post-merge state of the
    affected buckets — one filter+count over rows about to be written
    (O(new state), before any file lands).  Refuses the whole commit
    on the first violated constraint, Delta-style."""
    for name, expr in constraints.items():
        bad = state.filter(~F.coalesce(F.expr(expr), F.lit(False))).count()
        if bad:
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) violated by {bad} "
                f"row(s) in {context} — commit refused"
            )


def set_check_constraint(
    spark: SparkSession, target: str, name: str, expr: str
) -> int:
    """Register (or replace) a named CHECK constraint (a SQL boolean
    over the table's columns, e.g. ``"amount >= 0"``).  The EXISTING
    state must already satisfy it; every later merge validates its
    post-merge state before committing.  Commits a data-identical new
    version carrying the updated constraint set (NULL results count as
    violations — constraints are strict)."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    current_v = versions[-1]
    manifest = _read_manifest(spark, target, current_v)
    constraints = dict(manifest.get("constraints", {}))
    constraints[name] = expr
    _check_constraints(
        read_snapshot(spark, target, current_v),
        {name: expr},
        f"existing state of {target!r}",
    )
    _commit_manifest(
        spark, target,
        {
            **{
                k: manifest.get(k)
                for k in ("schema", "stats", "n_buckets", "key_cols")
            },
            "version": current_v + 1,
            "buckets": manifest["buckets"],
            "committed_at": time.time(),
            "operation": f"set_constraint:{name}",
            "constraints": constraints,
        },
    )
    return current_v + 1


def history(spark: SparkSession, target: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per live manifest version — commit
    time, operation, file/bucket counts, constraint count.  Metadata
    only (reads manifests, never data files)."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    rows = []
    for v in versions:
        m = _read_manifest(spark, target, v)
        ts = m.get("committed_at")
        rows.append(
            (
                v,
                _dt.datetime.fromtimestamp(ts) if ts is not None else None,
                m.get("operation"),
                sum(len(fl) for fl in m["buckets"].values()),
                len(m["buckets"]),
                len(m.get("constraints", {})),
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, committed_at timestamp, operation string,"
        " n_files int, n_buckets int, n_constraints int",
    )


def merge_versioned_retry(
    batch: DataFrame,
    target: str,
    key_cols: list[str],
    version_col: str = "ts_ms",
    n_buckets: int | None = None,
    max_attempts: int = 4,
) -> int:
    """Bounded optimistic-concurrency loop around
    :func:`merge_versioned`: on a lost commit race, re-read the (now
    newer) manifest, re-merge against it, re-commit.  Each retry reads
    only the affected buckets again, so the cost is O(retries × touched
    data), and the batch DataFrame is a logical plan — recomputing it
    is safe.  Raises the final :class:`RuntimeError` if every attempt
    loses (pathological contention)."""
    last: RuntimeError | None = None
    for _ in range(max_attempts):
        try:
            return merge_versioned(
                batch, target, key_cols,
                version_col=version_col, n_buckets=n_buckets,
            )
        except RuntimeError as e:  # lost the commit race; state moved on
            last = e
    raise last  # type: ignore[misc]


def merge_into(
    source: DataFrame,
    target: str,
    key_cols: list[str],
    when_matched_update: dict[str, str] | str | None = "source",
    when_matched_delete: str | None = None,
    when_not_matched_insert: bool = True,
    n_buckets: int | None = None,
) -> int:
    """SQL-style ``MERGE INTO`` against the manifest-committed table —
    the general matched/not-matched clause surface next to
    ``merge_versioned``'s CDC latest-wins contract:

    - ``when_matched_delete``: SQL condition over ``t.*`` (current row)
      and ``s.*`` (source row); matching pairs are deleted.  Checked
      first, like Delta's clause order.
    - ``when_matched_update``: ``"source"`` replaces the row with the
      source row; a dict maps column → SQL expression over ``t``/``s``
      for partial updates (e.g. ``{"balance": "t.balance +
      s.balance"}``, unlisted columns keep the TARGET value); ``None``
      leaves matched rows untouched.  Key columns cannot be updated.
    - ``when_not_matched_insert``: source rows with no current match
      are inserted (or dropped when False).

    The source must carry the table's full schema (same names/types —
    bucket hashing is type-sensitive); on a not-yet-created target the
    merge degenerates to insert-all and commits version 1.

    Scale: identical cost envelope to ``merge_versioned`` — source
    keys pick the affected buckets, ONE full-outer equi-join on the
    key columns pairs current and source rows (both sides hash-
    partitioned on the keys; no window, no cross product), and only
    the affected buckets rewrite through the same atomic commit tail.
    """
    spark = source.sparkSession
    for k in key_cols:
        if isinstance(when_matched_update, dict) and k in when_matched_update:
            raise ValueError(f"key column {k!r} cannot be updated by MERGE")
    versions = list_versions(spark, target)
    current_v = versions[-1] if versions else 0
    manifest = _read_manifest(spark, target, current_v) if versions else None
    n_buckets = _resolve_n_buckets(manifest, n_buckets, target)
    _check_key_cols(manifest, key_cols, target)
    bucket_of = lambda cols: F.pmod(F.xxhash64(*cols), F.lit(n_buckets))  # noqa: E731
    schema = _manifest_schema(manifest) if manifest else None
    if schema is not None:
        table_types = {f.name: f.dataType for f in schema.fields}
        src_types = {f.name: f.dataType for f in source.schema.fields}
        if src_types != table_types:
            raise TypeError(
                f"MERGE source schema {sorted(src_types)} must equal the "
                f"table schema {sorted(table_types)} of {target!r} "
                "(names and types; bucket hashing is type-sensitive)"
            )
        out_fields = schema.fields
    else:
        out_fields = source.schema.fields
    non_keys = [f.name for f in out_fields if f.name not in key_cols]

    # a target row matching MULTIPLE source rows makes the clause
    # outcome depend on join row order — refuse, like Delta's
    # DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW (collapse the
    # source first, e.g. cdc.apply_latest_state)
    if (
        source.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    ):
        raise ValueError(
            f"MERGE source has duplicate keys on {key_cols} — the "
            "matched-clause outcome would be row-order-dependent; "
            "collapse the source to one row per key first"
        )
    affected = sorted(
        str(r[0])
        for r in source.select(
            bucket_of([F.col(k) for k in key_cols]).alias(BUCKET_COL)
        )
        .distinct()
        .collect()
    )
    carried: dict[str, list[str]] = {}
    current = None
    if manifest is not None:
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
            if schema is not None:
                current = _pin_schema(current, schema)

    s_side = source.select(
        *key_cols, F.struct(*non_keys).alias("s"), F.lit(True).alias("__s")
    )
    if current is None:
        merged = s_side.select(*key_cols, "s", F.lit("ins").alias("__act"))
        if not when_not_matched_insert:
            merged = merged.filter(F.lit(False))
    else:
        t_side = current.select(
            *key_cols, F.struct(*non_keys).alias("t"), F.lit(True).alias("__t")
        )
        joined = t_side.join(s_side, key_cols, "full_outer")
        action = (
            F.when(F.col("__s").isNull(), F.lit("keep"))
            .when(
                F.col("__t").isNull(),
                F.lit("ins") if when_not_matched_insert else F.lit("drop"),
            )
        )
        if when_matched_delete is not None:
            action = action.when(F.expr(when_matched_delete), F.lit("drop"))
        if when_matched_update is None:
            action = action.otherwise(F.lit("keep"))
        elif when_matched_update == "source":
            action = action.otherwise(F.lit("src"))
        else:
            action = action.otherwise(F.lit("upd"))
        merged = joined.withColumn("__act", action).filter(
            F.col("__act") != "drop"
        )
        upd_map = (
            when_matched_update
            if isinstance(when_matched_update, dict)
            else {}
        )
        # unresolvable assignment columns must RAISE (Delta semantics):
        # a typo'd key would otherwise be a silent no-op — every matched
        # row keeps its target values while the caller believes the
        # update applied
        unknown = set(upd_map) - set(non_keys)
        if unknown:
            bad_keys = unknown & set(key_cols)
            if bad_keys:
                raise ValueError(
                    f"merge_into: key columns {sorted(bad_keys)} cannot be "
                    "updated — their hash is the bucket layout"
                )
            raise ValueError(
                f"merge_into: unknown update columns {sorted(unknown)} "
                f"(table columns: {sorted(non_keys)})"
            )
        types = {f.name: f.dataType for f in out_fields}
        row = [
            F.when(F.col("__act") == "keep", F.col(f"t.{c}"))
            .when(F.col("__act") == "ins", F.col(f"s.{c}"))
            .when(F.col("__act") == "src", F.col(f"s.{c}"))
            .otherwise(F.expr(upd_map.get(c, f"t.{c}")))
            .cast(types[c])
            .alias(c)
            for c in non_keys
        ]
        merged = merged.select(*key_cols, *row, F.col("__act"))
    if current is None:
        merged = merged.select(*key_cols, "s.*")
    else:
        merged = merged.drop("__act")
    # restore the table's declared column order
    new_state = merged.select(
        *[F.col(f.name) for f in out_fields]
    ).withColumn(BUCKET_COL, bucket_of(key_cols))
    constraints = manifest.get("constraints", {}) if manifest else {}
    if constraints:
        _check_constraints(
            new_state.drop(BUCKET_COL), constraints, "merge_into state"
        )
    return _commit_state(
        spark, target, new_state, affected, carried,
        manifest.get("stats", {}) if manifest else {}, current_v + 1,
        operation="merge_into", constraints=constraints,
        n_buckets=n_buckets, key_cols=key_cols,
    )


def compact(
    spark: SparkSession,
    target: str,
    max_files_per_bucket: int = 1,
    cluster_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> int | None:
    """Rewrite over-limit buckets into ``max_files_per_bucket`` files
    each, committed as a NEW content-identical version (readers of the
    old version are untouched; ``vacuum`` later reclaims superseded
    files).  The lakehouse OPTIMIZE: each merge can leave up to
    ``spark.sql.shuffle.partitions`` part files per touched bucket, and
    at 100 TB the accumulated small files dominate scan open cost;
    compaction pays one bounded rewrite of only the OVER-LIMIT buckets.

    ``cluster_by`` is the Z-ORDER analog (1-D): EVERY bucket is
    rewritten sorted by those columns (``sortWithinPartitions``, no
    extra shuffle beyond the bucket repartition), and
    ``max_records_per_file`` splits each bucket into several sorted
    files — so consecutive files carry tight, near-disjoint
    [min, max] ranges and ``read_where`` skips everything outside the
    predicate.  An upsert table's per-file ranges otherwise converge
    to the full column span (every merge unions old bucket rows back
    in); clustering is what restores skipping selectivity.

    Returns the new committed version, or None when nothing needed
    compacting (no empty commits)."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    current_v = versions[-1]
    manifest = _read_manifest(spark, target, current_v)
    over = {
        b: fl
        for b, fl in manifest["buckets"].items()
        if cluster_by or len(fl) > max_files_per_bucket
    }
    if not over:
        return None
    parts = [
        _read_files(spark, target, fl).withColumn(BUCKET_COL, F.lit(int(b)))
        for b, fl in sorted(over.items())
    ]
    df = parts[0]
    for p2 in parts[1:]:
        # buckets may carry different column sets after add-column
        # schema evolution; pre-evolution buckets read back nulls and
        # the rewrite pins every compacted file to the table schema
        df = df.unionByName(p2, allowMissingColumns=True)
    schema = _manifest_schema(manifest)
    if schema is not None:
        df = df.select(
            *[
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ],
            F.col(BUCKET_COL),
        )
    new_v = current_v + 1
    data_dir = f"{target}/data/v{new_v}-{uuid.uuid4().hex[:8]}"
    df = df.repartition(len(over), F.col(BUCKET_COL))
    if cluster_by:
        df = df.sortWithinPartitions(BUCKET_COL, *cluster_by)
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(BUCKET_COL).parquet(data_dir)
    new_files = _bucket_files(spark, data_dir)
    buckets = {
        b: (new_files[b] if b in over else fl)
        for b, fl in manifest["buckets"].items()
        if b in new_files or b not in over
    }
    stats = _carry_stats(
        manifest.get("stats", {}),
        buckets,
        _collect_stats(spark, data_dir) if new_files else {},
    )
    try:
        _commit_manifest(
            spark, target,
            {
                "version": new_v,
                "schema": manifest.get("schema"),
                "buckets": buckets,
                "stats": stats,
                "committed_at": time.time(),
                "operation": "compact",
                "constraints": manifest.get("constraints", {}),
                "n_buckets": manifest.get("n_buckets"),
                "key_cols": manifest.get("key_cols"),
            },
        )
    except RuntimeError:
        fs, jvm = _fs(spark, target)
        fs.delete(_jpath(jvm, data_dir), True)
        raise
    return new_v


def table_changes(
    spark: SparkSession,
    target: str,
    key_cols: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change data feed between two committed versions — the Delta CDF
    surface, derived rather than logged: because bucket membership is
    immutable and per-manifest, only buckets whose FILE LISTS differ
    between the two manifests can contain changes, so the diff reads
    O(changed buckets) of each version, never the whole table.

    Returns the ``to_version`` schema plus ``_change_type`` ∈
    {insert, delete, update_preimage, update_postimage} (update rows
    appear twice, pre and post, Delta-style).  Feed a downstream
    incremental mart refresh with this instead of re-scanning the
    table."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    to_v = to_version if to_version is not None else versions[-1]
    for v in (from_version, to_v):
        if v not in versions:
            raise FileNotFoundError(f"version {v} not in {versions}")
    if from_version >= to_v:
        raise ValueError(
            f"change feed needs from_version < to_version, got "
            f"{from_version} >= {to_v}"
        )
    m_from = _read_manifest(spark, target, from_version)
    m_to = _read_manifest(spark, target, to_v)
    schema = _manifest_schema(m_to)
    changed = sorted(
        set(m_from["buckets"]) | set(m_to["buckets"]),
    )
    changed = [
        b
        for b in changed
        if m_from["buckets"].get(b) != m_to["buckets"].get(b)
    ]

    def side(manifest) -> DataFrame | None:
        files = [f for b in changed for f in manifest["buckets"].get(b, [])]
        if not files:
            return None
        out = _read_files(spark, target, files)
        return _pin_schema(out, schema) if schema is not None else out

    old, new = side(m_from), side(m_to)
    ct = "_change_type"
    if schema is None and (old is None or new is None):
        raise FileNotFoundError(
            f"{target!r} pre-dates manifest schemas — cannot type an "
            "empty change feed"
        )
    empty = (
        spark.createDataFrame([], schema).withColumn(ct, F.lit(""))
        if schema is not None
        else None
    )
    if old is None and new is None:
        return empty
    if old is None:
        return new.withColumn(ct, F.lit("insert"))
    if new is None:
        return old.withColumn(ct, F.lit("delete"))
    cols = new.columns
    o = old.select(
        *key_cols, F.struct(*cols).alias("o"), F.lit(True).alias("__o")
    )
    nw = new.select(
        *key_cols, F.struct(*cols).alias("n"), F.lit(True).alias("__n")
    )
    j = o.join(nw, key_cols, "full_outer")
    inserts = j.filter(F.col("__o").isNull()).select("n.*").withColumn(
        ct, F.lit("insert")
    )
    deletes = j.filter(F.col("__n").isNull()).select("o.*").withColumn(
        ct, F.lit("delete")
    )
    updated = j.filter(
        F.col("__o").isNotNull()
        & F.col("__n").isNotNull()
        & ~F.col("o").eqNullSafe(F.col("n"))
    )
    pre = updated.select("o.*").withColumn(ct, F.lit("update_preimage"))
    post = updated.select("n.*").withColumn(ct, F.lit("update_postimage"))
    return inserts.unionByName(deletes).unionByName(pre).unionByName(post)


def rebucket(
    spark: SparkSession,
    target: str,
    key_cols: list[str],
    new_n_buckets: int,
) -> int:
    """Change the table's bucket layout: one full content-identical
    rewrite hashed to ``new_n_buckets``, committed as a new version
    (old snapshots keep reading their own layout — bucket membership
    is per-manifest, not per-directory).  The ONLY sanctioned way to
    change the bucket count; merges and lookups refuse a mismatching
    explicit count (``_resolve_n_buckets``)."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    current_v = versions[-1]
    manifest = _read_manifest(spark, target, current_v)
    state = read_snapshot(spark, target, current_v).withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(*key_cols), F.lit(new_n_buckets))
    )
    new_v = current_v + 1
    data_dir = f"{target}/data/v{new_v}-{uuid.uuid4().hex[:8]}"
    (
        state.repartition(new_n_buckets, F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(data_dir)
    )
    new_files = _bucket_files(spark, data_dir)
    stats = _collect_stats(spark, data_dir) if new_files else {}
    try:
        _commit_manifest(
            spark, target,
            {
                "version": new_v,
                "schema": manifest.get("schema"),
                "buckets": new_files,
                "stats": stats,
                "committed_at": time.time(),
                "operation": f"rebucket:{new_n_buckets}",
                "constraints": manifest.get("constraints", {}),
                "n_buckets": new_n_buckets,
                "key_cols": key_cols,
            },
        )
    except RuntimeError:
        fs, jvm = _fs(spark, target)
        fs.delete(_jpath(jvm, data_dir), True)
        raise
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
    newest = keep[-1]
    data_root = _jpath(jvm, f"{target}/data")
    if fs.exists(data_root):
        for st in fs.listStatus(data_root):
            name = st.getPath().getName()
            # an unreferenced dir AT OR BELOW the newest committed
            # version is garbage (old version or lost-race leftover);
            # one ABOVE it belongs to an IN-FLIGHT writer whose commit
            # rename hasn't landed — deleting it would let that commit
            # succeed pointing at vanished files (multi-writer safety)
            m = re.match(r"v(\d+)-", name)
            in_flight = m is not None and int(m.group(1)) > newest
            if name not in referenced and not in_flight:
                fs.delete(st.getPath(), True)
    return drop


def _dml_rewrite(
    spark: SparkSession,
    target: str,
    conjuncts: list[tuple[str, str, object]],
    transform,
    operation: str,
) -> int:
    """Shared engine for declarative DML (DELETE/UPDATE ... WHERE):
    manifest stats pick the buckets that can possibly hold matching
    rows (same skipping as ``read_where`` — a time-banded DELETE on a
    clustered table rewrites only the touched band), those buckets
    rewrite through ``transform`` with their row-level predicate, and
    everything else is carried by reference.  A conjunction no file
    can satisfy is a metadata no-op: the current version is returned
    and NOTHING is committed."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    current_v = versions[-1]
    manifest = _read_manifest(spark, target, current_v)
    schema = _manifest_schema(manifest)
    if schema is None:
        raise ValueError(
            f"{target!r} pre-dates manifest schemas — DML needs the "
            "committed schema to pin the rewrite"
        )
    kept = set(prune_files(manifest, conjuncts))
    affected = sorted(
        b
        for b, fl in manifest["buckets"].items()
        if any(f in kept for f in fl)
    )
    if not affected:
        return current_v
    carried = {
        b: fl for b, fl in manifest["buckets"].items() if b not in affected
    }

    pred = _conjunct_pred(conjuncts)

    # per-bucket read with the bucket id pinned back on (keys are
    # unchanged by DML, so rows stay in their committed buckets)
    parts = [
        _pin_schema(
            _read_files(spark, target, manifest["buckets"][b]), schema
        ).withColumn(BUCKET_COL, F.lit(int(b)))
        for b in affected
    ]
    current = parts[0]
    for p in parts[1:]:
        current = current.unionByName(p)
    new_state = transform(current, pred)
    constraints = manifest.get("constraints", {})
    if constraints:
        _check_constraints(
            new_state.drop(BUCKET_COL), constraints, f"{operation} state"
        )
    return _commit_state(
        spark, target, new_state, affected, carried,
        manifest.get("stats", {}), current_v + 1,
        operation=operation, constraints=constraints,
        n_buckets=manifest.get("n_buckets"),
        key_cols=manifest.get("key_cols"),
    )


def delete_where(
    spark: SparkSession,
    target: str,
    conjuncts: list[tuple[str, str, object]],
) -> int:
    """``DELETE FROM t WHERE <conjunction>`` — rows for which every
    conjunct ``(col, op, value)`` is TRUE are removed (NULL evaluations
    keep the row, standard SQL DELETE semantics).  Returns the new
    version (or the current one for a stats-proven no-op)."""

    def do_delete(df: DataFrame, pred: Column) -> DataFrame:
        return df.filter(~F.coalesce(pred, F.lit(False)))

    return _dml_rewrite(spark, target, conjuncts, do_delete, "delete_where")


def update_where(
    spark: SparkSession,
    target: str,
    conjuncts: list[tuple[str, str, object]],
    set_exprs: dict[str, str],
) -> int:
    """``UPDATE t SET col = <sql expr> ... WHERE <conjunction>``.
    Set expressions are SQL over the row's columns (e.g.
    ``{"o_totalprice": "o_totalprice * 1.1"}``), cast back to the
    column's committed type so an expression cannot drift the schema.
    Key columns are refused (their hash IS the bucket layout); columns
    not in the schema are refused.  Returns the new version (current
    version for a stats-proven no-op)."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    manifest = _read_manifest(spark, target, versions[-1])
    schema = _manifest_schema(manifest)
    if schema is None:
        raise ValueError(
            f"{target!r} pre-dates manifest schemas — DML needs the "
            "committed schema to pin the rewrite"
        )
    types = {f.name: f.dataType for f in schema.fields}
    recorded_keys = set(manifest.get("key_cols") or ())
    for c in set_exprs:
        if c not in types:
            raise ValueError(f"unknown column {c!r} in {target!r}")
        if c in recorded_keys:
            raise ValueError(
                f"key column {c!r} cannot be updated — its hash is the "
                "bucket layout; delete + re-insert under the new key"
            )

    def do_update(df: DataFrame, pred: Column) -> DataFrame:
        # ONE projection, not chained withColumn: every SET expression
        # must read the PRE-update row (SQL UPDATE semantics) — chained
        # withColumn would let {"a": "b", "b": "a"} evaluate the second
        # assignment against the already-updated a, leaving both
        # columns equal to the old b instead of swapping
        p = F.coalesce(pred, F.lit(False))
        return df.select(
            *[
                (
                    F.when(p, F.expr(set_exprs[f.name]).cast(types[f.name]))
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                    if f.name in set_exprs
                    else F.col(f.name)
                )
                for f in df.schema.fields
            ]
        )

    return _dml_rewrite(spark, target, conjuncts, do_update, "update_where")


def restore(spark: SparkSession, target: str, version: int) -> int:
    """``RESTORE TABLE t TO VERSION AS OF v``: commit a NEW version
    whose manifest re-references version ``v``'s files (schema, stats,
    constraints, layout included) — a metadata-only rollback, no data
    rewrite, full history preserved (the bad versions stay readable).
    Safe with :func:`vacuum`: vacuum keeps files referenced by kept
    manifests, and the restore commit is the newest manifest."""
    versions = list_versions(spark, target)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {target!r}")
    if version not in versions:
        raise FileNotFoundError(f"version {version} not in {versions}")
    old = _read_manifest(spark, target, version)
    _commit_manifest(
        spark, target,
        {
            **{
                k: old.get(k)
                for k in (
                    "schema", "stats", "n_buckets", "key_cols", "constraints"
                )
            },
            "version": versions[-1] + 1,
            "buckets": old["buckets"],
            "committed_at": time.time(),
            "operation": f"restore:{version}",
        },
    )
    return versions[-1] + 1


def dml_retry(fn, *args, max_attempts: int = 4, **kwargs) -> int:
    """Bounded optimistic-concurrency loop for the DML surface —
    ``dml_retry(delete_where, spark, target, conjuncts)`` /
    ``dml_retry(update_where, spark, target, conjuncts, set_exprs)`` /
    ``dml_retry(restore, spark, target, v)``.  Same contract as
    :func:`merge_versioned_retry`: each attempt re-reads the (now
    newer) manifest and re-derives its rewrite against it, so a lost
    commit race is re-applied on fresh state, never blindly
    re-committed.  Raises the final :class:`RuntimeError` when every
    attempt loses."""
    last: RuntimeError | None = None
    for _ in range(max_attempts):
        try:
            return fn(*args, **kwargs)
        except RuntimeError as e:  # lost the commit race; state moved on
            last = e
    raise last  # type: ignore[misc]
