"""Lake (Parquet) sources and sinks.

Read side: explicit-schema Parquet scans of the test star
(S10 in SURVEY.md §2.1).  Schemas are declared, never inferred — the
fix for the reference's per-batch pandas inference
(reference ``consumer/consumer.py:44``).

Write side: Hive-partitioned Parquet with the date layout the
reference's consumer produces (``{table}/date=YYYY-MM-DD/*.parquet``,
reference ``consumer/consumer.py:45-48``), plus compaction — the
small-file fix for its one-file-per-50-rows pathology
(SURVEY.md §4 "small-file problem").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from end_end_data_pipeline__spark import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Tables whose parquet files MAY store TIMESTAMP(NANOS) — illegal for
# Spark's vectorized reader when requested as a timestamp.  The actual
# unit is probed from the parquet footer per path (test fixtures have
# been regenerated with different units across rounds): nanos files are
# read as raw long — an explicit LongType in the read schema is enough;
# no session conf involved — and converted to micros.  The fixture data
# is micros-precision (ns % 1000 == 0 for every row), so no information
# is lost and values match the DuckDB oracle bit-for-bit; micros files
# read natively.
_MAYBE_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# keyed on (resolved file, mtime): an in-process fixture regeneration
# (same path, new unit) invalidates naturally
_nanos_probe_cache: dict[tuple[str, float], tuple[str, ...]] = {}


def _nanos_ts_cols(path: str, candidates: tuple[str, ...]) -> tuple[str, ...]:
    """Which of ``candidates`` are stored as physical INT64 with a
    TIMESTAMP(NANOS) logical type in the parquet footer at ``path``
    (file or directory of files — one footer read, cached per
    (file, mtime); never assume the unit).  The check is at the PARQUET
    level, not arrow's (arrow also reports legacy INT96 timestamps as
    ``ns``, but INT96 must be read natively — the raw-long path would
    fail on it)."""
    try:
        import glob

        import pyarrow.parquet as pq

        f = (
            path
            if os.path.isfile(path)
            else sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
        )
        key = (f, os.path.getmtime(f))
        if key in _nanos_probe_cache:
            return _nanos_probe_cache[key]
        sch = pq.ParquetFile(f).schema
        by_name = {sch.column(i).name: sch.column(i) for i in range(len(sch))}
        out = tuple(
            c
            for c in candidates
            if (col := by_name.get(c)) is not None
            and col.physical_type == "INT64"
            and "nanos" in str(col.logical_type).lower()
        )
        _nanos_probe_cache[key] = out
    except Exception:
        out = ()  # unreadable footer → let the normal reader surface it
    return out


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one star table with its declared schema.

    Passing the explicit schema (rather than the parquet footer) keeps
    the scan contract stable across files and lets Catalyst prune
    columns/rows against a fixed ReadSchema.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Timestamps in the lake are naive-UTC; pin the session TZ so epoch
    # extraction and formatting are host-TZ-independent (works even when
    # the caller brought its own SparkSession, e.g. the driver harness).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols: tuple[str, ...] = ()
    if name in _MAYBE_NANOS_TS_COLS:
        ns_cols = _nanos_ts_cols(path, _MAYBE_NANOS_TS_COLS[name])
    reader = spark.read
    if name in schemas.STAR:
        schema = schemas.STAR[name]
        if ns_cols:
            # explicit LongType per nanos column — no session-global
            # legacy conf (a leaked nanosAsLong=true would make LATER
            # schema-inferred reads of other nanos files silently
            # return longs)
            schema = T.StructType(
                [
                    T.StructField(f.name, T.LongType() if f.name in ns_cols else f.dataType)
                    for f in schema.fields
                ]
            )
        reader = reader.schema(schema)
    df = reader.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def stream_events(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    *,
    reader_options: dict[str, str] | None = None,
) -> DataFrame:
    """File-source streaming replay of the events table, with the same
    footer-probed TIMESTAMP(NANOS)/(MICROS) handling as
    :func:`load_table` — every streaming query must come through here
    rather than ``readStream.parquet`` directly, or a fixture
    regeneration that changes the stored unit corrupts event times.

    ``reader_options`` pass through to the streaming READER (rate
    limits like ``maxFilesPerTrigger`` live there, not on the writer —
    used by scripts/streaming_state_scale.py to force real multi-batch
    runs)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    ns = _nanos_ts_cols(path, ("ts",))
    # The streaming file source monitors a DIRECTORY.  Driver fixtures
    # store each table as a single FILE, so those stream the parent dir
    # with a leaf-name glob; a Spark-written table (the production
    # shape, and the derived-decade fixtures) IS a directory of part
    # files — stream it directly.  The glob-on-parent form silently
    # matches nothing for a directory-shaped table (pathGlobFilter
    # applies to leaf file names), which is how this surfaced: five
    # streaming queries returned 0 rows at the sf1-derived gate.
    if os.path.isdir(path):
        def reader(schema: str):
            return (
                spark.readStream.schema(schema)
                .options(**(reader_options or {}))
                .parquet(path)
            )
    else:
        def reader(schema: str):
            return (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet")
                .options(**(reader_options or {}))
                .parquet(sf_dir)
            )
    if ns:
        raw_schema = (
            "event_id long, ts long, user_id long, event_type string,"
            " value double, props string"
        )
        return reader(raw_schema).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    raw_schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    return reader(raw_schema)


def load_star(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every star table and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in schemas.STAR:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "created_at",
    sort_cols: tuple[str, ...] = (),
    mode: str = "append",
) -> None:
    """Write a table in the reference's lake layout, scan-optimized.

    - ``date=`` Hive partitioning (partition pruning on daily queries,
      reference layout ``consumer/consumer.py:48``);
    - optional ``sortWithinPartitions`` so parquet row-group min/max
      statistics serve per-key time-range scans — the lake equivalent
    of the reference's OLTP index (``SCHEMA.sql:31``).
    """
    out = df.withColumn("date", F.to_date(F.col(ts_col)))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy("date").parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    row_bytes_estimate: int = 100,
) -> None:
    """Rewrite a date-partitioned table into ~target-size files.

    The reference emits one parquet file per 50-record flush
    (reference ``consumer/consumer.py:47-49``) — pathological at scale.
    Compaction = read, repartition by the partition column to roughly
    ``target_file_bytes`` files, overwrite atomically per partition
    (dynamic overwrite keeps untouched dates intact).
    """
    df = spark.read.parquet(path)
    rows = df.count()
    n_files = max(1, int(rows * row_bytes_estimate / target_file_bytes))
    (
        df.repartition(n_files, "date")
        .sortWithinPartitions("date")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(path)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source (S1) — parallel range-partitioned read when bounds given.

    The reference reads/writes Postgres row-at-a-time via psycopg2
    (reference ``generator.py:168-176,204-208``); the engine's analog is
    a partitioned JDBC scan.  Live-tested in-container against the
    Derby engine bundled in Spark's jars (catalog query
    ``jdbc_roundtrip_live`` + tests/test_connectors.py); against
    Postgres the only delta is the url/driver pair.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None and lower_bound is not None and upper_bound is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def register_jdbc_catalog(
    spark: SparkSession,
    name: str,
    url: str,
    driver: str | None = None,
    push_down_aggregate: bool = True,
    push_down_limit: bool = True,
    **options: str,
) -> None:
    """Register a DataSource-V2 JDBC catalog (``SELECT ... FROM
    <name>.<TABLE>``) — the AGGREGATE-pushdown path.  The V1 reader
    (:func:`read_jdbc`) pushes only filters; the V2 catalog also ships
    ``COUNT/SUM/MIN/MAX/AVG + GROUP BY`` (``PushedAggregates`` /
    ``PushedGroupByExpressions`` in the plan) and LIMIT to the remote
    engine, so a 100 TB-side aggregation transfers one row per group
    instead of the table.  Plan-asserted live against Derby in
    tests/test_connectors.py."""
    base = f"spark.sql.catalog.{name}"
    spark.conf.set(
        base, "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog"
    )
    spark.conf.set(f"{base}.url", url)
    if driver:
        spark.conf.set(f"{base}.driver", driver)
    spark.conf.set(f"{base}.pushDownAggregate", str(push_down_aggregate).lower())
    spark.conf.set(f"{base}.pushDownLimit", str(push_down_limit).lower())
    for k, v in options.items():
        spark.conf.set(f"{base}.{k}", v)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) managed table
    — the co-located-join layout (SURVEY.md §4): two tables bucketed on
    the same key with the same bucket count join with NO exchange on
    either side, and sorted buckets skip the sort of a sort-merge join
    too.  This is how a 100 TB fact table amortizes its shuffle: paid
    once at write, skipped by every subsequent join/agg on the key.

    Bucketing requires the table catalog (``saveAsTable``); plain
    ``.parquet(path)`` writes cannot carry bucket metadata.  Bucket
    pruning also serves point lookups on the bucket key.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_bucketed_at(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """:func:`write_bucketed` as an EXTERNAL table at ``path`` (tests
    and ad-hoc layouts — keeps bucket metadata in the catalog while the
    files live outside the warehouse dir)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def zorder_value(cols: list[str], n_bits: int = 16) -> "F.Column":
    """Z-order (Morton) curve value for multi-column clustering: each
    column is rank-normalized to ``n_bits`` via percent_rank upstream
    (see ``zorder_layout``); here the pre-normalized int columns are
    bit-interleaved with pure Catalyst shifts/masks.

    Why: sorting by (a, b) clusters a perfectly and b not at all;
    sorting by interleave(a, b) clusters BOTH approximately, so parquet
    row-group min/max stats prune range predicates on either column —
    the lakehouse stand-in for a second index (SURVEY.md §4 Z-order
    note)."""
    z = F.lit(0).cast("long")
    for bit in range(n_bits):
        for i, c in enumerate(cols):
            src_bit = F.shiftright(F.col(c).cast("long"), bit).bitwiseAND(F.lit(1))
            z = z.bitwiseXOR(F.shiftleft(src_bit, bit * len(cols) + i))
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_bits: int = 16,
    n_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Write ``df`` range-partitioned + sorted along the Z-curve of
    ``cols``.  Columns are min-max scaled to [0, 2^n_bits) first so the
    interleave is scale-free (money, timestamps, ids alike) — one
    distributed agg for the extremes, broadcast back as literals (a
    per-column rank normalization would handle skew better but costs a
    global sort per column; min-max is the 100 TB-safe default).  Then
    one range exchange on the Z-value — the same cost as any ordered
    write — and each output file covers a compact Z-range, so row-group
    stats prune range predicates on EVERY participating column.

    ``n_files`` defaults to size-derived: the same stats pass that
    collects the extremes also estimates the uncompressed row footprint,
    targeting ~``target_file_bytes`` per output file (a fixed file count
    would under-split at 100× the data and over-split a sample)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
        F.count(F.lit(1)).alias("__rows"),
        # per-row byte estimate from a cheap columnar proxy: fixed-width
        # cols ~8B; strings sampled via avg(length)
        *[
            F.avg(F.length(F.col(f.name)).cast("double")).alias(f"__len_{f.name}")
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        ],
    ).first()
    extremes = stats
    if n_files is None:
        str_bytes = sum(
            stats[f"__len_{f.name}"] or 0.0
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        )
        fixed_bytes = 8.0 * sum(
            1 for f in df.schema.fields if not isinstance(f.dataType, T.StringType)
        )
        est_bytes = stats["__rows"] * (str_bytes + fixed_bytes)
        # parquet encoding+compression typically shrinks 3-5x; use 3x
        n_files = max(1, int(est_bytes / 3 / target_file_bytes))
    norm = df
    scaled_cols = []
    top = (1 << n_bits) - 1
    for c in cols:
        mn, mx = extremes[f"mn_{c}"], extremes[f"mx_{c}"]
        span = (mx - mn) or 1.0
        sc = f"__zs_{c}"
        norm = norm.withColumn(
            sc,
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top).cast("long"),
        )
        scaled_cols.append(sc)
    z = norm.withColumn("__z", zorder_value(scaled_cols, n_bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *scaled_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
