"""External-system connectors (SURVEY.md §2.1 S1-S4, S6, S7, S9).

The reference's pipeline edge: Postgres OLTP (psycopg2, reference
``generator.py:168-176``), Debezium CDC over Kafka (reference
``Connector_post_and_generate.py:17-30``), a Kafka consumer (reference
``consumer/consumer.py:15-24``), and MinIO via boto3 (reference
``consumer/consumer.py:27-38``).  Spark-first re-expression:

- option-dict builders are **pure functions** (unit-testable with no
  broker/DB/object store in the loop — none exist in this container);
- thin ``open_*`` appliers hand them to ``spark.read`` /
  ``spark.readStream``;
- S3-compatible stores go through Hadoop ``s3a://`` (path-style access
  for MinIO), not boto3 — executors then read/write object storage
  directly and in parallel, which is the whole point at 100 TB.

The Kafka source needs the ``spark-sql-kafka`` package on the
classpath; builders work regardless, ``open_*`` fails at ``load()``
with Spark's own guidance if the package is absent.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

# --------------------------------------------------------------------------
# S1/S8 — JDBC (the OLTP system of record)
# --------------------------------------------------------------------------


def jdbc_options(
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> dict[str, str]:
    """JDBC read options.  Unlike the reference's single psycopg2
    connection (reference ``generator.py:168-176``), a partitioned read
    (``partitionColumn`` + bounds) fans the table scan across
    executors — required for any table that doesn't fit one task."""
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": "org.postgresql.Driver",
        "fetchsize": "10000",
        "pushDownPredicate": "true",
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def open_jdbc_table(spark: SparkSession, **kwargs: Any) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_write_options(
    url: str,
    table: str,
    user: str,
    password: str,
    batch_size: int = 10_000,
    isolation_level: str = "READ_COMMITTED",
) -> dict[str, str]:
    """JDBC write options (S8's production form — the reference's
    ``execute_values`` bulk insert path, ``generator.py:204-208``).
    ``batchsize`` plays the role of the reference's page-sized
    executemany; each executor partition opens its own connection, so
    total insert throughput scales with partitions instead of a single
    psycopg2 session."""
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": "org.postgresql.Driver",
        "batchsize": str(batch_size),
        "isolationLevel": isolation_level,
    }


def write_jdbc_table(
    df: DataFrame, mode: str = "append", num_partitions: int | None = None, **kwargs: Any
) -> None:
    """Append ``df`` to an OLTP table with pre-assigned keys (S8): the
    engine synthesizes ids arithmetically (``datagen``), so there is no
    RETURNING round-trip and appends are idempotent-safe to retry per
    partition.  ``mode='append'`` is the reference's INSERT semantics;
    'overwrite' truncates first (S9).  ``num_partitions`` caps
    connection fan-out (``df.coalesce``) for small DB pools."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = df.write.format("jdbc").mode(mode)
    for k, v in jdbc_write_options(**kwargs).items():
        writer = writer.option(k, v)
    writer.save()


# --------------------------------------------------------------------------
# S2/S3 — Kafka CDC stream source
# --------------------------------------------------------------------------

CDC_TOPIC_PREFIX = "banking_server"  # reference Connector_post_and_generate.py:23-24
CDC_TABLES = ("customers", "accounts", "transactions")


def cdc_topics(
    tables: tuple[str, ...] = CDC_TABLES, prefix: str = CDC_TOPIC_PREFIX
) -> str:
    """Per-table topic list ``{prefix}.public.{table}`` (reference
    ``consumer/consumer.py:16-18``)."""
    return ",".join(f"{prefix}.public.{t}" for t in tables)


def kafka_cdc_options(
    bootstrap_servers: str,
    tables: tuple[str, ...] = CDC_TABLES,
    prefix: str = CDC_TOPIC_PREFIX,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 50_000,
) -> dict[str, str]:
    """Kafka source options mirroring the reference consumer: earliest
    reset for full replay (reference ``consumer/consumer.py:20``).  The
    reference's ``enable_auto_commit=True`` made delivery at-least-once;
    Spark tracks offsets in the *checkpoint* instead (no broker commit),
    which upgrades the pipeline to exactly-once per sink (ST6).
    ``maxOffsetsPerTrigger`` bounds a micro-batch the way the
    reference's ``batch_size=50`` bounded a flush (S T1) — sized for
    executors, not a single Python loop."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": cdc_topics(tables, prefix),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def open_kafka_cdc_stream(spark: SparkSession, **kwargs: Any) -> DataFrame:
    """value/topic/partition/offset stream; pair with
    ``cdc.parse_envelope`` + ``cdc.route_topics`` downstream."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_cdc_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


# --------------------------------------------------------------------------
# S4 — Debezium connector registration (control plane)
# --------------------------------------------------------------------------


def debezium_connector_config(
    name: str = "banking-connector",
    db_host: str = "postgres",
    db_port: int = 5432,
    db_user: str = "admin",
    db_password: str = "admin",
    db_name: str = "banking",
    tables: tuple[str, ...] = CDC_TABLES,
    prefix: str = CDC_TOPIC_PREFIX,
) -> dict[str, Any]:
    """The connector payload the reference POSTs (reference
    ``Connector_post_and_generate.py:17-30``), as data.  Notables kept:
    ``decimal.handling.mode=double`` (money crosses the wire as double
    — the silver layer restores DECIMAL(18,2), see ``cdc.silver_banking``)
    and filtered publication autocreate (P4 source-side pruning)."""
    return {
        "name": name,
        "config": {
            "connector.class": "io.debezium.connector.postgresql.PostgresConnector",
            "database.hostname": db_host,
            "database.port": str(db_port),
            "database.user": db_user,
            "database.password": db_password,
            "database.dbname": db_name,
            "topic.prefix": prefix,
            "table.include.list": ",".join(f"public.{t}" for t in tables),
            "plugin.name": "pgoutput",
            "slot.name": "banking_slot",
            "publication.autocreate.mode": "filtered",
            "tombstones.on.delete": "false",
            "decimal.handling.mode": "double",
            "key.converter": "org.apache.kafka.connect.json.JsonConverter",
            "value.converter": "org.apache.kafka.connect.json.JsonConverter",
            "key.converter.schemas.enable": "false",
            "value.converter.schemas.enable": "false",
        },
    }


def register_connector(
    connect_url: str, config: dict[str, Any], timeout: float = 30.0
) -> int:
    """Idempotent POST to Kafka Connect REST; 409 (already exists) is
    success, like the reference (``Connector_post_and_generate.py:44-47``).
    Returns the HTTP status.  ``timeout`` bounds the request — urlopen's
    default is NO timeout, so a half-open Connect endpoint (container
    still starting, proxy black-hole) would hang the pipeline bootstrap
    forever with no exception."""
    import json
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"{connect_url.rstrip('/')}/connectors",
        data=json.dumps(config).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(  # noqa: S310 — caller supplies url
            req, timeout=timeout
        ) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        if e.code == 409:
            return 409
        raise


# --------------------------------------------------------------------------
# S6 — S3-compatible object store (MinIO) via s3a
# --------------------------------------------------------------------------


def s3a_conf(
    endpoint: str, access_key: str, secret_key: str, ssl: bool = False
) -> dict[str, str]:
    """Hadoop conf for an S3-compatible endpoint (path-style access is
    what MinIO needs; reference connects boto3 the same way,
    ``consumer/consumer.py:27-38``)."""
    return {
        "fs.s3a.endpoint": endpoint,
        "fs.s3a.access.key": access_key,
        "fs.s3a.secret.key": secret_key,
        "fs.s3a.path.style.access": "true",
        "fs.s3a.connection.ssl.enabled": str(ssl).lower(),
        "fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        # commit via the magic committer: no O(data) rename on object stores
        "fs.s3a.committer.name": "magic",
        "fs.s3a.committer.magic.enabled": "true",
    }


def configure_s3a(spark: SparkSession, **kwargs: Any) -> None:
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in s3a_conf(**kwargs).items():
        hconf.set(k, v)


# --------------------------------------------------------------------------
# S7 — console/debug sink
# --------------------------------------------------------------------------


def console_sink(stream_df: DataFrame, num_rows: int = 20):
    """Dev-only mirror of the reference's per-record print (reference
    ``consumer/consumer.py:71``) — returns the un-started writer."""
    return (
        stream_df.writeStream.format("console")
        .option("numRows", str(num_rows))
        .option("truncate", "true")
    )


# --------------------------------------------------------------------------
# S9 — bulk maintenance (truncate / reset)
# --------------------------------------------------------------------------


def truncate_reset(spark: SparkSession, path: str) -> dict[str, int]:
    """The reference's documented reset (``TRUNCATE ... RESTART IDENTITY
    CASCADE``, reference data-generator/README.md) for a lake table:
    overwrite with an empty frame of the SAME schema (readers keep
    working; identity restart is a no-op here — the engine pre-assigns
    keys, S8).  Returns before/after row counts."""
    existing = spark.read.parquet(path)
    before = existing.count()
    empty = spark.createDataFrame([], existing.schema)
    empty.write.mode("overwrite").parquet(path)
    return {"rows_before": before, "rows_after": spark.read.parquet(path).count()}


def truncate_reset_jdbc(
    spark: SparkSession, url: str, table: str, driver: str
) -> dict[str, int]:
    """The reference's ``TRUNCATE ... RESTART IDENTITY`` against a real
    JDBC database (live-tested in-container on Spark's bundled Derby):
    overwrite with ``truncate=true`` issues TRUNCATE TABLE — the table
    and its schema survive, the rows go, and unlike DROP/CREATE any
    grants/constraints stay intact."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", table).option("driver", driver)
    )
    existing = reader.load()
    before = existing.count()
    empty = spark.createDataFrame([], existing.schema)
    (
        empty.write.format("jdbc")
        .option("url", url).option("dbtable", table).option("driver", driver)
        .option("truncate", "true")
        .mode("overwrite")
        .save()
    )
    return {"rows_before": before, "rows_after": reader.load().count()}
