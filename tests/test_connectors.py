"""Unit tests for the external-system connectors (SURVEY.md §2.1).

No Postgres/Kafka/MinIO runs in this container, so option-dict builders
are verified as pure functions against the reference's recorded
configuration, and the filesystem-backed paths (truncate/reset, console
sink construction) run for real.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.sources import connectors, lake
from tests.conftest import SF_SMOKE


def test_jdbc_options_partitioned_read():
    opts = connectors.jdbc_options(
        "jdbc:postgresql://db:5432/banking", "public.transactions",
        "admin", "admin",
        partition_column="id", num_partitions=16,
        lower_bound=0, upper_bound=1_000_000,
    )
    assert opts["dbtable"] == "public.transactions"
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")


def test_jdbc_options_requires_bounds():
    with pytest.raises(ValueError):
        connectors.jdbc_options("u", "t", "u", "p", partition_column="id")


def test_jdbc_write_options_bulk_insert_shape():
    # S8 write side mirrors the reference's execute_values bulk insert
    # (generator.py:204-208): batched appends, standard isolation
    opts = connectors.jdbc_write_options(
        "jdbc:postgresql://db:5432/banking", "public.transactions",
        "admin", "admin", batch_size=5000,
    )
    assert opts["dbtable"] == "public.transactions"
    assert opts["batchsize"] == "5000"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["driver"] == "org.postgresql.Driver"


def test_write_jdbc_fails_cleanly_without_driver(spark):
    # no JDBC driver jar in this container: the writer must surface
    # Spark's own missing-driver error (wiring is correct up to load)
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    with pytest.raises(Exception) as e:
        connectors.write_jdbc_table(
            df, url="jdbc:postgresql://localhost:5/x", table="t",
            user="u", password="p", num_partitions=1,
        )
    assert "postgresql" in str(e.value).lower() or "driver" in str(e.value).lower()


def test_cdc_topics_match_reference_layout():
    # reference consumer/consumer.py:16-18 subscribes exactly these
    assert connectors.cdc_topics() == (
        "banking_server.public.customers,"
        "banking_server.public.accounts,"
        "banking_server.public.transactions"
    )


def test_kafka_cdc_options_replay_and_batching():
    opts = connectors.kafka_cdc_options("broker:9092")
    assert opts["startingOffsets"] == "earliest"  # full replay (ST8)
    assert "maxOffsetsPerTrigger" in opts  # bounded micro-batch (ST1)
    assert opts["subscribe"].count(",") == 2


def test_debezium_config_mirrors_reference():
    cfg = connectors.debezium_connector_config()["config"]
    # reference Connector_post_and_generate.py:17-30
    assert cfg["plugin.name"] == "pgoutput"
    assert cfg["slot.name"] == "banking_slot"
    assert cfg["publication.autocreate.mode"] == "filtered"
    assert cfg["decimal.handling.mode"] == "double"
    assert cfg["tombstones.on.delete"] == "false"
    assert cfg["value.converter.schemas.enable"] == "false"
    assert cfg["table.include.list"] == (
        "public.customers,public.accounts,public.transactions"
    )


def test_s3a_conf_path_style_for_minio(spark):
    connectors.configure_s3a(
        spark, endpoint="http://minio:9000", access_key="ak", secret_key="sk"
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://minio:9000"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.committer.name") == "magic"


def test_console_sink_builds(spark, tmp_path):
    src = str(tmp_path / "src")
    lake.load_table(spark, "region", SF_SMOKE).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    writer = connectors.console_sink(stream, num_rows=5)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    assert not q.isActive


def test_truncate_reset_preserves_schema(spark, tmp_path):
    path = os.path.join(str(tmp_path), "lake")
    orders = lake.load_table(spark, "orders", SF_SMOKE).limit(100)
    orders.write.mode("overwrite").parquet(path)
    status = connectors.truncate_reset(spark, path)
    assert status["rows_before"] == 100
    assert status["rows_after"] == 0
    after = spark.read.parquet(path)
    assert after.columns == orders.columns
    # still queryable post-reset
    assert after.filter(F.col("o_orderkey") > 0).count() == 0


def test_jdbc_live_roundtrip_with_pushdown(spark, tmp_path):
    """Live JDBC (embedded Derby from Spark's own jars): partitioned
    write+read round-trip is lossless, the ranged read fans out to the
    requested partitions, and a filter on the JDBC source is pushed
    into the remote scan (PushedFilters in the plan) rather than
    applied post-transfer."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import lake

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.range(1000).selectExpr("id", "id % 7 AS grp", "id * 1.5 AS v")
    (
        df.write.format("jdbc")
        .option("url", url).option("dbtable", "t")
        .option("driver", driver).mode("overwrite").save()
    )
    back = lake.read_jdbc(
        spark, url, "t", partition_column="id",
        num_partitions=4, lower_bound=0, upper_bound=1000, driver=driver,
    )
    assert back.count() == 1000
    assert back.rdd.getNumPartitions() == 4
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    filtered = back.filter(F.col("grp") == 3)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GRP" in plan.upper(), plan
    assert filtered.count() == df.filter(F.col("grp") == 3).count()


def test_jdbc_truncate_reset_live(spark, tmp_path):
    """S9 against a live JDBC database: TRUNCATE empties the table but
    keeps it queryable with the same schema (not DROP/CREATE)."""
    from end_end_data_pipeline__spark.sources import connectors

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    spark.range(50).selectExpr("id", "id * 2 AS v").write.format("jdbc").option(
        "url", url
    ).option("dbtable", "t9").option("driver", driver).mode("overwrite").save()
    out = connectors.truncate_reset_jdbc(spark, url, "t9", driver)
    assert out == {"rows_before": 50, "rows_after": 0}
    back = (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "t9").option("driver", driver).load()
    )
    assert back.columns == ["id", "v"] and back.count() == 0


def test_jdbc_v2_catalog_aggregate_pushdown_live(spark, tmp_path):
    """S1 depth: the DSv2 JDBC catalog ships the AGGREGATE to the
    remote engine — the plan must carry PushedAggregates +
    PushedGroupByExpressions + PushedFilters, and the result must
    equal the local recomputation.  (The V1 reader can only push
    filters; production parallel reads use read_jdbc for scans and
    this catalog for remote-side aggregation.)"""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import lake

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.range(1000).selectExpr(
        "id", "id % 7 AS grp", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    (
        df.write.format("jdbc")
        .option("url", url).option("dbtable", "tagg")
        .option("driver", driver).mode("overwrite").save()
    )
    lake.register_jdbc_catalog(spark, "derbycat", url, driver)
    q = spark.sql(
        "SELECT grp, COUNT(*) AS n, SUM(v) AS sv"
        " FROM derbycat.TAGG WHERE grp <> 5 GROUP BY grp"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregates: [COUNT(*), SUM(v)]" in plan, plan
    assert "PushedGroupByExpressions: [grp]" in plan, plan
    assert "PushedFilters:" in plan and "NOT (grp = 5)" in plan, plan
    got = {r["grp"]: (r["n"], r["sv"]) for r in q.collect()}
    exp = {
        r["grp"]: (r["n"], r["sv"])
        for r in df.filter("grp <> 5")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == exp


def test_stream_cdc_to_jdbc_live_exactly_once(spark, tmp_path, monkeypatch):
    """LIVE streaming -> OLTP sink (embedded Derby): micro-batches land
    as single transactions with a batch-id ledger.  Covers: initial
    load, update+delete wave on restart, ledger-skip of a replayed
    batch, and whole-transaction rollback on a mid-transaction crash."""
    import os as _os

    from end_end_data_pipeline__spark import schemas
    from end_end_data_pipeline__spark.sources import cdc
    from end_end_data_pipeline__spark.streaming import upsert as U

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _os.makedirs(src)
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    schema = schemas.cdc_row_schema("accounts")

    def envelopes(rows):
        df = spark.createDataFrame(
            rows,
            "id long, customer_id long, account_type string, balance double,"
            " currency string, created_at long, op string, ts_ms long",
        )
        cdc.encode_envelope(df, "op", "ts_ms", "accounts").coalesce(
            1
        ).write.mode("append").text(src)

    def state():
        df = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "accounts_live")
            .option("driver", driver)
            .load()
        )
        return {r["id"]: r["balance"] for r in df.collect()}

    envelopes([(i, 1, "SAVINGS", 100.0 * i, "USD", 1_700_000_000_000_000, "c", i)
               for i in range(1, 4)])
    U.stream_cdc_file_source_jdbc(
        spark, src, schema, ["id"], url, "accounts_live", ckpt, driver=driver
    ).awaitTermination()
    assert state() == {1: 100.0, 2: 200.0, 3: 300.0}

    envelopes([(2, 1, "SAVINGS", 999.0, "USD", 1_700_000_000_000_000, "u", 10),
               (3, 1, "SAVINGS", 0.0, "USD", 1_700_000_000_000_000, "d", 11),
               (4, 1, "SAVINGS", 444.0, "USD", 1_700_000_000_000_000, "c", 12)])
    U.stream_cdc_file_source_jdbc(
        spark, src, schema, ["id"], url, "accounts_live", ckpt, driver=driver
    ).awaitTermination()
    assert state() == {1: 100.0, 2: 999.0, 4: 444.0}

    # replaying an already-committed batch is a ledger-skip no-op
    batch = cdc.decode(
        cdc.parse_envelope(
            spark.read.text(src), schema
        ),
        ["id"],
    )
    assert U.jdbc_upsert_batch(
        batch, 0, url, "accounts_live", ["id"], driver=driver
    ) is False
    assert state() == {1: 100.0, 2: 999.0, 4: 444.0}

    # crash INSIDE the transaction (on the tombstone DELETE) → full
    # rollback: no partial MERGE, no ledger row; the retry lands whole
    real_exec = U._exec_sql

    def crashing(conn, sql):
        if sql.startswith("DELETE FROM accounts_live"):
            raise RuntimeError("simulated crash mid-transaction")
        real_exec(conn, sql)

    monkeypatch.setattr(U, "_exec_sql", crashing)
    crash_batch = cdc.decode(
        cdc.parse_envelope(
            spark.createDataFrame(
                [(r,) for r in [
                    '{"payload": {"before": null, "after": {"id": 1, '
                    '"customer_id": 1, "account_type": "SAVINGS", '
                    '"balance": 777.0, "currency": "USD", '
                    '"created_at": 1700000000000000}, "op": "u", '
                    '"ts_ms": 99, "source": {"table": "accounts"}}}',
                    '{"payload": {"before": {"id": 4}, "after": null, '
                    '"op": "d", "ts_ms": 99, '
                    '"source": {"table": "accounts"}}}',
                ]], ["value"],
            ),
            schema,
        ),
        ["id"],
    )
    with pytest.raises(RuntimeError, match="mid-transaction"):
        U.jdbc_upsert_batch(
            crash_batch, 777, url, "accounts_live", ["id"], driver=driver
        )
    assert state() == {1: 100.0, 2: 999.0, 4: 444.0}  # rolled back whole
    monkeypatch.undo()
    assert U.jdbc_upsert_batch(
        crash_batch, 777, url, "accounts_live", ["id"], driver=driver
    ) is True
    assert state() == {1: 777.0, 2: 999.0}


def test_pyds_banking_generator_pushdown(spark):
    """Python Data Source connector: partition planning, vectorized
    Arrow reads, and EqualTo pushdown INTO the generator (rejected
    filters hand back to Spark)."""
    import pyarrow as pa
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from end_end_data_pipeline__spark.sources import pyds

    r = pyds.BankingGeneratorReader({"n_rows": "100", "n_partitions": "3"})
    remaining = list(
        r.pushFilters(
            [EqualTo(("status",), "PENDING"), GreaterThan(("amount",), 1.0)]
        )
    )
    assert len(remaining) == 1  # the range filter is NOT supported
    parts = r.partitions()
    assert len(parts) == 3
    tbl = pa.Table.from_batches([b for p in parts for b in r.read(p)])
    assert set(tbl.column("status").to_pylist()) == {"PENDING"}
    assert tbl.num_rows == sum(1 for i in range(100) if 85 <= i % 100 < 93)

    # end to end through the session: pushed filter == Spark-side filter
    pyds.register(spark)

    def load():
        # one load() per query: the DataFrame's plan CACHES its reader
        # instance, so a pushed filter would stick to a reused frame
        # (documented in sources/pyds.py)
        return (
            spark.read.format("banking_gen")
            .option("n_rows", 5000).option("n_partitions", 4).load()
        )

    import pyspark.sql.functions as F

    n_pushed = load().filter(F.col("txn_type") == "FEE").count()
    n_all = load().count()
    assert n_all == 5000
    assert n_pushed == sum(1 for i in range(5000) if i % 7 == 5)
    assert load().rdd.getNumPartitions() == 4


def test_pyds_stream_source_offsets_and_restart(spark, tmp_path):
    """Python streaming source: offset bookkeeping, committed-range
    replay (readBetweenOffsets regenerates identically), and restart
    resume with no duplicates."""
    from end_end_data_pipeline__spark.sources import pyds

    r = pyds.BankingGeneratorStreamReader({"n_rows": "1200", "rows_per_batch": "500"})
    assert r.initialOffset() == {"next_id": 0}
    rows, off = r.read({"next_id": 0})
    assert off == {"next_id": 500} and len(list(rows)) == 500
    rows, off = r.read({"next_id": 1000})
    assert off == {"next_id": 1200} and len(list(rows)) == 200  # tail clamp
    replay = list(r.readBetweenOffsets({"next_id": 0}, {"next_id": 500}))
    assert replay == list(r.read({"next_id": 0})[0])  # deterministic replay

    # two checkpointed runs resume, never duplicate
    import os

    pyds.register_stream(spark)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    for _ in range(2):
        q = (
            spark.readStream.format("banking_gen_stream")
            .option("n_rows", 1000).option("rows_per_batch", 500).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    got = spark.read.parquet(sink)
    assert got.count() == got.select("id").distinct().count()
    assert os.path.isdir(ckpt)


def test_pyds_jsonl_atomic_sink_manifest_protocol(spark, tmp_path):
    """The custom sink's two-phase commit: committed files are exactly
    the manifest's list; an orphan staging file from a crashed task is
    invisible to the manifest-driven reader."""
    import json
    import os

    from end_end_data_pipeline__spark.sources import pyds

    pyds.register_sink(spark)
    path = str(tmp_path / "out")
    os.makedirs(path)
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.repartition(4).write.format("jsonl_atomic").option("path", path).mode(
        "append"
    ).save()
    with open(os.path.join(path, "_MANIFEST")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 100
    assert not os.path.isdir(os.path.join(path, "_staging"))  # cleaned
    # plant an orphan "crashed task" file — reader must not see it
    os.makedirs(os.path.join(path, "_staging"))
    with open(os.path.join(path, "task-9-deadbeef.jsonl"), "w") as f:
        f.write('{"id": 999999, "v": 0}\n')
    back = pyds.read_jsonl_atomic(spark, path, df.schema)
    assert back.count() == 100
    assert back.filter("id = 999999").count() == 0
    assert back.agg({"v": "sum"}).first()[0] == sum(i * 2 for i in range(100))
    # append ACCUMULATES (the manifest carries prior files forward)
    spark.range(100, 150).selectExpr("id", "id * 2 AS v").write.format(
        "jsonl_atomic"
    ).option("path", path).mode("append").save()
    assert pyds.read_jsonl_atomic(spark, path, df.schema).count() == 150
    # overwrite REPLACES and removes the superseded committed files
    spark.range(10).selectExpr("id", "id * 2 AS v").write.format(
        "jsonl_atomic"
    ).option("path", path).mode("overwrite").save()
    back = pyds.read_jsonl_atomic(spark, path, df.schema)
    assert back.count() == 10
    with open(os.path.join(path, "_MANIFEST")) as f:
        m2 = json.load(f)
    on_disk = {fn for fn in os.listdir(path) if fn.endswith(".jsonl")}
    # superseded COMMITTED files are gone; the planted never-committed
    # orphan is not the overwrite's to delete (vacuum territory)
    assert on_disk == set(m2["files"]) | {"task-9-deadbeef.jsonl"}


def test_jsonl_atomic_refuses_remote_paths(spark):
    """r07 review: the sink stages on the executor-local filesystem and
    commits with driver-side os.replace — a remote path would fail (or
    mis-commit) only AFTER every task succeeded, so it is refused up
    front."""
    from end_end_data_pipeline__spark.sources.pyds import JsonlAtomicWriter

    import pytest as _pytest

    with _pytest.raises(ValueError, match="LOCAL filesystem"):
        JsonlAtomicWriter({"path": "s3a://bucket/out"}, overwrite=True)
    # local paths (bare and file://) are accepted
    JsonlAtomicWriter({"path": "/tmp/x"}, overwrite=True)
    JsonlAtomicWriter({"path": "file:///tmp/x"}, overwrite=True)


def test_single_jvm_boundary_markers_exact():
    """Round-8 multi-JVM sweep (CLUSTER_r08.json) found that the live
    embedded-Derby fixtures cannot run under a multi-JVM master (the
    embedded engine is bootable by ONE JVM; Spark ships derby.jar only,
    no derbynet/derbyclient to network it).  The catalog marks those
    queries ``single_jvm=True`` and scripts/driver_gate.py skips them
    with an explicit marker when ``--master`` is multi-JVM.  This test
    keeps the marker set EXACT in both directions: every query whose
    source touches an embedded-Derby URL is marked (a new Derby query
    without the marker would ERR the next cluster sweep), and nothing
    else is marked (the flag must never become a blanket excuse)."""
    import inspect

    from end_end_data_pipeline__spark.plans.catalog import load_all

    qs = load_all()
    marked = {n for n, q in qs.items() if q.single_jvm}
    derby = {n for n, q in qs.items() if "jdbc:derby" in inspect.getsource(q.fn)}
    assert marked == derby == {
        "jdbc_roundtrip_live",
        "federated_jdbc_parquet_join",
        "stream_jdbc_upsert_live",
    }
    for n in marked:
        assert "SINGLE-JVM boundary" in qs[n].doc, n
