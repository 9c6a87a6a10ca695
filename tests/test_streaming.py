"""Streaming-core tests: CDC decode/apply semantics, watermark
late-data drops (ST3), checkpointed upsert idempotency (ST6/ST8)."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from end_end_data_pipeline__spark import schemas
from end_end_data_pipeline__spark.sources import cdc
from end_end_data_pipeline__spark.streaming.upsert import merge_batch, stream_cdc_file_source


def _tx_envelope(id, amount, op, ts_ms, account_id=1):
    import json

    after = None if op == "d" else {
        "id": id, "account_id": account_id, "txn_type": "DEPOSIT",
        "amount": amount, "related_account_id": None,
        "status": "COMPLETED", "created_at": 1719792000000000,
    }
    before = None if op == "c" else {"id": id, "account_id": account_id,
                                     "txn_type": "DEPOSIT", "amount": 1.0,
                                     "related_account_id": None,
                                     "status": "COMPLETED",
                                     "created_at": 1719792000000000}
    return json.dumps({"payload": {"before": before, "after": after, "op": op,
                                   "ts_ms": ts_ms, "source": {"table": "transactions"}}})


def test_cdc_decode_and_latest_wins(spark):
    """Insert → update → duplicate update → delete: latest ts_ms wins,
    deletes remove, duplicates collapse (FIXTURES.md §C required cases)."""
    lines = [
        _tx_envelope(1, 10.0, "c", 100),
        _tx_envelope(1, 20.0, "u", 200),
        _tx_envelope(1, 20.0, "u", 200),  # at-least-once duplicate
        _tx_envelope(2, 5.0, "c", 100),
        _tx_envelope(2, None, "d", 300),
        _tx_envelope(3, 7.0, "c", 100),
    ]
    raw = spark.createDataFrame([(l,) for l in lines], ["value"])
    changes = cdc.decode(
        cdc.parse_envelope(raw, schemas.cdc_row_schema("transactions")), ["id"]
    )
    state = cdc.apply_latest_state(changes, ["id"])
    rows = {r["id"]: r for r in state.collect()}
    assert set(rows) == {1, 3}  # 2 deleted
    assert rows[1]["amount"] == 20.0  # update won
    assert rows[3]["amount"] == 7.0

    silver = cdc.silver_banking(state, "transactions")
    s1 = {r["id"]: r for r in silver.collect()}
    assert str(s1[1]["amount"]) == "20.00"  # DECIMAL(18,2) restored
    assert s1[1]["created_at"].year == 2024  # epoch-micros decoded


def test_cdc_tombstone_and_malformed_filtered(spark):
    raw = spark.createDataFrame(
        [("null",), ("{}",), ('{"payload": null}',), ("not json",),
         (_tx_envelope(9, 1.5, "c", 1),)],
        ["value"],
    )
    changes = cdc.decode(
        cdc.parse_envelope(raw, schemas.cdc_row_schema("transactions")), ["id"]
    )
    assert changes.count() == 1


def test_watermark_drops_late_rows(spark):
    """ST3: with a 10-minute watermark, a row arriving after the
    watermark has passed its window is dropped from the aggregation."""
    from datetime import datetime, timedelta

    tmp = tempfile.mkdtemp(prefix="wm_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    base = datetime(2024, 1, 1, 10, 0, 0)
    # batch 1: on-time rows advancing the watermark to 11:50
    df1 = spark.createDataFrame(
        [(1, base), (2, base + timedelta(hours=2))], "id long, ts timestamp"
    )
    df1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("id long, ts timestamp").parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("update").format("memory")
        .queryName("wm_sink").trigger(processingTime="500 milliseconds").start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a very late row in the 10:00 window — beyond watermark
        df2 = spark.createDataFrame(
            [(3, base + timedelta(minutes=1))], "id long, ts timestamp"
        )
        df2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        r["window"]["start"].hour: r["n"]
        for r in spark.sql("SELECT * FROM wm_sink").collect()
    }
    # the late row must NOT have bumped the 10:00 window to 2
    assert out.get(10) == 1, out


def test_upsert_merge_idempotent_replay(spark):
    """ST6/ST8: re-applying the same batch (at-least-once replay) leaves
    the lake state unchanged — the merge is idempotent."""
    tmp = tempfile.mkdtemp(prefix="merge_")
    target = os.path.join(tmp, "target")
    lines = [
        _tx_envelope(1, 10.0, "c", 100),
        _tx_envelope(2, 5.0, "c", 100),
    ]
    raw = spark.createDataFrame([(l,) for l in lines], ["value"])
    batch = cdc.decode(
        cdc.parse_envelope(raw, schemas.cdc_row_schema("transactions")), ["id"]
    )
    merge_batch(batch, target, ["id"])
    first = sorted((r["id"], r["amount"]) for r in spark.read.parquet(target).collect())
    merge_batch(batch, target, ["id"])  # replay
    second = sorted((r["id"], r["amount"]) for r in spark.read.parquet(target).collect())
    assert first == second == [(1, 10.0), (2, 5.0)]

    # later update arrives; earlier replay of the old batch must not regress it
    upd = spark.createDataFrame([(_tx_envelope(1, 99.0, "u", 500),)], ["value"])
    merge_batch(
        cdc.decode(cdc.parse_envelope(upd, schemas.cdc_row_schema("transactions")), ["id"]),
        target, ["id"],
    )
    state = {r["id"]: r["amount"] for r in spark.read.parquet(target).collect()}
    assert state[1] == 99.0


def test_merge_batch_rewrites_only_affected_buckets(spark, tmp_path):
    """The merge must be partition-scoped: a micro-batch touching one
    key rewrites only that key's hash bucket — every other bucket's
    files are bit-for-bit untouched (same paths, same mtimes)."""
    import glob

    target = str(tmp_path / "target")
    n_buckets = 8
    base = [_tx_envelope(i, float(i), "c", 100) for i in range(1, 33)]
    raw = spark.createDataFrame([(l,) for l in base], ["value"])
    merge_batch(
        cdc.decode(cdc.parse_envelope(raw, schemas.cdc_row_schema("transactions")), ["id"]),
        target, ["id"], n_buckets=n_buckets,
    )
    bucket_dirs = sorted(glob.glob(os.path.join(target, "p_bucket=*")))
    assert len(bucket_dirs) > 1  # 32 keys spread over 8 buckets

    def listing(d):
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }

    before = {d: listing(d) for d in bucket_dirs}

    upd = spark.createDataFrame([(_tx_envelope(1, 999.0, "u", 500),)], ["value"])
    batch2 = cdc.decode(
        cdc.parse_envelope(upd, schemas.cdc_row_schema("transactions")), ["id"]
    )
    touched = batch2.selectExpr(f"pmod(xxhash64(id), {n_buckets}) b").first()["b"]
    merge_batch(batch2, target, ["id"], n_buckets=n_buckets)

    for d in bucket_dirs:
        if d.endswith(f"p_bucket={touched}"):
            assert listing(d) != before[d]  # rewritten
        else:
            assert listing(d) == before[d], f"untouched bucket rewritten: {d}"
    state = {r["id"]: r["amount"] for r in spark.read.parquet(target).collect()}
    assert state[1] == 999.0 and len(state) == 32


def test_merge_batch_drops_fully_deleted_bucket(spark, tmp_path):
    """A bucket whose only key is tombstoned must lose its partition
    dir (dynamic overwrite alone would leave the stale files)."""
    import glob

    target = str(tmp_path / "target")
    raw = spark.createDataFrame([(_tx_envelope(7, 7.0, "c", 100),)], ["value"])
    dec = lambda df: cdc.decode(  # noqa: E731
        cdc.parse_envelope(df, schemas.cdc_row_schema("transactions")), ["id"]
    )
    merge_batch(dec(raw), target, ["id"], n_buckets=4)
    assert len(glob.glob(os.path.join(target, "p_bucket=*"))) == 1

    tomb = spark.createDataFrame([(_tx_envelope(7, None, "d", 200),)], ["value"])
    merge_batch(dec(tomb), target, ["id"], n_buckets=4)
    assert glob.glob(os.path.join(target, "p_bucket=*")) == []
    # and a later insert re-seeds cleanly on the emptied table
    re_ins = spark.createDataFrame([(_tx_envelope(8, 8.0, "c", 300),)], ["value"])
    merge_batch(dec(re_ins), target, ["id"], n_buckets=4)
    assert {r["id"] for r in spark.read.parquet(target).collect()} == {8}


def test_merge_batch_refuses_ambiguous_target(spark, tmp_path):
    """Data present without a root _SUCCESS marker = interrupted
    commit; merging on top could lose rows, so it must raise."""
    import pytest

    target = str(tmp_path / "target")
    raw = spark.createDataFrame([(_tx_envelope(1, 1.0, "c", 100),)], ["value"])
    batch = cdc.decode(
        cdc.parse_envelope(raw, schemas.cdc_row_schema("transactions")), ["id"]
    )
    merge_batch(batch, target, ["id"])
    os.remove(os.path.join(target, "_SUCCESS"))
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        merge_batch(batch, target, ["id"])


def test_merge_batch_crash_mid_commit_detected(spark, tmp_path, monkeypatch):
    """Crash-injection for the _SUCCESS commit protocol: kill the
    dynamic overwrite mid-commit, AFTER a bucket directory was already
    destroyed (the non-atomic delete+rename window inside commit).
    Because the merge drops the root marker before the overwrite
    starts, the next merge must hit the RuntimeError refusal path —
    never read the half-replaced bucket back as committed empty state
    and silently drop its keys."""
    import glob
    import shutil

    from end_end_data_pipeline__spark.streaming import upsert

    target = str(tmp_path / "target")
    dec = lambda df: cdc.decode(  # noqa: E731
        cdc.parse_envelope(df, schemas.cdc_row_schema("transactions")), ["id"]
    )
    base = spark.createDataFrame(
        [(_tx_envelope(i, float(i), "c", 100),) for i in range(1, 9)], ["value"]
    )
    merge_batch(dec(base), target, ["id"], n_buckets=2)
    assert os.path.exists(os.path.join(target, "_SUCCESS"))

    def crashing(materialized, path):
        victim = sorted(glob.glob(os.path.join(target, "p_bucket=*")))[0]
        shutil.rmtree(victim)  # commit half-applied: bucket gone
        raise RuntimeError("simulated executor loss mid-commit")

    monkeypatch.setattr(upsert, "_overwrite_buckets", crashing)
    upd = spark.createDataFrame([(_tx_envelope(1, 999.0, "u", 500),)], ["value"])
    with pytest.raises(RuntimeError, match="simulated"):
        merge_batch(dec(upd), target, ["id"], n_buckets=2)
    # the crash window must leave data WITHOUT a marker (= detectable)
    assert not os.path.exists(os.path.join(target, "_SUCCESS"))

    monkeypatch.undo()
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        merge_batch(dec(upd), target, ["id"], n_buckets=2)


def test_merge_batch_custom_version_col(spark, tmp_path):
    """A non-default ``version_col`` threads through decode-shaped
    batches end-to-end (regression: the synthetic-baseline alias used
    to collide with the hardcoded ts_ms ordering and throw on union)."""
    target = str(tmp_path / "target")

    def to_batch(rows):
        df = spark.createDataFrame(rows, "id long, amount double, op string, seq long")
        return df.select(
            "id",
            "op",
            "seq",
            F.when(
                F.col("op") != "d", F.struct("id", "amount")
            ).alias("after"),
        )

    merge_batch(to_batch([(1, 10.0, "c", 5), (2, 20.0, "c", 5)]),
                target, ["id"], version_col="seq")
    # within-batch ordering must follow seq, not arrival order
    batch2 = to_batch([(1, 99.0, "u", 9), (1, 55.0, "u", 7)])
    merge_batch(batch2, target, ["id"], version_col="seq")
    merge_batch(batch2, target, ["id"], version_col="seq")  # replay
    state = {r["id"]: r["amount"] for r in spark.read.parquet(target).collect()}
    assert state == {1: 99.0, 2: 20.0}


def test_sessionize_out_of_order_batches_match_batch(spark, tmp_path):
    """Out-of-order arrival across micro-batches: with allowed
    lateness, stragglers merge into the right session (even bridging
    two candidate sessions) and the emitted sessions equal the batch
    computation — the pre-round-4 ordered-arrival assumption is gone."""
    from end_end_data_pipeline__spark.streaming.stateful import sessionize

    gap = 1_800_000
    src = str(tmp_path / "src")
    # chronological events for user 1: session A = {0, 1000, 2000},
    # session B = {5_000_000}; sentinel 20_000_000 finalizes both.
    # Delivery order scrambles them across micro-batches: B first, then
    # A split so 1000 arrives AFTER 2000 and 5_000_000 (a late interior
    # event that must land inside already-buffered session A).
    batches = [
        [(1, 5_000_000)],
        [(1, 0), (1, 2000)],
        [(1, 1000)],
        [(1, 20_000_000)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "user_id long, ts_ms long").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize(stream, gap_ms=gap, allowed_lateness_ms=10_000_000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessionize_ooo_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.table("sessionize_ooo_sink").collect()
    )
    assert got == [(0, 2000, 3), (5_000_000, 5_000_000, 1)]


def test_sessionize_drops_beyond_lateness(spark, tmp_path):
    """An event behind the per-key watermark is dropped — it must never
    fabricate a wrong session (the pre-round-4 failure mode)."""
    from end_end_data_pipeline__spark.streaming.stateful import sessionize

    src = str(tmp_path / "src")
    for rows in [[(1, 50_000_000)], [(1, 0)], [(1, 99_000_000)]]:
        spark.createDataFrame(rows, "user_id long, ts_ms long").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize(stream, gap_ms=1_800_000, allowed_lateness_ms=0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessionize_drop_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.table("sessionize_drop_sink").collect()
    )
    # t=0 arrived behind the watermark (50_000_000) → dropped; only the
    # 50M session finalizes (by the 99M sentinel); no fabricated session
    assert got == [(50_000_000, 50_000_000, 1)]


def test_stream_cdc_file_source_end_to_end(spark):
    """File-source CDC stream → checkpointed foreachBatch merge →
    restart with new data resumes from the checkpoint (no reprocess)."""
    tmp = tempfile.mkdtemp(prefix="stream_cdc_")
    src, target, ckpt = (os.path.join(tmp, d) for d in ("src", "target", "ckpt"))
    os.makedirs(src)

    def write_lines(name, lines):
        with open(os.path.join(src, name), "w") as f:
            f.write("\n".join(lines))

    write_lines("b1.jsonl", [_tx_envelope(1, 10.0, "c", 100),
                             _tx_envelope(2, 5.0, "c", 100)])
    q = stream_cdc_file_source(
        spark, src, schemas.cdc_row_schema("transactions"), ["id"], target, ckpt
    )
    q.awaitTermination()
    assert spark.read.parquet(target).count() == 2

    write_lines("b2.jsonl", [_tx_envelope(1, 42.0, "u", 900),
                             _tx_envelope(2, None, "d", 900)])
    q2 = stream_cdc_file_source(
        spark, src, schemas.cdc_row_schema("transactions"), ["id"], target, ckpt
    )
    q2.awaitTermination()
    state = {r["id"]: r["amount"] for r in spark.read.parquet(target).collect()}
    assert state == {1: 42.0}


def test_stateful_user_stats_matches_batch(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: force 2
    batches via maxFilesPerTrigger and check final state == batch agg."""
    from end_end_data_pipeline__spark.streaming.stateful import running_user_stats

    src = str(tmp_path / "src")
    rows1 = [(1, 100), (1, 200), (2, 50)]
    rows2 = [(1, 300), (2, 75), (3, 10)]
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, "user_id long, ts_ms long").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_test_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pyspark.sql.functions as F

    final = {
        r["user_id"]: (r["n"], r["last"])
        for r in spark.table("stateful_test_sink")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("last_event_ms").alias("last"))
        .collect()
    }
    assert final == {1: (3, 300), 2: (2, 75), 3: (1, 10)}


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts (ST6/ST8): run the checkpointed
    upsert stream, stop, deliver more CDC files (updates + a delete),
    start a NEW query on the SAME checkpoint — the second run must
    process only the new files and converge to the merged state."""
    import os

    from end_end_data_pipeline__spark import schemas
    from end_end_data_pipeline__spark.sources import cdc as cdc_mod
    from end_end_data_pipeline__spark.streaming.upsert import stream_cdc_file_source

    src, target, ckpt = (str(tmp_path / d) for d in ("src", "target", "ckpt"))
    os.makedirs(src)
    schema = schemas.cdc_row_schema("accounts")

    def envelopes(rows, fname):
        df = spark.createDataFrame(
            rows,
            "id long, customer_id long, account_type string, balance double,"
            " currency string, created_at long, op string, ts_ms long",
        )
        cdc_mod.encode_envelope(df, "op", "ts_ms", "accounts").coalesce(
            1
        ).write.mode("append").text(src)

    base = [(i, 1, "SAVINGS", 100.0 * i, "USD", 1_700_000_000_000_000, "c", i)
            for i in range(1, 6)]
    envelopes(base, "b1")
    q1 = stream_cdc_file_source(spark, src, schema, ["id"], target, ckpt)
    q1.awaitTermination()
    state1 = {r["id"]: r["balance"] for r in spark.read.parquet(target).collect()}
    assert state1 == {i: 100.0 * i for i in range(1, 6)}

    # batch 2: update id=2, delete id=3, insert id=6
    later = [
        (2, 1, "SAVINGS", 999.0, "USD", 1_700_000_000_000_000, "u", 100),
        (3, 1, "SAVINGS", 300.0, "USD", 1_700_000_000_000_000, "d", 101),
        (6, 1, "SAVINGS", 600.0, "USD", 1_700_000_000_000_000, "c", 102),
    ]
    envelopes(later, "b2")
    q2 = stream_cdc_file_source(spark, src, schema, ["id"], target, ckpt)
    q2.awaitTermination()
    state2 = {r["id"]: r["balance"] for r in spark.read.parquet(target).collect()}
    assert state2 == {1: 100.0, 2: 999.0, 4: 400.0, 5: 500.0, 6: 600.0}


def test_tws_backend_guarded_without_protobuf(spark):
    """The transformWithStateInPandas backend needs google.protobuf
    (TWS state-server protocol).  Where it is absent the wrapper must
    fail fast with a clear ImportError, not crash the streaming python
    runner mid-query."""
    pytest.importorskip(
        "pyspark.sql.streaming.stateful_processor", reason="no TWS API"
    )
    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False
    if has_protobuf:
        pytest.skip("protobuf present - covered by the live TWS test")
    from end_end_data_pipeline__spark.streaming.stateful import (
        running_user_stats_tws,
    )

    stream = (
        spark.readStream.schema("user_id long, ts_ms long")
        .parquet("/root/testdata")  # never started; guard fires first
    )
    with pytest.raises(ImportError, match="protobuf"):
        running_user_stats_tws(stream)


def test_tws_user_stats_matches_batch(spark, tmp_path):
    """transformWithStateInPandas form of the user-stats state machine
    (runs only where google.protobuf exists: the TWS python runner
    imports it for its state-server protocol)."""
    pytest.importorskip("google.protobuf", reason="TWS needs protobuf")
    from end_end_data_pipeline__spark.streaming.stateful import (
        running_user_stats_tws,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        for rows in [[(1, 100), (1, 200), (2, 50)], [(1, 300), (2, 75), (3, 10)]]:
            spark.createDataFrame(rows, "user_id long, ts_ms long").coalesce(
                1
            ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts_ms long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_user_stats_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_test_sink")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = {
            r["user_id"]: (r["n"], r["last"])
            for r in spark.table("tws_test_sink")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n"), F.max("last_event_ms").alias("last"))
            .collect()
        }
        assert final == {1: (3, 300), 2: (2, 75), 3: (1, 10)}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_hll_incremental_equals_batch_sketch(spark):
    """The three-micro-batch incremental register merge must equal the
    single-shot batch sketch: same estimate, and genuinely three
    batches folded."""
    from end_end_data_pipeline__spark.operators import sketches
    from end_end_data_pipeline__spark.plans.queries_streaming import (
        stream_hll_incremental,
    )
    from tests.conftest import SF_SMOKE
    from end_end_data_pipeline__spark.sources import lake

    row = stream_hll_incremental(spark, SF_SMOKE).collect()[0]
    assert row["n_batches"] == 3

    ev = lake.load_table(spark, "events", SF_SMOKE).filter(
        F.col("user_id").isNotNull()
    )
    direct = sketches.hll_estimate(
        sketches.hll_build(ev, "user_id")
    ).collect()[0]
    assert row["hll_estimate"] == direct["hll_estimate"]
    assert row["n_zero_registers"] == direct["n_zero_registers"]


def test_overwrite_never_creates_success_marker(spark, tmp_path):
    """r07 review: Spark's commit protocol writes the committer's
    _SUCCESS BEFORE the dynamic-partition delete+rename swap, so the
    auto-marker must be suppressed — otherwise a crash inside that
    window leaves marker-present with a bucket's data gone and the next
    merge silently re-seeds from the half-replaced state.  The ONLY
    _SUCCESS creator must be merge_batch's explicit create after
    overwrite AND cleanup."""
    import os

    from end_end_data_pipeline__spark.streaming import upsert as U

    target = str(tmp_path / "t")
    df = spark.range(10).select(
        "id", F.pmod(F.xxhash64("id"), F.lit(4)).alias(U.BUCKET_COL)
    )
    U._overwrite_buckets(df, target)
    assert not os.path.exists(os.path.join(target, "_SUCCESS"))
    # the full merge DOES end committed (explicit marker)
    batch = spark.createDataFrame(
        [(1, "c", 1)], "id long, op string, ts_ms long"
    ).select(
        "id", "op", "ts_ms",
        F.when(F.col("op") != "d", F.struct("id")).alias("after"),
    )
    target2 = str(tmp_path / "t2")
    U.merge_batch(batch, target2, ["id"], n_buckets=2)
    assert os.path.exists(os.path.join(target2, "_SUCCESS"))
