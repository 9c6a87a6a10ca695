#!/usr/bin/env python3
"""Long-horizon soak of the changelog-checkpointing default (r12 task 2).

The r11 fix made RocksDB changelog checkpointing the engine default
(``session.get_spark``): per-batch commits upload the delta changelog
and full SST snapshots move to the background maintenance thread.  All
r11 evidence for that default runs 5-batch streams — too short to see
the one failure mode changelog opens: if maintenance LAGS the batch
rate, the snapshot+changelog replay chain a recovering executor must
apply grows with batch count, so recovery at batch ~100 would cost ~10x
recovery at batch ~10 and the "bounded recovery" claim dies at
long-horizon streams.

This soak runs the 1M-key dedup shape (dropDuplicatesWithinWatermark,
the STREAM_STATE_r10 capacity subject) over >=100 REAL micro-batches
(events re-ranged into one time-ordered part file per batch,
maxFilesPerTrigger=1) under the production provider config
(RocksDB + changelog, mirroring session.get_spark) on
``local-cluster[2,4,3072]`` — real executor JVMs, so a SIGKILL
exercises the genuine reload path (snapshot download + changelog
replay on the surviving executor).  Three runs:

* ``clean``    — no kill: per-batch commit/changelog/fileSync/load
                 latencies + the per-partition ``SnapshotLastUploaded``
                 version, whose lag behind the live version IS the
                 replay-chain length (bounded lag = maintenance keeps
                 up).
* ``kill@10``  — executor SIGKILL once ~10 data batches committed
                 (short chain reference).
* ``kill@100`` — executor SIGKILL once ~100 data batches committed:
                 the long-horizon recovery the 5-batch evidence never
                 measured.

Contract: all three final hashes equal each other and the DuckDB
oracle (a soak that changed the answer would be worthless), both kills
must land in-flight (pid + kill time < stream end), and the kill@100
recovery must be BOUNDED: its post-kill recovery batch may not exceed
``--bound-factor`` x the kill@10 one (default 3x — generous for
machine noise, far under the ~10x a growing chain would show).

Usage:
    python scripts/stream_soak.py [--batches 120] [--tier 10]
        [--bound-factor 3.0] [--out STREAM_SOAK_r12.json]

Output: one JSON report (repo root).  Findings land in BASELINE.md's
streaming-state section.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)
sys.path.insert(0, str(Path(__file__).resolve().parent))

MASTER = "local-cluster[2,4,3072]"
ROCKSDB = ("org.apache.spark.sql.execution.streaming."
           "state.RocksDBStateStoreProvider")

_CUSTOM_KEYS = (
    "rocksdbChangeLogWriterCommitLatencyMs",
    "rocksdbCommitFileSyncLatencyMs",
    "rocksdbLoadLatencyMs",
    "rocksdbTotalBytesWritten",
)


def ensure_soak_fixture(tier: int, n_files: int) -> str:
    """Events decade re-ranged into ``n_files`` time-ordered part files
    (one per micro-batch at maxFilesPerTrigger=1), mtimes pinned
    strictly increasing so the file source lists them in time order —
    same derivation discipline as streaming_state_scale.ensure_tier,
    which only goes to 40 files."""
    import streaming_state_scale as sss

    base_dir = sss.ensure_tier(tier)  # also guarantees /tmp/sf1-derived links
    out_dir = f"/tmp/events-stream-soak-{tier}x-{n_files}f"
    events = os.path.join(out_dir, "events.parquet")
    if (os.path.isdir(events)
            and not os.path.exists(os.path.join(events, "_SUCCESS"))):
        shutil.rmtree(out_dir)
    if not os.path.isdir(events):
        from end_end_data_pipeline__spark.session import get_spark
        from end_end_data_pipeline__spark.sources import lake

        os.makedirs(out_dir, exist_ok=True)
        spark = get_spark("soak-fixture")
        spark.conf.set("spark.sql.parquet.outputTimestampType",
                       "TIMESTAMP_MICROS")
        (
            lake.load_table(spark, "events", base_dir)
            .repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts")
            .write.parquet(events)
        )
        print("derived", out_dir, flush=True)
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(sss.SF1, f"{t}.parquet"), link)
    parts = sorted(f for f in os.listdir(events) if f.endswith(".parquet"))
    t0 = int(time.time()) - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(events, f), (t0 + i * 10, t0 + i * 10))
    return out_dir


def _batch_rows(progress_list) -> list[dict]:
    """Per-DATA-batch metric rows from a recentProgress list."""
    rows = []
    for p in progress_list:
        if p.get("numInputRows", 0) <= 0:
            continue
        row = {
            "batch_id": p.get("batchId"),
            "rows": p.get("numInputRows"),
            "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
        }
        for so in p.get("stateOperators", []):
            row["commit_ms"] = so.get("commitTimeMs")
            row["state_rows"] = so.get("numRowsTotal")
            cm = so.get("customMetrics") or {}
            for k in _CUSTOM_KEYS:
                if cm.get(k):
                    row[k] = cm[k]
            # replay-chain length observable: the live state version is
            # batchId+1; SnapshotLastUploaded.partition_N is the newest
            # snapshot version the maintenance thread has uploaded for
            # partition N.  max over partitions of (live - uploaded) =
            # the longest changelog chain a recovering executor would
            # replay right now.
            snaps = [v for k, v in cm.items()
                     if k.startswith("SnapshotLastUploaded.") and v >= 0]
            if snaps:
                row["snapshot_lag_max"] = int(
                    (p.get("batchId", 0) + 1) - min(snaps))
        rows.append(row)
    return rows


def run_soak(spark, sf_dir: str, sink: str, kill_at: int | None,
             me: int, app_id: str) -> dict:
    """One availableNow dedup soak; optional executor SIGKILL once
    ``kill_at`` data batches have committed."""
    import streaming_state_scale as sss
    from executor_loss_stress import executor_pids

    from end_end_data_pipeline__spark.session import bounded_stream_shuffle

    stream_df, mode, finalize = sss._queries(
        spark, sf_dir, reader_options={"maxFilesPerTrigger": "1"},
    )["dedup"]()
    ckpt = tempfile.mkdtemp(prefix=f"soak_{sink}_")
    res: dict = {"kill_at": kill_at}
    killed: dict = {}
    stop_evt = threading.Event()
    try:
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass
        with bounded_stream_shuffle(spark):
            q = (
                stream_df.writeStream.outputMode(mode)
                .format("memory")
                .queryName(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

            def killer():
                while not stop_evt.is_set():
                    done = sum(1 for p in q.recentProgress
                               if p.get("numInputRows", 0) > 0)
                    if done >= kill_at:
                        pids = executor_pids(me, app_id)
                        if pids:
                            victim = pids[done % len(pids)]
                            try:
                                os.kill(victim, signal.SIGKILL)
                                killed["pid"] = victim
                                killed["time"] = time.time()
                                killed["after_batches"] = done
                            except ProcessLookupError:
                                pass
                        return
                    time.sleep(0.25)

            th = None
            if kill_at is not None:
                th = threading.Thread(target=killer)
                th.start()
            t0 = time.time()
            q.awaitTermination()
            stream_end = time.time()
            stop_evt.set()
            if th:
                th.join()
        res["stream_wall_sec"] = round(stream_end - t0, 2)
        res["batches"] = _batch_rows(q.recentProgress)
        res["n_data_batches"] = len(res["batches"])
        pdf = finalize(spark.table(sink)).toPandas()
        res["hash"], res["rows"] = sss._canon_hash(pdf)
        res["checkpoint_state_bytes"] = sss._du(os.path.join(ckpt, "state"))
        if kill_at is not None:
            res["killed_pid"] = killed.get("pid")
            res["killed_after_batches"] = killed.get("after_batches")
            res["kill_in_flight"] = bool(
                killed.get("pid") and killed["time"] < stream_end)
            if killed.get("time"):
                # recovery batch = the slowest batch committed at/after
                # the kill instant — it absorbs task retry + state-store
                # reload (snapshot download + changelog replay)
                post = [b for b in res["batches"]
                        if b["batch_id"] is not None
                        and b["batch_id"] >= killed["after_batches"] - 1]
                if post:
                    worst = max(post, key=lambda b: b["trigger_ms"] or 0)
                    res["recovery_batch"] = worst
                    res["recovery_batch_sec"] = round(
                        (worst["trigger_ms"] or 0) / 1000.0, 2)
    finally:
        stop_evt.set()
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
    return res


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, default=120)
    ap.add_argument("--tier", type=int, default=10)
    ap.add_argument("--bound-factor", type=float, default=3.0)
    ap.add_argument("--out", default="STREAM_SOAK_r12.json")
    args = ap.parse_args()

    import streaming_state_scale as sss

    from pyspark.sql import SparkSession

    from tests.oracle import duck_run

    sf_dir = ensure_soak_fixture(args.tier, args.batches)
    # fixture derivation may have created a local[32] session;
    # getOrCreate would silently REUSE it (ignoring .master), the soak
    # would run single-JVM with no executor processes, and both kills
    # would no-op — stop it so the cluster session actually builds
    existing = SparkSession.getActiveSession()
    if existing is not None:
        existing.stop()
    spark = (
        SparkSession.builder.master(MASTER)
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        .config("spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled", "true")
        # keep every batch's progress row: the default ring buffer
        # (100) would silently drop the early batches of a 120-batch
        # soak and with them the snapshot-lag series
        .config("spark.sql.streaming.numRecentProgressUpdates",
                str(args.batches * 2 + 20))
        .getOrCreate()
    )
    if spark.sparkContext.master != MASTER:
        raise RuntimeError(
            f"soak needs {MASTER}, got {spark.sparkContext.master} — "
            "a pre-existing session leaked into getOrCreate")
    me = os.getpid()
    app_id = spark.sparkContext.applicationId

    oracle_pdf = duck_run(sss.ORACLES["dedup"], sf_dir)
    o_hash, _ = sss._canon_hash(oracle_pdf)

    report: dict = {
        "master": MASTER, "sf_dir": sf_dir, "provider": "RocksDB+changelog",
        "n_part_files": args.batches, "files_per_trigger": 1,
        "bound_factor": args.bound_factor, "runs": {},
    }
    late_kill = args.batches - 20
    plan = [("clean", None), ("kill@10", 10), (f"kill@{late_kill}", late_kill)]
    ok = True
    for name, kill_at in plan:
        r = run_soak(spark, sf_dir, f"soak_{name.replace('@', '_')}",
                     kill_at, me, app_id)
        r["oracle_match"] = bool(r["hash"] == o_hash)
        ok &= r["oracle_match"]
        if kill_at is not None:
            ok &= bool(r.get("kill_in_flight"))
        lag = [b.get("snapshot_lag_max") for b in r["batches"]
               if b.get("snapshot_lag_max") is not None]
        trig = sorted((b["trigger_ms"] or 0) / 1000.0 for b in r["batches"])
        summary = {
            "n_data_batches": r["n_data_batches"],
            "stream_wall_sec": r["stream_wall_sec"],
            "batch_sec_median": round(trig[len(trig) // 2], 2) if trig else None,
            "batch_sec_p95": round(trig[int(len(trig) * 0.95)], 2) if trig else None,
            "batch_sec_max": round(trig[-1], 2) if trig else None,
            "snapshot_lag_max_overall": max(lag) if lag else None,
            "oracle_match": r["oracle_match"],
        }
        if kill_at is not None:
            summary.update({
                "kill_in_flight": r.get("kill_in_flight"),
                "killed_after_batches": r.get("killed_after_batches"),
                "recovery_batch_sec": r.get("recovery_batch_sec"),
            })
        r["summary"] = summary
        report["runs"][name] = r
        print(f"{name}: {json.dumps(summary)}", flush=True)
        time.sleep(5)  # let a killed executor relaunch before the next run

    early = report["runs"]["kill@10"].get("recovery_batch_sec")
    late = report["runs"][f"kill@{late_kill}"].get("recovery_batch_sec")
    bounded = (early is not None and late is not None
               and late <= args.bound_factor * max(early, 1.0))
    report["recovery_bounded"] = bool(bounded)
    report["recovery_early_vs_late_sec"] = [early, late]
    ok &= bounded
    report["ok"] = bool(ok)
    Path(args.out).write_text(json.dumps(report, indent=1))
    print("wrote", args.out, "ok:", ok, flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
