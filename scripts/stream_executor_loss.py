#!/usr/bin/env python3
"""Executor-LOSS determinism for STATEFUL STREAMING (round 11).

The failure-injection matrix so far covers batch executor loss
(``executor_loss_stress.py`` — SIGKILL mid-job, 8/8 no-corruption),
task retries (``retry_stress*.py``), and streaming DRIVER restart
(``streaming_state_scale.py --kill-resume`` — stop + resume from the
same checkpoint, byte-identical).  The one axis left unmeasured is the
routine one at 1000 executors: an executor JVM dying MID-MICRO-BATCH
while holding live RocksDB state-store instances.  Recovery then goes
through a different path than driver restart — the batch's failed
tasks are retried on the surviving/relaunched executor, which must
reload the state-store version for those partitions from the
checkpoint (snapshot + changelog replay, since the engine default is
changelog checkpointing) before recomputing.

Contract (same as the batch stress): every trial ends ``identical``
(final sink hash equals the clean run's) or ``failed_loudly`` — a
silently different hash is corruption and fails the script.  Because
state commits are per-batch transactional and the memory sink commits
at the driver after each batch, recovery should land ``identical``
every time here; the script additionally requires at least one
mid-stream kill to have actually connected (killed_pid set) and
recovered, so a vacuously green run cannot pass.

Subjects (built from streaming_state_scale's measured query set, on
the time-ordered 10x tier — 2 M input rows, 1 M dedup state keys,
20 part files, maxFilesPerTrigger=4 → 5 data micro-batches):

* ``dedup``     — dropDuplicatesWithinWatermark, complete-mode count:
                  the 1 M-key RocksDB state shape.
* ``sessionize``— applyInPandasWithState gap state machine, append
                  mode: the Python-state-machine shape (per-key state
                  rewritten every batch; the changelog-checkpointing
                  fix's primary beneficiary).

Usage:  python scripts/stream_executor_loss.py [n_trials] [out.json] [tier]

``tier`` (default 10) selects the events decade: 10 → 2 M rows / 1 M
dedup keys, 100 → 20 M rows / 10 M dedup keys (the capacity tier of
STREAM_STATE_r10 — state reload after the kill then replays a 10 M-key
store).  At tier 100 only the dedup subject runs: the sessionize
memory sink holds ~9.4 M rows there (the harness cost measured in
SESSIONIZE_PROFILE_r11) and adds nothing to the loss axis.

Prints one JSON line:
{"clean": {...}, "trials": [...], "corrupt": 0, "connected_kills": N,
 "ok": true}
"""

from __future__ import annotations

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
N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
OUT = sys.argv[2] if len(sys.argv) > 2 else None
TIER = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ROCKSDB = ("org.apache.spark.sql.execution.streaming."
           "state.RocksDBStateStoreProvider")
FILES_PER_TRIGGER = 4


def run_stream(spark, sf_dir: str, qname: str, sink: str,
               marks: dict | None = None) -> tuple[str, int]:
    """One availableNow run of ``qname`` into a fresh memory sink and
    checkpoint; returns (canonical hash, rows) of the finalized sink.

    ``marks`` (if given) receives ``stream_end``: the wall-clock instant
    the stream finished — a kill that fires AFTER this cannot have been
    mid-micro-batch and must not count as connected (ADVICE r11)."""
    import streaming_state_scale as sss

    from end_end_data_pipeline__spark.session import bounded_stream_shuffle

    stream_df, mode, finalize = sss._queries(
        spark, sf_dir,
        reader_options={"maxFilesPerTrigger": str(FILES_PER_TRIGGER)},
    )[qname]()
    ckpt = tempfile.mkdtemp(prefix=f"stream_loss_{qname}_")
    try:
        with bounded_stream_shuffle(spark):
            q = (
                stream_df.writeStream.outputMode(mode)
                .format("memory")
                .queryName(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        if marks is not None:
            marks["stream_end"] = time.time()
        pdf = finalize(spark.table(sink)).toPandas()
        return sss._canon_hash(pdf)
    finally:
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> int:
    from pyspark.sql import SparkSession

    import streaming_state_scale as sss
    from executor_loss_stress import executor_pids

    sf_dir = sss.ensure_tier(TIER)
    spark = (
        SparkSession.builder.master(MASTER)
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        .config("spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled", "true")
        .getOrCreate()
    )
    me = os.getpid()
    app_id = spark.sparkContext.applicationId
    subjects = ["dedup"] if TIER >= 100 else ["dedup", "sessionize"]

    clean = {}
    for name in subjects:
        h, rows = run_stream(spark, sf_dir, name, f"clean_{name}")
        clean[name] = h
        print(f"clean {name}: {h} rows={rows}", flush=True)

    trials = []
    corrupt = 0
    connected = 0
    for t in range(N_TRIALS):
        name = subjects[t % len(subjects)]
        # stagger the kill across the ~5-batch stream's life
        delay = 3.0 + 2.5 * (t // len(subjects))
        killed: dict = {}

        def killer():
            time.sleep(delay)
            pids = executor_pids(me, app_id)
            if pids:
                victim = pids[t % len(pids)]
                try:
                    os.kill(victim, signal.SIGKILL)
                    killed["pid"] = victim
                    killed["time"] = time.time()
                except ProcessLookupError:
                    killed["pid"] = None

        th = threading.Thread(target=killer)
        th.start()
        outcome: dict = {"subject": name, "kill_delay_s": round(delay, 1)}
        marks: dict = {}
        t0 = time.time()
        try:
            h, rows = run_stream(spark, sf_dir, name, f"trial_{t}_{name}",
                                 marks=marks)
            if h == clean[name]:
                outcome["outcome"] = "identical"
            else:
                outcome["outcome"] = "CORRUPT"
                outcome["hash"] = h
                corrupt += 1
        except Exception as exc:  # noqa: BLE001 — loud failure is a PASS
            outcome["outcome"] = "failed_loudly"
            outcome["err"] = f"{type(exc).__name__}: {exc}"[:200]
        th.join()
        outcome["killed_pid"] = killed.get("pid")
        # A kill is CONNECTED only if it landed while the stream was
        # still running (kill time < stream end).  A missing stream_end
        # means the stream never finished cleanly — the kill was
        # necessarily in-flight.  Without this check a kill that fires
        # after the stream already completed would still count and the
        # anti-vacuous-pass gate could be satisfied vacuously
        # (ADVICE r11).
        in_flight = bool(
            killed.get("pid")
            and ("stream_end" not in marks
                 or killed["time"] < marks["stream_end"])
        )
        outcome["kill_in_flight"] = in_flight
        if in_flight:
            connected += 1
        outcome["sec"] = round(time.time() - t0, 2)
        trials.append(outcome)
        print(f"[{t + 1}/{N_TRIALS}] {outcome}", flush=True)
        # let the worker relaunch the executor before the next trial
        time.sleep(5)

    recovered = sum(
        1 for x in trials
        if x["outcome"] == "identical" and x["kill_in_flight"]
    )
    ok = corrupt == 0 and connected > 0 and recovered > 0
    result = {
        "master": MASTER, "sf": sf_dir, "provider": "RocksDB+changelog",
        "files_per_trigger": FILES_PER_TRIGGER, "clean": clean,
        "trials": trials, "corrupt": corrupt,
        "connected_kills": connected, "recovered_with_kill": recovered,
        "ok": ok,
    }
    print(json.dumps(result))
    if OUT:
        Path(OUT).write_text(json.dumps(result, indent=2))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
