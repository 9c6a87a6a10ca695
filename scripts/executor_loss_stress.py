#!/usr/bin/env python3
"""Executor-LOSS determinism stress (round 8): SIGKILL a live executor
JVM mid-job under a multi-JVM master and verify the engine NEVER
returns a silently different result — every trial must end in one of
exactly two states:

* ``identical`` — Spark recovered (lineage / shuffle-stage retry on a
  relaunched executor) and the result hash equals the clean run's;
* ``failed_loudly`` — the job raised (the documented outcome when an
  executor death takes non-reliable ``localCheckpoint`` blocks with
  it — ``operators/scale.py`` ``_range_parted_with_offsets`` truncates
  lineage on purpose and Spark cannot recompute lost blocks, see the
  r07-advice trade note in ``grouped_global_rank``).

Any third state — a job that SUCCEEDS with a different hash — is
corruption and fails this script.  This is the failure mode that
matters at 1000 executors, where executor churn is routine: wrong
answers are unacceptable; loud retry-or-fail is the contract.

Two subjects per trial batch:

* ``lineage`` — a pure-DataFrame catalog-shaped aggregation (no
  checkpoint): Spark must ALWAYS recover this one (shuffle files died
  with the executor → stage retry recomputes), so its expected outcome
  is ``identical`` in every trial.
* ``checkpointed`` — ``ordered_prefix_sums`` over the same rows (pins
  partition contents via eager localCheckpoint): expected outcome is
  ``identical`` when the killed executor held no still-needed blocks,
  ``failed_loudly`` when it did.

Usage:  python scripts/executor_loss_stress.py [n_trials] [out.json]

Prints one JSON line:
{"clean": {...}, "trials": [...], "corrupt": 0, "ok": true}
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"
MASTER = "local-cluster[2,4,3072]"
# argv parsing only when run as a script: sibling harnesses
# (stream_executor_loss, stream_soak) import executor_pids from this
# module under their OWN argv conventions
if __name__ == "__main__":
    N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    OUT = sys.argv[2] if len(sys.argv) > 2 else None


def executor_pids(driver_pid: int, app_id: str) -> list[int]:
    """Executor JVMs of THIS app only: CoarseGrainedExecutorBackend
    processes whose cmdline carries this driver's ``--app-id`` (the
    backend is launched with it), so a concurrently-running Spark app
    on the same host can never be hit by the SIGKILL (ADVICE r08)."""
    out = subprocess.run(
        ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*{app_id}"],
        capture_output=True, text=True,
    ).stdout.split()
    return [int(p) for p in out if int(p) != driver_pid]


def df_hash(df) -> str:
    rows = sorted(repr(tuple(r)) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def subjects(spark):
    """(name -> thunk returning a DataFrame) — built fresh per trial so
    no cached partitions survive from the previous one."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.operators.scale import (
        ordered_prefix_sums,
    )
    from end_end_data_pipeline__spark.sources import lake

    def lineage():
        li = lake.load_table(spark, "lineitem", SF_DIR)
        return (
            li.groupBy("l_suppkey")
            .agg(
                F.sum((F.col("l_extendedprice") * 100).cast("long")).alias(
                    "cents"
                ),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def checkpointed():
        li = lake.load_table(spark, "lineitem", SF_DIR).select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        cum = ordered_prefix_sums(li, ["k"], ["q"], n_parts=16)
        return cum.groupBy((F.col("k") % 97).alias("g")).agg(
            F.sum("__cum_q").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def lazy_ckpt_dedup():
        # r13 (ADVICE r12): the dedup/interval queries now hold LAZY
        # executor-local localCheckpoints (shingle sets, hot frame,
        # per-doc info) — exercise one end-to-end under executor loss.
        # Expected outcomes: identical (blocks survived / recomputed
        # before materialization) or failed_loudly (lost materialized
        # blocks cannot recompute) — never a silent wrong answer.
        from end_end_data_pipeline__spark.operators import dedup

        docs = lake.load_table(spark, "documents", SF_DIR)
        return dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, num_hashes=32, bands=8,
            verify_threshold=0.5, hash_family="xxhash64",
        )

    return {
        "lineage": lineage,
        "checkpointed": checkpointed,
        "lazy_ckpt_dedup": lazy_ckpt_dedup,
    }


def main() -> int:
    from pyspark.sql import SparkSession

    repo = str(Path(__file__).resolve().parent.parent)
    spark = (
        SparkSession.builder.master(MASTER)
        .config("spark.executorEnv.PYTHONPATH", repo)
        .config("spark.sql.shuffle.partitions", "16")
        # default maxFailures=4: the kill costs one attempt per task it
        # takes down; recovery must fit in the remaining three
        .getOrCreate()
    )
    me = os.getpid()
    app_id = spark.sparkContext.applicationId
    subs = subjects(spark)

    clean = {name: df_hash(mk()) for name, mk in subs.items()}
    print(f"clean hashes: {clean}", flush=True)

    trials = []
    corrupt = 0
    for t in range(N_TRIALS):
        names = list(subs)
        name = names[t % len(names)]
        # stagger the kill through the job's life: 0.2s..1.6s after start
        delay = 0.2 + 0.2 * t
        killed: dict = {}

        def killer():
            time.sleep(delay)
            pids = executor_pids(me, app_id)
            if pids:
                victim = pids[t % len(pids)]
                try:
                    os.kill(victim, signal.SIGKILL)
                    killed["pid"] = victim
                except ProcessLookupError:
                    killed["pid"] = None

        th = threading.Thread(target=killer)
        th.start()
        outcome: dict = {"subject": name, "kill_delay_s": round(delay, 1)}
        t0 = time.time()
        try:
            h = df_hash(subs[name]())
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
        outcome["sec"] = round(time.time() - t0, 2)
        trials.append(outcome)
        print(f"[{t + 1}/{N_TRIALS}] {outcome}", flush=True)
        # give the worker a moment to relaunch the executor
        time.sleep(3)

    # the lineage subject must additionally have RECOVERED at least once
    # (a suite where every trial failed loudly would prove nothing about
    # recompute correctness)
    recovered = sum(
        1 for x in trials
        if x["subject"] == "lineage" and x["outcome"] == "identical"
    )
    ok = corrupt == 0 and recovered > 0
    result = {
        "master": MASTER, "sf": SF_DIR, "clean": clean, "trials": trials,
        "corrupt": corrupt, "lineage_recoveries": recovered, "ok": ok,
    }
    print(json.dumps(result))
    if OUT:
        Path(OUT).write_text(json.dumps(result, indent=2))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
