#!/usr/bin/env python3
"""Explain the sessionize-under-RocksDB anomaly (VERDICT r10 task 3).

STREAM_STATE_r10.json's 100x tier showed the ONE stateful shape where
the scale provider loses: sessionize (applyInPandasWithState, 150k
string-state keys) read 250.4 s wall under RocksDB vs 150.0 s HDFS —
a 1.67x penalty where dedup pays ~1.5x and user_stats is parity.  Two
things in that number were never decomposed:

1. ``run_one``'s wall_sec is stamped AFTER ``finalize(...).toPandas()``
   — at 100x the sessionize memory sink holds ~9.4M rows, so the wall
   includes a multi-second driver-side pandas conversion that has
   nothing to do with the state store (batch_sec summed to only
   101.7 s of the 250.4 s RocksDB wall, 54.9 s of the 150.0 s HDFS
   wall).
2. The RocksDB run's per-batch times spiked mid-run (10.1, 12.3,
   **36.6**, **29.3**, 13.4 s) — the signature of a store-side
   stall (flush/compaction/snapshot), not of steady per-row cost.

This script re-runs the 100x sessionize under instrumented configs and
attributes both effects, then measures the candidate fixes:

- ``hdfs``              — reference provider.
- ``rocksdb_default``   — the r10 configuration (x2: run-to-run
                          variance check; the spikes may be noise).
- ``rocksdb_changelog`` — RocksDB + changelog checkpointing
  (``...rocksdb.changelogCheckpointing.enabled=true``): uploads the
  per-batch delta instead of a full SST snapshot every commit — the
  first-line fix if commit/checkpoint latency dominates.
- ``rocksdb_bounded``   — RocksDB + ``boundedMemoryUsage=true`` with a
  2 GiB cap: rules memory-pressure-driven flush storms in or out.

Per config it records the per-batch ``durationMs`` breakdown
(triggerExecution/addBatch/...), the state operator's
commit/update/removal times, every nonzero RocksDB custom metric
(flush/compaction/checkpoint latencies, bytes copied, ...), and —
separately — the stream wall vs the finalize (memory-sink -> pandas +
hash) wall.  All five results must hash-agree with each other and with
the DuckDB oracle; a tuning knob that changed the answer would be
worthless.

Output: SESSIONIZE_PROFILE_r11.json (repo root).  Findings land in
BASELINE.md's streaming-state section as conditioned provider
guidance.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import streaming_state_scale as sss  # noqa: E402  (sibling script)

HDFS = sss.HDFS
ROCKS = sss.ROCKS

_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

# Since the r11 fix, ``session.get_spark`` pins changelog checkpointing
# ON at the session level (session.py) — so the "default" control arms
# must now pin it OFF explicitly or they silently measure the same
# configuration as the changelog arm and the A/B that attributed the
# fsync-storm anomaly can no longer reproduce its baseline (ADVICE r11).
CONFIGS: list[tuple[str, str, dict[str, str]]] = [
    ("hdfs", HDFS, {}),
    ("rocksdb_default", ROCKS, {_CHANGELOG_KEY: "false"}),
    ("rocksdb_default_rep2", ROCKS, {_CHANGELOG_KEY: "false"}),
    ("rocksdb_changelog", ROCKS, {_CHANGELOG_KEY: "true"}),
    ("rocksdb_bounded", ROCKS, {
        _CHANGELOG_KEY: "false",
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "2000",
    }),
]

_DUR_KEYS = ("triggerExecution", "addBatch", "getBatch", "latestOffset",
             "queryPlanning", "walCommit", "commitOffsets")


def profile_one(spark, sf_dir: str, files_per_trigger: int,
                provider: str, extra_conf: dict[str, str]) -> dict:
    from end_end_data_pipeline__spark.session import bounded_stream_shuffle

    builder = sss._queries(
        spark, sf_dir,
        reader_options={"maxFilesPerTrigger": str(files_per_trigger)},
    )["sessionize"]
    stream_df, mode, finalize = builder()
    ckpt = tempfile.mkdtemp(prefix="sess_profile_")
    sink = f"sess_profile_{abs(hash((provider, tuple(sorted(extra_conf))))) % 10**8}"
    # Save the pre-arm value of every conf this arm touches so the
    # finally block can RESTORE (not just unset) it — unconditional
    # unset would strip session-pinned defaults (e.g. the changelog
    # conf get_spark sets) and make later arms depend on CONFIGS
    # ordering (ADVICE r11).
    touched = ["spark.sql.streaming.stateStore.providerClass", *extra_conf]
    prior: dict[str, str | None] = {}
    for k in touched:
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    for k, v in extra_conf.items():
        spark.conf.set(k, v)
    res: dict = {"provider": provider.rsplit(".", 1)[-1],
                 "extra_conf": extra_conf}
    try:
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass
        t0 = time.time()
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
        res["stream_wall_sec"] = round(time.time() - t0, 2)
        batches = []
        for p in q.recentProgress:
            row = {"numInputRows": p.get("numInputRows", 0)}
            dur = p.get("durationMs", {})
            for k in _DUR_KEYS:
                if k in dur:
                    row[k + "_ms"] = dur[k]
            for so in p.get("stateOperators", []):
                row["state_commit_ms"] = so.get("commitTimeMs")
                row["state_updates_ms"] = so.get("allUpdatesTimeMs")
                row["state_removals_ms"] = so.get("allRemovalsTimeMs")
                row["state_rows_total"] = so.get("numRowsTotal")
                row["state_memory_bytes"] = so.get("memoryUsedBytes")
                cm = {k: v for k, v in
                      (so.get("customMetrics") or {}).items() if v}
                if cm:
                    row["custom"] = cm
            batches.append(row)
        res["batches"] = batches
        t1 = time.time()
        pdf = finalize(spark.table(sink)).toPandas()
        res["finalize_wall_sec"] = round(time.time() - t1, 2)
        t2 = time.time()
        canon = sss._canon_hash(pdf)
        res["hash"], res["rows"] = canon
        res["hash_wall_sec"] = round(time.time() - t2, 2)
        res["total_wall_sec"] = round(time.time() - t0, 2)
        res["checkpoint_state_bytes"] = sss._du(os.path.join(ckpt, "state"))
    finally:
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
        for k in touched:
            if prior[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prior[k])
    return res


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tier", type=int, default=100)
    ap.add_argument("--out", default="SESSIONIZE_PROFILE_r11.json")
    args = ap.parse_args()

    from end_end_data_pipeline__spark.session import get_spark
    from tests.oracle import duck_run

    spark = get_spark("sessionize-profile")
    sf_dir = sss.ensure_tier(args.tier)
    n_files = len([f for f in os.listdir(os.path.join(sf_dir, "events.parquet"))
                   if f.endswith(".parquet")])
    fpt = max(1, n_files // 5)

    # untimed warm-up at the 10x tier: codegen + python worker pools
    warm_dir = sss.ensure_tier(10)
    profile_one(spark, warm_dir, 20, HDFS, {})

    oracle_pdf = duck_run(sss.ORACLES["sessionize"], sf_dir)
    o_hash, o_rows = sss._canon_hash(oracle_pdf)

    report: dict = {"tier": f"{args.tier}x", "sf_dir": sf_dir,
                    "files_per_trigger": fpt, "oracle_rows": o_rows,
                    "configs": {}}
    ok = True
    for name, provider, extra in CONFIGS:
        r = profile_one(spark, sf_dir, fpt, provider, extra)
        r["oracle_match"] = bool(r["hash"] == o_hash)
        ok &= r["oracle_match"]
        report["configs"][name] = r
        data = [b for b in r["batches"] if b["numInputRows"]]
        print(f"{name}: stream={r['stream_wall_sec']}s "
              f"finalize={r['finalize_wall_sec']}s "
              f"hash={r['hash_wall_sec']}s "
              f"batches={[round(b['triggerExecution_ms']/1000.0, 2) for b in data]} "
              f"{'MATCH' if r['oracle_match'] else 'MISMATCH'}", flush=True)
    report["all_match"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
