#!/usr/bin/env python3
"""Streaming state at scale under RocksDB (VERDICT r09 task 3).

Every prior streaming-state claim was proven at sf0.01 toy state
(INVARIANCE_r09_rocksdb: provider plumb-through + correctness, ~10^2
state keys).  This study runs the three heaviest stateful shapes
against DERIVED 10x/100x events tiers (1M/10M events; the dedup shape
keys on event_id, so its state reaches 1M/10M keys — the "millions of
state keys" regime) under BOTH state-store providers, and records what
a capacity plan needs:

- per-query wall clock + micro-batch count + per-batch durations
  (``maxFilesPerTrigger`` forces a real multi-batch run, so state is
  loaded/committed per batch, not once),
- state rows (``numRowsTotal``) and state-store bytes — in-memory
  (``memoryUsedBytes``, HDFSBackedStateStoreProvider) vs on-disk
  (``stateOnCurrentVersionSizeBytes`` / RocksDB SST totals +
  checkpoint-dir ``du``),
- a DuckDB oracle MATCH per provider per tier (the same
  ``tests.oracle`` canonicalization the driver gate uses) plus an
  HDFS-vs-RocksDB cross-provider hash match,
- a kill/resume replay: the dedup query is stopped mid-run after >= 2
  committed micro-batches and restarted from the SAME checkpoint; the
  resumed result must hash-match the uninterrupted run (complete
  output mode, so the sink is state-derived and restart-safe).

Queries (mirroring the catalog queries' semantics, unfiltered so state
actually scales):

- ``user_stats``   — applyInPandasWithState running per-user count+max
                     (catalog ``stream_stateful_user_stats``; state =
                     one tuple per user: 15k/150k keys).
- ``dedup``        — doubled stream -> dropDuplicatesWithinWatermark on
                     event_id -> complete-mode count (catalog
                     ``stream_dedup_within_watermark`` WITHOUT the
                     user_id<50 filter; state = 1M/10M keys).
- ``sessionize``   — applyInPandasWithState 30-min-gap session machine
                     (catalog ``stream_custom_sessionize``; state = one
                     open session per user).

Usage:
    python scripts/streaming_state_scale.py [--tiers 10 100]
        [--shuffle-partitions 32] [--out STREAM_STATE.json]

    --tiers 1000 adds the third decade (100M events / 100M dedup state
    keys): dedup-only, RocksDB-only (the HDFS store projects ~31 GB of
    executor heap there — measured 3.12 GB at 10M keys).

Both tiers derive time-ordered events-only decades into
/tmp/events-stream-{10,100}x (see ensure_tier; other tables symlink to
/tmp/sf1-derived — run scripts/make_sf1_derived.py first — so the
DuckDB oracle can register every view).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/tmp/sf1-derived"
OFF = 1_000_000_000

HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

ORACLES = {
    "user_stats": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               epoch_ms(MAX(ts)) AS last_event_ms
        FROM events GROUP BY 1
    """,
    "dedup": """
        SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_after_dedup
        FROM events
    """,
    "sessionize": """
        WITH e AS (
            SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
        ),
        marked AS (
            SELECT user_id, ts_ms,
                   CASE WHEN lag(ts_ms) OVER w IS NULL
                          OR ts_ms - lag(ts_ms) OVER w > 1800000
                        THEN 1 ELSE 0 END AS is_start
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
        ),
        sess AS (
            SELECT user_id, ts_ms,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_ms
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ),
        agg AS (
            SELECT user_id, sid,
                   MIN(ts_ms) AS session_start_ms,
                   MAX(ts_ms) AS session_end_ms,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY sid DESC) AS rn
            FROM sess GROUP BY user_id, sid
        )
        SELECT user_id, session_start_ms, session_end_ms, n_events
        FROM agg WHERE rn > 1
    """,
}


def ensure_tier(copies: int) -> str:
    """Time-ordered events decade at ``copies`` x sf0.1 (1M/10M events),
    derived in /tmp/events-stream-{copies}x.

    A real stream arrives roughly time-ordered; the make_sf1_derived
    fixture interleaves the full 30-day range into every part file, so
    a multi-batch replay of it runs event time BACKWARDS between
    batches — the watermark then (correctly) drops most of batches 2+
    as late, and the dedup query measures watermark lateness policy,
    not state scale (found by this script's first smoke run).  Here the
    derived decade is repartitionByRange(ts)-sorted so file k's times
    precede file k+1's, and part-file mtimes are pinned strictly
    increasing so the file source lists them in time order.  Other
    tables symlink to the 10x fixture so tests.oracle.duck_run can
    still register all ten views."""
    out_dir = f"/tmp/events-stream-{copies}x"
    events = os.path.join(out_dir, "events.parquet")
    if (os.path.isdir(events)
            and not os.path.exists(os.path.join(events, "_SUCCESS"))):
        # interrupted derivation: a partial part-file set would make
        # stream and oracle agree on a TRUNCATED corpus — every facet
        # green, every recorded capacity number silently wrong
        shutil.rmtree(out_dir)
    if not os.path.isdir(events):
        from pyspark.sql import functions as F

        from end_end_data_pipeline__spark.session import get_spark
        from end_end_data_pipeline__spark.sources import lake

        os.makedirs(out_dir, exist_ok=True)
        spark = get_spark("events-tier")
        spark.conf.set("spark.sql.parquet.outputTimestampType",
                       "TIMESTAMP_MICROS")
        base = lake.load_table(spark, "events", "/root/testdata/sf0.1")
        idx = spark.range(copies).withColumnRenamed("id", "__copy")
        n_files = {10: 20, 100: 40}.get(copies, 80)
        (
            base.crossJoin(F.broadcast(idx))
            .select(
                (F.col("event_id") + F.col("__copy") * OFF).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("__copy") * OFF).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts")
            .write.parquet(events)
        )
        print("derived", out_dir, flush=True)
    # sibling-table symlinks OUTSIDE the derivation branch (ADVICE r10):
    # a death between events._SUCCESS and the symlink loop would
    # otherwise skip derivation forever while duck_run FileNotFoundErrors
    # until the tier dir is hand-deleted; the exists() guard keeps this
    # idempotent
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF1, f"{t}.parquet"), link)
    # pin mtimes in range order (part-file name order == range order)
    # on every run: the file source sorts its listing by mtime
    parts = sorted(f for f in os.listdir(events) if f.endswith(".parquet"))
    t0 = int(time.time()) - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(events, f), (t0 + i * 10, t0 + i * 10))
    return out_dir


def _queries(spark, sf_dir: str, reader_options: dict | None = None):
    """(name -> (streaming DataFrame builder, output mode, finalizer))."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import lake
    from end_end_data_pipeline__spark.streaming.stateful import (
        running_user_stats,
        sessionize,
    )

    def base():
        return lake.stream_events(
            spark, sf_dir, reader_options=reader_options
        ).select(
            "user_id",
            "event_id",
            "ts",
            F.unix_millis(F.col("ts")).alias("ts_ms"),
        )

    def user_stats():
        stats = running_user_stats(base().select("user_id", "ts_ms"))
        # update mode: one emission per user per batch; final state =
        # row-wise max per user (totals are monotone)
        fin = lambda t: t.groupBy("user_id").agg(  # noqa: E731
            F.max("n_events").alias("n_events"),
            F.max("last_event_ms").alias("last_event_ms"),
        )
        return stats, "update", fin

    def dedup():
        s = base().select("event_id", "ts")
        doubled = s.unionByName(s)  # at-least-once replay
        # retention-wide watermark (events span 30 days x both legs in
        # lockstep): no id is ever evicted, so state reaches the full
        # 1M/10M-key capacity — the measurement this study exists for.
        # The 1-day production setting bounds state to ids/day; the
        # catalog query proves its semantics, this proves capacity.
        agg = (
            doubled.withWatermark("ts", "400 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .groupBy()
            .agg(F.count("*").alias("n_after_dedup"))
        )
        return agg, "complete", (lambda t: t)

    def sess():
        sessions = sessionize(
            base().select("user_id", "ts_ms"), gap_ms=1_800_000
        )
        return sessions, "append", (lambda t: t)

    return {"user_stats": user_stats, "dedup": dedup, "sessionize": sess}


def _canon_hash(pdf) -> tuple[str, int]:
    from tests.oracle import _canon

    canon = _canon(pdf)
    h = hashlib.md5(repr(canon).encode()).hexdigest()
    return h, len(canon)


def _du(path: str) -> int:
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return int(out.stdout.split()[0]) if out.returncode == 0 else -1


def run_one(spark, sf_dir: str, qname: str, provider: str,
            files_per_trigger: int, kill_resume: bool = False) -> dict:
    from end_end_data_pipeline__spark.session import bounded_stream_shuffle

    builder = _queries(
        spark, sf_dir,
        reader_options={"maxFilesPerTrigger": str(files_per_trigger)},
    )[qname]
    stream_df, mode, finalize = builder()
    ckpt = tempfile.mkdtemp(prefix=f"state_scale_{qname}_")
    sink = f"state_scale_{qname}_{abs(hash((sf_dir, provider, kill_resume))) % 10**8}"
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    res: dict = {"provider": provider.rsplit(".", 1)[-1], "query": qname}
    t0 = time.time()
    batches: list[float] = []
    state_rows = state_mem = 0
    interrupted = False
    try:
        with bounded_stream_shuffle(spark):
            for attempt in range(2):
                try:  # restart reuses the queryName: clear the old view
                    spark.catalog.dropTempView(sink)
                except Exception:
                    pass
                q = (
                    stream_df.writeStream.outputMode(mode)
                    .format("memory")
                    .queryName(sink)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                if kill_resume and attempt == 0:
                    # wait for >= 2 committed micro-batches, then kill
                    while True:
                        # committed DATA batches only (> 0): a no-data
                        # finalization batch must not count toward the
                        # >=2-committed-batches precondition the
                        # resume evidence claims
                        progress = [p for p in q.recentProgress
                                    if p.get("numInputRows", 0) > 0]
                        if len(progress) >= 2 or not q.isActive:
                            break
                        time.sleep(0.5)
                    if q.isActive:
                        q.stop()
                        q.awaitTermination()
                        interrupted = True
                        # memory sink of the resumed run starts empty;
                        # only complete-mode output is restart-safe
                        # (RuntimeError, not assert: survives python -O —
                        # ADVICE r10, matching sf1_dedup_gate.py)
                        if mode != "complete":
                            raise RuntimeError(
                                "kill_resume needs complete mode; a "
                                f"{mode!r} resume would report a partial "
                                "memory-sink result as a match"
                            )
                        continue
                q.awaitTermination()
                for p in q.recentProgress:
                    dur = p.get("durationMs", {}).get("triggerExecution")
                    if dur is not None and p.get("numInputRows", 0) > 0:
                        batches.append(dur / 1000.0)
                    for so in p.get("stateOperators", []):
                        state_rows = max(state_rows, so.get("numRowsTotal", 0))
                        state_mem = max(
                            state_mem,
                            so.get("memoryUsedBytes", 0),
                            so.get("stateOnCurrentVersionSizeBytes", 0),
                        )
                break
        pdf = finalize(spark.table(sink)).toPandas()
        res["hash"], res["rows"] = _canon_hash(pdf)
        res["wall_sec"] = round(time.time() - t0, 2)
        res["n_batches"] = len(batches)
        res["batch_sec"] = [round(b, 2) for b in batches]
        res["state_rows"] = state_rows
        res["state_store_bytes_reported"] = state_mem
        res["checkpoint_state_bytes"] = _du(os.path.join(ckpt, "state"))
        res["interrupted_then_resumed"] = interrupted
        res["pdf"] = pdf  # caller compares against the oracle, then drops
    finally:
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return res


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiers", nargs="*", type=int, default=[10, 100])
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=None,
                    help="files per micro-batch (default: n_files // 5)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from end_end_data_pipeline__spark.session import get_spark
    from tests.oracle import duck_run

    spark = get_spark("streaming-state-scale")
    report: dict = {"tiers": {}}
    ok = True
    for tier in args.tiers:
        if tier not in (10, 100, 1000):
            raise SystemExit(f"unsupported tier {tier}")
        sf_dir = ensure_tier(tier)
        n_files = len([f for f in os.listdir(
            os.path.join(sf_dir, "events.parquet")) if f.endswith(".parquet")])
        fpt = args.files_per_trigger or max(1, n_files // 5)
        tier_out: dict = {"sf_dir": sf_dir, "n_part_files": n_files,
                          "files_per_trigger": fpt, "queries": {}}
        if tier >= 1000:
            # third decade: 100M state keys.  Dedup-only (the Python
            # state machines are row-bound, not store-bound — measured
            # at the decades below) and RocksDB-only: the in-memory
            # HDFS store measured 3.12 GB at 10M keys, so ~31 GB at
            # 100M exceeds any sane executor heap — that projection IS
            # the finding, recorded here instead of an OOM.
            queries_for_tier = ("dedup",)
            providers_for_tier = (ROCKS,)
            tier_out["hdfs_skipped_reason"] = (
                "projected ~31 GB heap state at 100M keys "
                "(3.12 GB measured at 10M) — RocksDB is the only "
                "viable provider at this decade")
        else:
            queries_for_tier = ("user_stats", "dedup", "sessionize")
            providers_for_tier = (HDFS, ROCKS)
        for qname in queries_for_tier:
            oracle_pdf = duck_run(ORACLES[qname], sf_dir)
            o_hash, o_rows = _canon_hash(oracle_pdf)
            row: dict = {"oracle_rows": o_rows}
            for provider in providers_for_tier:
                r = run_one(spark, sf_dir, qname, provider, fpt)
                pdf = r.pop("pdf")
                h, _ = _canon_hash(pdf)
                r["oracle_match"] = bool(h == o_hash)
                ok &= r["oracle_match"]
                row[r["provider"]] = r
                print(f"[{tier}x] {qname} {r['provider']}: "
                      f"{'MATCH' if r['oracle_match'] else 'MISMATCH'} "
                      f"rows={r['rows']} state_rows={r['state_rows']} "
                      f"wall={r['wall_sec']}s batches={r['n_batches']}",
                      flush=True)
            if len(providers_for_tier) == 2:
                row["providers_agree"] = bool(
                    row["HDFSBackedStateStoreProvider"]["hash"]
                    == row["RocksDBStateStoreProvider"]["hash"]
                )
                ok &= row["providers_agree"]
            tier_out["queries"][qname] = row
        # kill/resume replay on the millions-of-keys query, RocksDB
        r = run_one(spark, sf_dir, "dedup", ROCKS,
                    max(1, fpt // 2), kill_resume=True)
        pdf = r.pop("pdf")
        h, _ = _canon_hash(pdf)
        r["resume_matches_uninterrupted"] = bool(
            h == tier_out["queries"]["dedup"]["RocksDBStateStoreProvider"]["hash"]
        )
        ok &= r["resume_matches_uninterrupted"] and r["interrupted_then_resumed"]
        tier_out["kill_resume_dedup_rocksdb"] = r
        print(f"[{tier}x] kill/resume dedup rocksdb: interrupted="
              f"{r['interrupted_then_resumed']} resume_match="
              f"{r['resume_matches_uninterrupted']}", flush=True)
        report["tiers"][f"{tier}x"] = tier_out
    report["all_pass"] = bool(ok)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
