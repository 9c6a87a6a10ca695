#!/usr/bin/env python3
"""Attribute the sf1-gate 40 GiB driver-heap requirement
(VERDICT r10 task 4).

The sf1 sweeps have always been run with ``spark.driver.memory=40g+``
(ops note), but the requirement was never attributed: does the heap go
to the ENGINE (which at 100 TB would be a real driver-side scale
finding — the engine's contract is bounded driver collects only), or
to the gate HARNESS living in the same process (the DuckDB oracle +
the driver's ``toPandas``/sort comparison of full result sets —
benign: a real deployment doesn't ship its verification oracle)?

Design note: in ``local[n]`` the "driver" JVM hosts every executor
thread, so ``spark.driver.memory`` is really the WHOLE-CLUSTER heap —
shuffle/aggregation working memory that a 1000-executor cluster would
spread across executors.  The attribution question is therefore
twofold: (a) how much JVM heap does the engine query itself need
(executor working set, in-JVM), and (b) how much EXTRA the harness
comparison adds (result toPandas + pandas sort in the python process,
DuckDB oracle in the python process).

Method — three phases per query, each in a FRESH python subprocess so
peaks cannot bleed:

- ``engine``:  session pinned to a small heap (default 4g, local[8]),
  query -> noop sink (the bench measurement shape: full physical plan,
  zero driver transfer).  Records JVM heap-pool peaks + python RSS.
- ``gate``:    same session, the gate's actual comparison path:
  query -> toPandas() -> pandas sort (driver transfer of the FULL
  result).  Records the same meters; the delta vs ``engine`` is the
  harness's Spark-side + pandas-side cost.
- ``oracle``:  NO Spark at all — tests.oracle.duck_run of the query's
  DuckDB twin + the same pandas sort.  Records python RSS (DuckDB's
  working set lives here).

A phase that dies (OOM) records the failure and, for ``engine``, is
retried at 8g/16g/32g until it passes — the passing threshold IS the
engine's measured heap need at this scale and parallelism.

Output: DRIVER_HEAP_r11.json; the split lands in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # children run by absolute script path
SF1 = "/tmp/sf1-derived"

# Heavy sf1-gate queries chosen to span the failure surfaces: a huge
# result set (window_running_total_per_user: one row per event — the
# gate's toPandas moves ~10M rows), a wide dedup shuffle
# (dedup_replayed_events), a stateful-upsert window chain
# (cdc_roundtrip_latest_state), and the 3-way mart join with a 1.4M-row
# grouped result (gold_marts_build).
DEFAULT_QUERIES = [
    "window_running_total_per_user",
    "cdc_roundtrip_latest_state",
    "dedup_replayed_events",
    "gold_marts_build",
]


def _jvm_heap_peaks(spark) -> dict:
    """Per-pool peak heap usage (bytes) since JVM start — true peaks,
    no sampling thread needed."""
    mf = spark._jvm.java.lang.management.ManagementFactory
    peaks, total = {}, 0
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        pool = it.next()
        if pool.getType().toString() == "Heap memory":
            used = pool.getPeakUsage().getUsed()
            peaks[pool.getName()] = used
            total += used
    return {"jvm_heap_pool_peaks_bytes": peaks,
            "jvm_heap_peak_total_bytes": total}


def run_phase(phase: str, query: str, heap: str, cores: int) -> int:
    """Child-process body; prints one JSON line."""
    out: dict = {"phase": phase, "query": query, "heap": heap}
    t0 = time.time()
    if phase == "oracle":
        from end_end_data_pipeline__spark.plans.catalog import load_all

        from tests.oracle import duck_run

        q = load_all()[query]
        pdf = duck_run(q.oracle, SF1)
        # exists only to reproduce the gate's peak-memory profile (the
        # sorted-copy allocation); the value itself is unused — the
        # real comparison canonicalizes via tests.oracle._canon
        # (ADVICE r11: assign so the intent is unambiguous)
        _sorted = pdf.sort_values(list(pdf.columns))
        out["rows"] = len(pdf)
    else:
        from pyspark.sql import SparkSession

        from end_end_data_pipeline__spark.plans.catalog import load_all

        spark = (
            SparkSession.builder.master(f"local[{cores}]")
            .config("spark.driver.memory", heap)
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        df = load_all()[query].fn(spark, SF1)
        if phase == "engine":
            df.write.format("noop").mode("overwrite").save()
        else:  # gate: the comparison path driver_gate.py actually runs
            pdf = df.toPandas()
            # peak-memory stand-in only, value unused (see oracle phase)
            _sorted = pdf.sort_values(list(pdf.columns))
            out["rows"] = len(pdf)
        out.update(_jvm_heap_peaks(spark))
        spark.stop()
    out["wall_sec"] = round(time.time() - t0, 2)
    out["py_peak_rss_bytes"] = resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss * 1024
    print("PHASE_RESULT " + json.dumps(out), flush=True)
    return 0


def spawn(phase: str, query: str, heap: str, cores: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--phase", phase, "--query", query, "--heap", heap,
           "--cores", str(cores)]
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("PHASE_RESULT "):
            return json.loads(line[len("PHASE_RESULT "):])
    return {"phase": phase, "query": query, "heap": heap, "failed": True,
            "returncode": p.returncode, "stderr_tail": p.stderr[-2000:]}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--phase", choices=("engine", "gate", "oracle"))
    ap.add_argument("--query")
    ap.add_argument("--heap", default="4g")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--out", default="DRIVER_HEAP_r11.json")
    args = ap.parse_args()

    if args.child:
        return run_phase(args.phase, args.query, args.heap, args.cores)

    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run scripts/make_sf1_derived.py")

    report: dict = {"sf_dir": SF1, "cores": args.cores, "queries": {}}
    for query in args.queries:
        row: dict = {}
        # engine-only: escalate heap until it passes
        for heap in ("4g", "8g", "16g", "32g"):
            r = spawn("engine", query, heap, args.cores)
            row[f"engine_{heap}"] = r
            if not r.get("failed"):
                row["engine_min_passing_heap"] = heap
                break
        r = spawn("gate", query, "40g", args.cores)
        row["gate_40g"] = r
        r = spawn("oracle", query, "-", args.cores)
        row["oracle_no_spark"] = r
        report["queries"][query] = row
        eng = row.get(f"engine_{row.get('engine_min_passing_heap', '4g')}", {})
        print(f"{query}: engine passes at "
              f"{row.get('engine_min_passing_heap', 'NONE<=32g')} "
              f"(JVM peak {eng.get('jvm_heap_peak_total_bytes', 0)/2**30:.2f} GiB, "
              f"py RSS {eng.get('py_peak_rss_bytes', 0)/2**30:.2f} GiB); "
              f"gate JVM peak "
              f"{row['gate_40g'].get('jvm_heap_peak_total_bytes', 0)/2**30:.2f} GiB, "
              f"gate py RSS "
              f"{row['gate_40g'].get('py_peak_rss_bytes', 0)/2**30:.2f} GiB; "
              f"oracle py RSS "
              f"{row['oracle_no_spark'].get('py_peak_rss_bytes', 0)/2**30:.2f} GiB",
              flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
