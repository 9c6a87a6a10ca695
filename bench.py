#!/usr/bin/env python3
"""Benchmark harness: runs the catalog's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Execution is measured with the noop sink — the full physical plan runs
JVM-side (scan → shuffle → agg) with zero collect/serialization cost,
so the number reflects engine throughput, not driver transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from end_end_data_pipeline__spark.plans.catalog import load_all
from end_end_data_pipeline__spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")

    # Fixed-work context probe (VERDICT r09 task 6): a pinned synthetic
    # job that touches NO engine code and NO files — 4B xxhash64 rows
    # across 64 splits, pure whole-stage-codegen CPU.  Its wall-clock
    # depends only on machine state (CPU contention, thermal/page-cache
    # pressure), so round-over-round driver headline moves can be
    # attributed: probe flat + headline up = code/plan regression;
    # probe up proportionally = context elevation (the r07-r09 drift
    # pattern).  Median of 3 after one untimed warm run; quiet-box
    # reference ~0.6 s (measured at r10 calibration).
    def _context_probe() -> float:
        job = lambda: spark.range(0, 4_000_000_000, 1, 64).selectExpr(
            "sum(bit_count(xxhash64(id))) as s"
        ).collect()
        job()  # codegen warm-up, untimed
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            job()
            reps.append(time.perf_counter() - t0)
        return round(sorted(reps)[1], 3)

    # Probe-FIRST admission (VERDICT r10 task 2): an elevated context
    # must never again be the number of record.  Measure the probe
    # BEFORE committing to the run; while it reads above the admission
    # line, wait out the documented post-load decay and re-probe.  The
    # wait is bounded (~6 min) so an unattended driver run still
    # completes on a busy box — in that case probe_attempts in the
    # output records that admission failed and the reading must be
    # interpreted per the round-10 table.
    #
    # ADAPTIVE admission line (VERDICT r11 task 1): the original
    # constant (1.25x a 0.60 s quiet reference measured at r10
    # calibration) went vacuous when the box's ambient probe floor
    # shifted to 0.75-1.34 s for all of r11 — a gate that can never
    # admit discriminates nothing.  The line now tracks the box: 1.25x
    # the rolling minimum of committed probe_attempts over the most
    # recent bench artifacts (the box's demonstrated recent ambient
    # floor), floored at the calibration constant so a genuinely quiet
    # era restores the original line.  The reference used is reported
    # in the output so every reading stays self-describing.
    PROBE_ADMIT_FLOOR = 0.75  # 1.25 x the 0.60 s r10 quiet calibration

    def _admit_line() -> tuple[float, float | None]:
        """(admit_line_sec, rolling_min_or_None) from the 3 most recent
        committed BENCH_r*.json probe_attempts histories."""
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        hist: list[tuple[int, list[float]]] = []
        for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
            m_ = re.search(r"BENCH_r(\d+)\.json$", f)
            if not m_:
                continue
            try:
                with open(f) as fh:
                    d = json.load(fh)
            except Exception:
                continue
            # the driver wraps bench stdout: the JSON line lives inside
            # a "tail" text field — unwrap it if present
            if "probe_attempts" not in d and isinstance(d.get("tail"), str):
                i = d["tail"].rfind('{"metric"')
                if i >= 0:
                    try:
                        d = json.loads(d["tail"][i:])
                    except Exception:
                        continue
            vals = [v for v in d.get("probe_attempts", [])
                    if isinstance(v, (int, float))]
            if vals:
                hist.append((int(m_.group(1)), vals))
        recent = sorted(hist, key=lambda t: -t[0])[:3]
        if not recent:
            return PROBE_ADMIT_FLOOR, None
        rolling_min = min(v for _, vals in recent for v in vals)
        return max(PROBE_ADMIT_FLOOR, round(1.25 * rolling_min, 3)), rolling_min

    PROBE_ADMIT_SEC, probe_rolling_min = _admit_line()
    probe_attempts = [_context_probe()]
    while probe_attempts[-1] > PROBE_ADMIT_SEC and len(probe_attempts) < 6:
        # plateau early-exit: post-load elevation DECAYS between
        # probes (the documented r10 pattern); three consecutive
        # readings within 10% mean the box's ambient baseline is
        # simply above the admission line today, and more waiting
        # cannot improve it — proceed, self-labelled unadmitted.
        if (len(probe_attempts) >= 3
                and max(probe_attempts[-3:])
                <= 1.10 * min(probe_attempts[-3:])):
            break
        time.sleep(60)
        probe_attempts.append(_context_probe())
    context_probe_sec = probe_attempts[-1]
    queries = {n: q for n, q in load_all().items() if q.bench}

    # Fixed measurement order (the BENCH_r01 sequence) so per-query
    # ratchet numbers stay comparable round-to-round: catalog priority
    # reorders presentation, and a query's position in the session
    # (cold vs warm JVM) moves its wall-clock by 1.5-2x.  New bench
    # entries append after the pinned set, sorted by name.
    _ORDER = (
        "flagship_monthly_segment_volume",
        "join_geo_rollup",
        "join_order_lineitem_detail",
        "agg_pricing_summary",
        "window_running_total_per_user",
        "asof_click_before_purchase",
        "cdc_roundtrip_latest_state",
        "dedup_ngram_jaccard_pairs",
        "dedup_minhash_lsh_pairs",
        "embedding_cosine_topk",
        "tpch_q3_shipping_priority",
        "tpch_q18_large_volume_customers",
    )
    rank = {n: i for i, n in enumerate(_ORDER)}
    ordered = sorted(queries, key=lambda n: (rank.get(n, len(rank)), n))
    # the ratchet contract is the pinned 12; round-5 bench additions
    # (q9, the versioned merge, PII redaction) report as extra columns
    # and do NOT move headline_total_sec
    pinned = [n for n in ordered if n in rank]
    extras = [n for n in ordered if n not in rank]

    # Bench-only extras measured OUTSIDE the catalog: the engine-default
    # xxhash64 MinHash-LSH path.  The catalog/headline query runs the
    # md5 hash family so DuckDB can bit-replicate the whole pipeline
    # (the verifiability contract); users run the xxhash64 default, so
    # the bench reports that path too.  It is not a catalog query —
    # xxhash64 has no DuckDB twin, and a rows-only catalog entry would
    # weaken the 194/194 oracle-backed surface for a measurement we can
    # take directly.
    def _minhash_engine_default(spark, sfd):
        from end_end_data_pipeline__spark.operators import dedup
        from end_end_data_pipeline__spark.sources import lake

        docs = lake.load_table(spark, "documents", sfd)
        return dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, num_hashes=32, bands=8,
            verify_threshold=0.5, hash_family="xxhash64",
        )

    extra_fns = {"dedup_minhash_lsh_engine": _minhash_engine_default}
    extras = [*extras, *extra_fns]

    def run_query(name: str, sfd: str):
        fn = extra_fns.get(name) or queries[name].fn
        return fn(spark, sfd)

    # JVM/codegen warmup on the smallest fixture (not timed): run every
    # bench query once so codegen/broadcast warmup cost lands here, not
    # in whichever query happens to run first.
    for name in [*ordered, *extra_fns]:
        run_query(name, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in [*ordered, *extra_fns]:
        t0 = time.perf_counter()
        run_query(name, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings[n] for n in pinned), 3),
        "unit": "sec",
        "queries": timings,
        "extras_total_sec": round(sum(timings[n] for n in extras), 3),
        "context_probe_sec": context_probe_sec,
        "context_probe_end_sec": _context_probe(),
        "probe_attempts": probe_attempts,
        "probe_admit_line_sec": PROBE_ADMIT_SEC,
        "probe_rolling_min_sec": probe_rolling_min,
        "probe_admitted": context_probe_sec <= PROBE_ADMIT_SEC,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
