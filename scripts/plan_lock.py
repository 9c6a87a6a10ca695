#!/usr/bin/env python3
"""Generate (or refresh) PLANS_LOCK.json: a physical-plan digest for
EVERY dry-plannable catalog query at sf0.001 — the regression lock
``tests/test_plan_lock.py`` compares against.

    python scripts/plan_lock.py            # rewrite the lock at HEAD

The digest counts plan features that should only change when someone
MEANS to change them: shuffle exchanges, join strategies, generators,
and top-k operators.  Fixture stats are pinned (read-only testdata)
and the digest is taken from the pre-execution plan, so it is stable
run-to-run on the pinned Spark version; any intentional plan change
(or a new query) is a one-command regeneration away.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LOCK_PATH = Path(__file__).resolve().parent.parent / "PLANS_LOCK.json"
SF_DIR = "/root/testdata/sf0.001"

# queries whose plan only exists at run time (streaming / side effects)
SKIP = {
    "stream_daily_event_agg",
    "stream_cdc_upsert_pipeline",
    "stream_static_enrichment",
    "stream_watermark_late_drop",
    "stream_stateful_user_stats",
    "gold_marts_build",
    "maintenance_truncate_reset",
    # banking_generator_fanout joined the lock in r06: since its
    # oracle-ization it is a pure synthesis + checksum-summary query
    # (no side effects), so its plan digest is stable and lockable.
}


def digest(plan: str) -> dict[str, int]:
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "shuffles": len(
            re.findall(
                r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
                plan,
            )
        ),
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "shuffled_hash_join": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop_join": plan.count("BroadcastNestedLoopJoin"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "generate": plan.count("Generate"),
        "file_scans": len(re.findall(r"FileScan \w+", plan)),
    }


def fixture_fingerprint() -> dict[str, int]:
    """Byte sizes of the sf0.001 fixture files.  The driver REGENERATES
    fixtures between rounds (r04 precedent: the events timestamp unit
    changed and broke 16 queries on byte-identical code); regenerated
    files change sizes, size-based join planning can flip, and the
    lock would then fail en masse through no code fault — so the test
    SKIPS (with a refresh instruction) when this fingerprint drifts
    instead of failing."""
    return {
        p.name: p.stat().st_size
        for p in sorted(Path(SF_DIR).glob("*.parquet"))
    }


def collect() -> dict[str, dict[str, int]]:
    from end_end_data_pipeline__spark.plans.catalog import load_all
    from end_end_data_pipeline__spark.session import get_spark

    spark = get_spark(
        "plan_lock", extra_conf={"spark.sql.shuffle.partitions": "8"}
    )
    out: dict[str, dict[str, int]] = {}
    for name, q in load_all().items():
        if name in SKIP:
            continue
        df = q.fn(spark, SF_DIR)
        out[name] = digest(df._jdf.queryExecution().executedPlan().toString())
    return out


if __name__ == "__main__":
    lock = {"__fixtures__": fixture_fingerprint(), **collect()}
    LOCK_PATH.write_text(json.dumps(lock, indent=1, sort_keys=True) + "\n")
    print(f"wrote {LOCK_PATH} ({len(lock) - 1} queries)")
