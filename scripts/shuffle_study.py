#!/usr/bin/env python3
"""Shuffle-partition sensitivity study: the bench headline 12 at
``spark.sql.shuffle.partitions`` ∈ {8, 32, 128} on sf0.1, one fresh
SparkSession per setting (static conf).  Validates the session
factory's cores-sized default and documents what AQE coalescing does
to an oversized static number — the knob BASELINE.md's scale section
points at.

    python scripts/shuffle_study.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--settings", default="8,32,128")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from end_end_data_pipeline__spark.session import get_spark

    names = None
    results: dict[str, dict[str, float]] = {}
    for setting in [s.strip() for s in args.settings.split(",")]:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = get_spark(
            f"shuffle_study_{setting}",
            extra_conf={"spark.sql.shuffle.partitions": setting},
        )
        queries = {n: q for n, q in load_all().items() if q.bench}
        if names is None:
            # pinned-12 ratchet order = registry order of bench queries
            names = list(queries)[:12]
        # warm codegen/broadcast machinery outside the timings
        queries[names[0]].fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        col = {}
        for n in names:
            t = time.time()
            queries[n].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            col[n] = time.time() - t
        results[setting] = col
        spark.stop()

    settings = list(results)
    print("| query | " + " | ".join(f"p={s} (s)" for s in settings) + " |")
    print("|---|" + "---|" * len(settings))
    for n in names:
        cells = " | ".join(f"{results[s][n]:.2f}" for s in settings)
        print(f"| {n} | {cells} |")
    totals = " | ".join(
        f"{sum(results[s].values()):.2f}" for s in settings
    )
    print(f"| **total** | {totals} |")


if __name__ == "__main__":
    main()
