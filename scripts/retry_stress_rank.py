#!/usr/bin/env python3
"""Task-retry determinism for the range-partitioned rank family
(round 8 follow-up to ``retry_stress.py``): ``operators/scale.py``'s
``ordered_prefix_sums`` / ``global_ntile`` are the engine's most
retry-sensitive constructs — they pin partition contents with
``spark_partition_id()`` + ``localCheckpoint(eager=True)`` and ship
per-partition offsets back as plan literals, so a task retry that
reproduced DIFFERENT partition contents would silently corrupt every
cumulative value downstream.

Two injection points, each under ``local-cluster[2,4,2048]``
(maxFailures=4 — a path ``local[N]`` can never take):

* UPSTREAM — an identity ``mapInPandas`` stage that fails its first
  task attempt runs BELOW the operator, so the injected failure lands
  inside the eager localCheckpoint materialization job; the retried
  task must recompute the identical rows for its range partition.
* DOWNSTREAM — the same failing stage runs ABOVE the operator's
  output, so the retry re-reads the checkpointed blocks + offset
  literals; the recomputed window partition must be byte-identical.

Each variant's order-free checksum (count + md5-prefix sum over every
row rendered with cumulative columns) must equal the clean run's.

Prints one JSON line:
{"clean": H, "upstream_retry": H, "downstream_retry": H,
 "attempts_failed": 2, "match": true}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local-cluster[2,4,2048]"


def failing_identity(df, fail_marker: str | None, schema: str):
    """Identity mapInPandas whose FIRST task attempt (cluster-wide,
    claimed via an O_EXCL marker shared by the executor JVMs) raises
    before yielding — forcing exactly one task retry."""

    def batches(it):
        first = True
        for pdf in it:
            if first and fail_marker is not None:
                first = False
                try:
                    fd = os.open(fail_marker, os.O_CREAT | os.O_EXCL)
                    os.close(fd)
                    raise RuntimeError(
                        "injected first-attempt task failure (retry me)"
                    )
                except FileExistsError:
                    pass
            yield pdf

    return df.mapInPandas(batches, schema)


def checksum(df):
    """Order-free exact digest: row count + sum of md5-prefix ints over
    the canonical rendering of every row (same family as the oracle
    hash — any changed/missing/extra row moves it)."""
    from pyspark.sql import functions as F

    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
        for c in sorted(df.columns)
    ]
    h = df.select(F.md5(F.concat_ws("\x1f", *cols)).alias("h"))
    row = h.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")
        ).alias("s"),
    ).collect()[0]
    return f"{row['n']}:{row['s']}"


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from end_end_data_pipeline__spark.operators import scale
    from end_end_data_pipeline__spark.sources import lake

    spark = (
        SparkSession.builder.master(MASTER)
        .config("spark.task.maxFailures", "4")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    base_schema = "l_orderkey long, l_linenumber long, rev_cents long"

    def base(marker: str | None):
        li = lake.load_table(spark, "lineitem", SF_DIR).select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "CAST(l_extendedprice * (1 - l_discount) * 100 AS "
                "DECIMAL(38,0))"
            )
            .cast("long")
            .alias("rev_cents"),
        )
        return failing_identity(li, marker, base_schema)

    order_cols = ["l_orderkey", "l_linenumber"]

    def rank_pipe(df):
        summed = scale.ordered_prefix_sums(
            df, order_cols, ["rev_cents"], with_totals=True
        )
        tiled = scale.global_ntile(summed, order_cols, 10, "decile")
        return tiled.select(
            "l_orderkey",
            "l_linenumber",
            "__cum_rev_cents",
            "__tot_rev_cents",
            "decile",
        )

    tmp = tempfile.mkdtemp(prefix="retry_rank_")
    out_schema = (
        "l_orderkey long, l_linenumber long, __cum_rev_cents long, "
        "__tot_rev_cents long, decile int"
    )

    h_clean = checksum(rank_pipe(base(None)))

    up_marker = os.path.join(tmp, "up.marker")
    h_up = checksum(rank_pipe(base(up_marker)))
    up_failed = int(os.path.exists(up_marker))

    down_marker = os.path.join(tmp, "down.marker")
    h_down = checksum(
        failing_identity(rank_pipe(base(None)), down_marker, out_schema)
    )
    down_failed = int(os.path.exists(down_marker))

    result = {
        "master": MASTER,
        "sf_dir": SF_DIR,
        "clean": h_clean,
        "upstream_retry": h_up,
        "downstream_retry": h_down,
        "attempts_failed": up_failed + down_failed,
        "match": h_clean == h_up == h_down
        and up_failed == down_failed == 1,
    }
    print(json.dumps(result))
    spark.stop()
    return 0 if result["match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
