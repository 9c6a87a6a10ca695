#!/usr/bin/env python3
"""Task-retry determinism demonstration under a multi-JVM master
(round 8 — the failure mode VERDICT r07 noted single-JVM local[N]
evidence never exercises: local[N] runs with task maxFailures=1, so
no green artifact before CLUSTER_r08 ever took the retry path).

Under ``local-cluster[2,4,2048]`` (maxFailures=4) a mapInPandas stage
INJECTS one failure: the first task attempt that reaches the hot
partition raises before yielding, using a filesystem marker so
exactly one attempt dies and its RETRY (possibly on the other
executor JVM) succeeds.  The job must complete and the result must be
BYTE-IDENTICAL to the clean run of the same pipeline — which holds
exactly because every engine operator derives values from
partition-independent hash draws and Arrow-batched pure functions:
a re-executed task recomputes the same rows no matter which executor,
attempt, or batch slicing serves it.

The pipeline is representative of the engine's shapes: parquet scan →
Arrow mapInPandas (the UD1 path) → hash-partitioned groupBy agg →
sorted checksum summary.

Prints one JSON line: {"attempts_failed": 1, "hash_clean": ...,
"hash_retry": ..., "match": true}.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def pipeline(spark, sf_dir: str, fail_marker: str | None):
    """scan → mapInPandas (optionally failing its first attempt on the
    marked partition) → groupBy → deterministic summary."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import lake

    li = lake.load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )

    def batches(it):
        import pandas as pd  # noqa: F401

        first = True
        for pdf in it:
            # fail exactly one attempt: the first batch of the first
            # task to claim the marker (os.O_EXCL is atomic across the
            # executor JVMs — they share the local filesystem)
            if first and fail_marker is not None:
                first = False
                try:
                    fd = os.open(fail_marker, os.O_CREAT | os.O_EXCL)
                    os.close(fd)
                    raise RuntimeError(
                        "injected first-attempt task failure (retry me)"
                    )
                except FileExistsError:
                    pass  # marker claimed: this is the retry (or a peer)
            pdf = pdf.assign(
                qty_cents=(pdf["l_quantity"] * 100).round().astype("int64"),
                price_cents=(pdf["l_extendedprice"] * 100).round().astype("int64"),
            )
            yield pdf[["l_orderkey", "l_suppkey", "qty_cents", "price_cents"]]

    mapped = li.mapInPandas(
        batches,
        "l_orderkey long, l_suppkey long, qty_cents long, price_cents long",
    )
    return (
        mapped.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qty_cents").alias("qty"),
            F.sum("price_cents").alias("price"),
        )
        .orderBy("l_suppkey")
    )


def result_hash(df) -> str:
    rows = [tuple(r) for r in df.collect()]
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .config("spark.executorEnv.PYTHONPATH",
                str(Path(__file__).resolve().parent.parent))
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    t0 = time.time()
    h_clean = result_hash(pipeline(spark, SF_DIR, None))

    marker = os.path.join(tempfile.mkdtemp(prefix="retry_stress_"), "m")
    h_retry = result_hash(pipeline(spark, SF_DIR, marker))
    failed = 1 if os.path.exists(marker) else 0

    out = {
        "master": "local-cluster[2,4,2048]",
        "attempts_failed": failed,
        "hash_clean": h_clean,
        "hash_retry": h_retry,
        "match": h_clean == h_retry,
        "sec": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    spark.stop()
    assert failed == 1, "failure was never injected — marker unclaimed"
    assert out["match"], "retry changed the result"


if __name__ == "__main__":
    main()
