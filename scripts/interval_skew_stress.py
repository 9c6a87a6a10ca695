#!/usr/bin/env python3
"""Hot-bucket stress study for the month-bucketed interval-overlap
join (VERDICT r07 task 4: DEMONSTRATE the salting knob
``plans.queries_stats.interval_overlap_rollup(salt_factor=...)``
instead of asserting it).

Why the catalog fixture can't show this: the shipments query works on
DATE-granularity intervals with spans <= 15 days, so one (supplier,
month) bucket holds at most ~31x15 DISTINCT intervals no matter how
many raw rows land in it — multiplicity compression (collapse equal
(sk,s,e) to a count BEFORE the join) caps the per-bucket join work
structurally.  That is itself the first skew defense, and this script
measures it (leg "compressed_hot_dates").  The salting knob exists
for the workload shape compression can't bound: TIMESTAMP-granularity
intervals, where a hot bucket's distinct-interval count is unbounded.
Here ONE supplier-month holds N_HOT distinct timestamp intervals
(plus an adjacent-month shoulder), over a background of even
suppliers; the bucket's pair-candidate work is quadratic and lands in
ONE task of the (sk, month) hash join in the naive plan.

Legs (identical output hashes asserted pairwise):

- ``naive``  — salt_factor=1: the hot bucket's |A|x|B| candidate scan
  serializes in one task.
- ``aqe``    — salt_factor=1 with AQE skew-join ON (thresholds
  tightened to trigger at local scale; at 100 TB the defaults fire on
  real skew): the runtime alternative to static salting.
- ``salted`` — salt_factor=8: B rows get xxhash64%8 salts, A rows
  replicate 8x, join key becomes (sk, month, salt) — the bucket's
  work spreads over 8 tasks for ~8x less straggler wall-clock at the
  cost of replicating the compressed A side.

All legs run with ``autoBroadcastJoinThreshold=-1``: at this toy
scale Spark BROADCASTS the compressed B side, which already spreads
the hot bucket over the A-side partitions (measured: with broadcast
on, naive and salted read the same and salting only adds replication
cost — the knob is pointless below the broadcast ceiling, which is
itself a finding).  The straggler this knob exists for appears in the
at-scale regime where B exceeds the broadcast budget and the join is
a shuffle SMJ on (sk, month).

Prints one JSON line with per-leg best-of-2 seconds.

    python scripts/interval_skew_stress.py [n_hot] [out_json]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
SALT = 8


def build_iv(spark, n_hot: int):
    """Deterministic synthetic intervals: one hot supplier-month of
    n_hot DISTINCT timestamp intervals (2024-03), an adjacent-month
    shoulder (2024-02) of n_hot/2, and 500 background suppliers with
    60 intervals each spread over 2023-2024."""
    from pyspark.sql import functions as F

    mar = 1709251200  # 2024-03-01 UTC
    feb = 1706745600  # 2024-02-01 UTC
    hot = spark.range(n_hot).select(
        F.lit(1).cast("long").alias("sk"),
        F.timestamp_seconds(
            F.lit(mar) + F.pmod(F.col("id") * 9973, F.lit(28 * 86400))
        ).alias("s"),
        F.timestamp_seconds(
            F.lit(mar) + F.pmod(F.col("id") * 9973, F.lit(28 * 86400))
            + 3600 + F.pmod(F.col("id") * 31, F.lit(200_000))
        ).alias("e"),
    )
    shoulder = spark.range(n_hot // 2).select(
        F.lit(1).cast("long").alias("sk"),
        F.timestamp_seconds(
            F.lit(feb) + F.pmod(F.col("id") * 7919, F.lit(28 * 86400))
        ).alias("s"),
        F.timestamp_seconds(
            F.lit(feb) + F.pmod(F.col("id") * 7919, F.lit(28 * 86400))
            + 3600 + F.pmod(F.col("id") * 37, F.lit(200_000))
        ).alias("e"),
    )
    bg = spark.range(500 * 60).select(
        (F.pmod(F.col("id"), F.lit(500)) + 2).alias("sk"),
        F.timestamp_seconds(
            F.lit(1672531200)  # 2023-01-01
            + F.pmod(F.col("id") * 104729, F.lit(700 * 86400))
        ).alias("s"),
        F.timestamp_seconds(
            F.lit(1672531200)
            + F.pmod(F.col("id") * 104729, F.lit(700 * 86400))
            + 3600 + F.pmod(F.col("id") * 41, F.lit(100_000))
        ).alias("e"),
    )
    return hot.unionByName(shoulder).unionByName(bg)


def date_leg_iv(spark, n_rows: int):
    """The catalog's own DATE-granularity shape with a hot supplier:
    n_rows raw rows all on supplier 1 in one month — multiplicity
    compression collapses them to <= ~28x14 distinct intervals, so the
    join work stays bounded however many raw rows pile in."""
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        F.lit(1).cast("long").alias("sk"),
        F.date_add(F.lit("2024-03-01").cast("date"),
                   F.pmod(F.col("id"), F.lit(28)).cast("int")).alias("s"),
        F.date_add(F.lit("2024-03-01").cast("date"),
                   (F.pmod(F.col("id"), F.lit(28))
                    + 1 + F.pmod(F.col("id") * 7, F.lit(14))).cast("int"))
        .alias("e"),
    )


def fingerprint(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> None:
    from end_end_data_pipeline__spark.plans.queries_stats import (
        interval_overlap_rollup,
    )
    from end_end_data_pipeline__spark.session import get_spark

    spark = get_spark("interval-skew")
    # the at-scale join shape: B side above the broadcast budget
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    iv = build_iv(spark, N_HOT).localCheckpoint(eager=True)  # freeze input

    def timed(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    naive = interval_overlap_rollup(iv, salt_factor=1)
    salted = interval_overlap_rollup(iv, salt_factor=SALT)
    # warmup + correctness: both legs bit-identical
    fp_n, fp_s = fingerprint(naive), fingerprint(salted)
    assert fp_n == fp_s, f"salted output diverged: {fp_n} vs {fp_s}"

    out = {
        "n_hot": N_HOT,
        "salt_factor": SALT,
        "hash_equal": True,
        "naive_sec": timed(naive),
        "salted_sec": timed(salted),
    }

    # runtime alternative: AQE skew split on the unsalted plan
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256KB")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    out["aqe_sec"] = timed(interval_overlap_rollup(iv, salt_factor=1))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    # the date-granularity leg: compression alone bounds a hot month
    ivd = date_leg_iv(spark, 200_000).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    interval_overlap_rollup(ivd, salt_factor=1).write.format("noop").mode(
        "overwrite"
    ).save()
    out["compressed_hot_dates_200k_rows_sec"] = round(
        time.perf_counter() - t0, 3
    )

    print(json.dumps(out))
    if len(sys.argv) > 2:
        Path(sys.argv[2]).write_text(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
