#!/usr/bin/env python3
"""Skewed-key stress study (BASELINE.md): derive a HOT-KEY variant of
the sf0.1 fixtures — one orderkey holding ~10% of all lineitem rows —
and time the ``join_order_lineitem_detail`` shape (orders ⋈ lineitem →
per-order agg) under the three skew postures:

- ``naive``    — AQE skew-join OFF, broadcast OFF: the plan a static
  engine runs; the hot key lands in ONE shuffle partition.
- ``aqe``      — AQE skew-join ON (thresholds tightened to 256KB to trigger
  at local scale after column pruning; at 100 TB the defaults trigger on real skew): the hot
  partition is split at runtime.  Asserts ``skew=true`` in the final
  adaptive plan.  NOTE: this query shape reuses the join's hash
  partitioning for the same-key groupBy, and AQE refuses to split a
  skewed partition whose output distribution is required downstream —
  splitting needs ``spark.sql.adaptive.forceOptimizeSkewedJoin=true``,
  which trades an EXTRA shuffle before the agg for straggler removal.
  At 100 TB that trade wins exactly when the hot key's single task
  dominates the stage wall-clock; this script measures the trade.
- ``salted``   — static mitigation (``operators.scale.salted_join``):
  lineitem salted from its row-unique (orderkey, linenumber), orders
  replicated ``salt_factor`` ways.  Works even where AQE cannot
  rewrite (e.g. a skewed agg feeding a stateful op).

All three variants must produce identical results (checked via a
order-insensitive hash of the aggregated output).  Prints one JSON
line: {"naive": s, "aqe": s, "salted": s, "hot_frac": ..., "rows": N}.

    python scripts/skew_stress.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew-sf0.1"
HOT_FRAC = 0.10
SALT_FACTOR = 8


def make_skewed(spark, src: str, out: str, hot_frac: float = HOT_FRAC) -> int:
    """Write orders + a skewed lineitem (``hot_frac`` of rows re-keyed
    to the smallest orderkey) under ``out``; returns the hot key."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import lake

    out_p = Path(out)
    if out_p.exists():
        shutil.rmtree(out_p)
    out_p.mkdir(parents=True)
    orders = lake.load_table(spark, "orders", src)
    lineitem = lake.load_table(spark, "lineitem", src)
    hot = orders.agg(F.min("o_orderkey")).first()[0]
    skewed = lineitem.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(1000))
            < int(hot_frac * 1000),
            F.lit(hot),
        ).otherwise(F.col("l_orderkey")),
    )
    # many files ⇒ many MAP tasks: AQE splits a skewed reducer
    # partition along map-output ranges, so a single-mapper shuffle is
    # UNSPLITTABLE no matter how skewed (a real 100 TB scan always has
    # thousands of mappers; the derived fixture must not be one file)
    orders.repartition(8).write.parquet(str(out_p / "orders.parquet"))
    skewed.repartition(32).write.parquet(str(out_p / "lineitem.parquet"))
    return int(hot)


def _join_shape(orders, lineitem):
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.functions.scalar import dec_sum

    joined = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    return joined.groupBy("o_orderkey").agg(
        F.count("l_orderkey").alias("n_items"),
        dec_sum("l_extendedprice", "gross_value"),
        F.coalesce(F.max("l_quantity"), F.lit(0.0)).alias("max_qty"),
    )


def _fingerprint(rows):
    """Order-insensitive content tuple from the COLLECTED result.
    Computed driver-side on purpose: wrapping the query in another
    Spark aggregation fuses the per-key agg into the join stage, which
    makes a skew split semantically impossible there — the very effect
    under study must not be perturbed by the measurement."""
    import math

    rows_s = sorted((r["o_orderkey"], r["n_items"], r["gross_value"]) for r in rows)
    return (
        len(rows_s),
        sum(x[1] for x in rows_s),
        round(math.fsum(x[2] for x in rows_s), 2),
    )


def run(spark, out: str, threshold: str = "256KB", advisory: str = "256KB") -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from end_end_data_pipeline__spark.operators import scale

    orders = spark.read.parquet(f"{out}/orders.parquet")
    lineitem = spark.read.parquet(f"{out}/lineitem.parquet")
    orders.count(), lineitem.count()  # warm the file listings / footers

    results: dict[str, float] = {}
    prints: dict[str, tuple] = {}

    def timed(tag, df):
        t0 = time.monotonic()
        rows = df.collect()
        results[tag] = round(time.monotonic() - t0, 3)
        prints[tag] = _fingerprint(rows)
        return df

    base_conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in (
        *base_conf,
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
    )}
    try:
        for k, v in base_conf.items():
            spark.conf.set(k, v)

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timed("naive", _join_shape(orders, lineitem))

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", threshold
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
        # the same-key groupBy downstream requires the join's hash
        # distribution; without force, OptimizeSkewedJoin skips the split
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        aqe_df = timed("aqe", _join_shape(orders, lineitem))
        plan = aqe_df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE skew split did not trigger"

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        salted = scale.salted_join(
            lineitem,
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
            F.xxhash64("l_orderkey", "l_linenumber"),
            salt_factor=SALT_FACTOR,
        ).withColumn("o_orderkey", F.col("l_orderkey"))
        timed(
            "salted",
            salted.groupBy("o_orderkey").agg(
                F.count("l_orderkey").alias("n_items"),
                F.sum(
                    F.col("l_extendedprice").cast("decimal(25,6)")
                ).cast("double").alias("gross_value"),
                F.coalesce(F.max("l_quantity"), F.lit(0.0)).alias("max_qty"),
            ),
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert prints["naive"] == prints["aqe"] == prints["salted"], prints
    return results


def main() -> None:
    from end_end_data_pipeline__spark.session import get_spark

    spark = get_spark("skew-stress")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    hot = make_skewed(spark, SRC, OUT)
    res = run(spark, OUT)
    res.update({"hot_key": hot, "hot_frac": HOT_FRAC, "src": SRC})
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
