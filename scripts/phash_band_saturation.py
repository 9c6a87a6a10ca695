#!/usr/bin/env python3
"""Band-collision saturation study: 64-bit dHash (4x16-bit bands) vs
256-bit dHash (4x64-bit bands) across derived corpus decades (VERDICT
r08 task 5).

The pigeonhole near-dup join's cost driver is CANDIDATE MASS — the
number of same-(band, val) pairs the equi-join must evaluate,
Σ_buckets C(df, 2).  With 4x16-bit bands the value space is 2^16 per
band: once the corpus passes ~10^6 images every bucket holds ~N/2^16
unrelated hashes and the mass turns quadratic (~N²/2^18) — the r08
74 GB-spill cliff (fixed for correctness by verified-in-join, but the
JOIN still has to evaluate that mass).  With 4x64-bit bands
(:func:`operators.multimodal.dhash256_bands`) the space is 2^64 and
collisions stay content-driven — mass ~linear in corpus size.

Mass is measured from the bands table alone (groupBy (band, val) →
Σ df·(df-1)/2) — no pair ever materializes, so the 1000x decade is
cheap for BOTH variants even where the 64-bit join itself would
grind.  At decades <= the wall-time cap we also run the FULL
verified-in-join query for wall-clock and true-pair count.

The synthetic corpus replays scripts/make_sf1_derived.py's documents
tier exactly (sf0.1 doc_ids, key-shifted +copy*10^9) so the measured
ids match what a derived-decade gate would feed the catalog queries —
but built in-memory from the doc_id column only (the media synthesis
needs nothing else), so no derived parquet is required.

    python scripts/phash_band_saturation.py [--decades 10 100 1000]
        [--join-cap 100] [--out SAT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
OFF = 1_000_000_000


def derived_doc_ids(spark, copies: int):
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import lake

    base = lake.load_table(spark, "documents", SF01).select("doc_id")
    idx = spark.range(copies).withColumnRenamed("id", "__copy")
    return (
        base.repartition(32)
        .crossJoin(F.broadcast(idx))
        .select((F.col("doc_id") + F.col("__copy") * OFF).alias("doc_id"))
    )


def media_for(docs, bits: int):
    # the SHARED fixture definition — the same closed form the two
    # catalog queries run and their oracles replay, so this study can
    # never silently measure a different pipeline
    from end_end_data_pipeline__spark.operators import multimodal

    geom = (9, 8) if bits == 64 else (17, 16)
    return multimodal.phash_fixture_media(docs, "doc_id", *geom)


def bands_for(media, bits: int):
    from end_end_data_pipeline__spark.operators import multimodal

    if bits == 64:
        return multimodal.dhash_bands(media, "media", "doc_id")
    return multimodal.dhash256_bands(media, "media", "doc_id")


def candidate_mass(bands) -> int:
    from pyspark.sql import functions as F

    row = (
        bands.groupBy("band", "val")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("mass"))
        .collect()[0]
    )
    return int(row["mass"] or 0)


def full_join_pairs(bands, bits: int):
    # the SHARED verified-in-join definition the catalog queries run
    from end_end_data_pipeline__spark.operators import multimodal

    cols = ("h",) if bits == 64 else ("h0", "h1", "h2", "h3")
    return multimodal.banded_hamming_pairs(bands, "doc_id", cols).count()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--decades", nargs="*", type=int, default=[10, 100, 1000])
    ap.add_argument("--join-cap", type=int, default=100,
                    help="run the full verified join only at decades "
                         "<= this (mass-only above)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from end_end_data_pipeline__spark.session import get_spark

    spark = get_spark("phash-saturation")
    report: dict = {"decades": {}}
    for copies in args.decades:
        docs = derived_doc_ids(spark, copies).localCheckpoint()
        n = docs.count()
        entry: dict = {"n_docs": n}
        for bits in (64, 256):
            bands = bands_for(media_for(docs, bits), bits).localCheckpoint()
            t0 = time.time()
            mass = candidate_mass(bands)
            t_mass = round(time.time() - t0, 2)
            e = {"candidate_mass": mass, "sec_mass": t_mass,
                 "mass_per_doc": round(mass / n, 3)}
            if copies <= args.join_cap:
                t0 = time.time()
                e["true_pairs"] = full_join_pairs(bands, bits)
                e["sec_full_join"] = round(time.time() - t0, 2)
            entry[f"dhash{bits}"] = e
            print(f"decade {copies}x ({n} docs) dhash{bits}: "
                  f"mass={mass} ({e['mass_per_doc']}/doc)"
                  + (f" true_pairs={e.get('true_pairs')}"
                     f" join={e.get('sec_full_join')}s"
                     if "true_pairs" in e else ""),
                  flush=True)
            # localCheckpoint blocks are freed by the ContextCleaner
            # when the plan is GC'd (DataFrame.unpersist() is a no-op
            # for checkpoints) — drop the reference and nudge GC so a
            # decade's blocks don't pile onto the next one
            del bands
        report["decades"][str(copies)] = entry
        del docs
        import gc

        gc.collect()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
