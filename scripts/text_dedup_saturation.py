#!/usr/bin/env python3
"""Band-saturation decades for the TEXT dedup family (VERDICT r09
task 5) — the MinHash/ngram mirror of scripts/phash_band_saturation.py.

Two questions, answered by measurement instead of asymptotics:

1. **MinHash band-collision candidate mass.**  The phash-64 study
   showed what saturation looks like: a 2^16-per-band key space fills
   up (~N²/2^18 candidate pairs) once N crosses ~10^6.  MinHash band
   keys here live in a 2^64 space (xxhash64 band compression) or a
   4-long concat (md5 family) — birthday saturation needs N ~ 2^32,
   so collision mass should stay CONTENT-driven (true near-dups + the
   S-curve's low-similarity admissions), i.e. ~linear in corpus size.
   This script measures Σ_buckets C(df,2) over the banded signature
   table at 10x/100x/1000x documents (50k/500k/5M docs) for the
   catalog configuration (md5 family, 8 bands x r=4), the engine
   default (xxhash64, 8x4), and the documented retune (4x8) — mass
   only, no pair ever materializes, so the 1000x decade is affordable.
   At decades <= --join-cap the FULL verified pipeline also runs for
   wall-clock + true-pair count.

2. **The ngram df-cap's discarded-mass share.**  ``max_shingle_df=128``
   bounds the inverted-index self-join at ~df² per shingle.  The cap
   is inert at sf0.01/sf0.1 (max df 128 precondition, sf1_dedup_gate).
   Here we measure, per decade: the df distribution's tail (max, p99),
   the share of index postings the cap discards, and the capped vs
   uncapped candidate-pair mass Σ C(df,2) — quantifying how far the
   fixture keeps the cap inert and what a Zipf-tail corpus would pay.

Corpus derivation replays scripts/make_sf1_derived.py's documents tier
exactly (key shift + per-copy LETTER word salt — copies are distinct
documents, not clones), built in-memory from the sf0.1 table, so the
measured ids/text match what a derived-decade gate feeds the catalog
queries.  NOTE the derivation makes cross-copy Jaccard ~0 by design —
the honest caveat recorded in the output is that a REAL 1000x corpus
with a growing hot-shingle tail would push the NGRAM numbers up (the
cap's discarded share is the knob to watch), while the MINHASH mass
conclusion depends only on band-key-space size, not on the salt.

    python scripts/text_dedup_saturation.py [--decades 10 100 1000]
        [--join-cap 100] [--out TEXT_DEDUP_SATURATION.json]
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


def derived_documents(spark, copies: int):
    """(doc_id, text) at ``copies`` x sf0.1 — the make_sf1_derived fast
    path's key shift + LETTER word salt, in-memory."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import lake

    base = lake.load_table(spark, "documents", SF01).select("doc_id", "text")
    idx = spark.range(copies).withColumnRenamed("id", "__copy")
    cc = F.col("__copy").cast("string")
    salt = F.translate(cc, "0123456789", "abcdefghij")
    return (
        base.repartition(32)
        .crossJoin(F.broadcast(idx))
        .select(
            (F.col("doc_id") + F.col("__copy") * OFF).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda w: F.concat(w, F.lit("x"), salt),
                ),
            ).alias("text"),
        )
    )


def minhash_mass(spark, docs, num_hashes: int, bands: int,
                 hash_family: str) -> dict:
    """Candidate mass from the banded signature table alone:
    Σ_(band,bh) C(df,2) — the pair count the LSH equi-join would have
    to evaluate.  groupBy is map-side combinable; nothing quadratic
    ever materializes."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.operators import dedup

    sig = dedup.minhash_signatures(
        docs, "text", "doc_id", n=3, num_hashes=num_hashes,
        hash_family=hash_family,
    )
    banded = dedup._banded(sig, num_hashes, bands, hash_family)
    t0 = time.time()
    row = (
        banded.groupBy("band", "bh")
        .agg(F.count("*").alias("df"))
        .agg(
            F.sum(F.expr("df * (df - 1) / 2")).cast("long").alias("mass"),
            F.max("df").alias("max_df"),
            F.count("*").alias("n_buckets"),
        )
        .collect()[0]
    )
    return {
        "candidate_mass": int(row["mass"] or 0),
        "max_bucket_df": int(row["max_df"]),
        "n_buckets": int(row["n_buckets"]),
        "sec_mass_scan": round(time.time() - t0, 1),
    }


def ngram_cap_stats(spark, docs, cap: int = 128) -> dict:
    """df-distribution tail + the cap's discarded share, from the
    inverted index alone (one explode + two aggs)."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.functions.arrays import explode_safe
    from end_end_data_pipeline__spark.operators.dedup import _doc_shingles

    inv = explode_safe(
        _doc_shingles(docs, "text", "doc_id", 3), ["doc"],
        F.col("sh"), "shingle",
    )
    t0 = time.time()
    dfs = inv.groupBy("shingle").agg(F.count("*").alias("df"))
    row = dfs.agg(
        F.sum("df").cast("long").alias("postings"),
        F.sum(F.when(F.col("df") > cap, F.col("df")).otherwise(0))
        .cast("long").alias("postings_discarded"),
        F.sum(F.expr("df * (df - 1) / 2")).cast("long").alias("mass_uncapped"),
        F.sum(
            F.when(F.col("df") <= cap, F.expr("df * (df - 1) / 2")).otherwise(0)
        ).cast("long").alias("mass_capped"),
        F.max("df").alias("max_df"),
        F.expr("percentile_approx(df, 0.99)").alias("p99_df"),
        F.count("*").alias("n_shingles"),
    ).collect()[0]
    out = {k: int(row[k] or 0) for k in (
        "postings", "postings_discarded", "mass_uncapped", "mass_capped",
        "max_df", "p99_df", "n_shingles")}
    out["discarded_share"] = round(
        out["postings_discarded"] / max(out["postings"], 1), 6)
    out["sec_scan"] = round(time.time() - t0, 1)
    return out


def full_join_wall(spark, docs, cfg: dict) -> dict:
    """Wall-clock + true-pair count for the full verified LSH pipeline
    (noop sink would hide the count; a cheap agg keeps both)."""
    from end_end_data_pipeline__spark.operators import dedup

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, verify_threshold=0.5, **cfg
    )
    n = pairs.count()
    return {"true_pairs": int(n), "sec_wall": round(time.time() - t0, 1)}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--decades", nargs="*", type=int, default=[10, 100, 1000])
    ap.add_argument("--join-cap", type=int, default=100,
                    help="run the full LSH join at decades <= this")
    ap.add_argument("--md5-cap", type=int, default=1000,
                    help="run the md5-family mass scan at decades <= this")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from end_end_data_pipeline__spark.session import get_spark

    spark = get_spark("text-dedup-saturation")
    configs = [
        ("catalog_md5_8x4", dict(num_hashes=32, bands=8, hash_family="md5")),
        ("engine_xxh_8x4", dict(num_hashes=32, bands=8,
                                hash_family="xxhash64")),
        ("retuned_xxh_4x8", dict(num_hashes=32, bands=4,
                                 hash_family="xxhash64")),
    ]
    report: dict = {"decades": {}}
    for d in args.decades:
        docs = derived_documents(spark, d).localCheckpoint(eager=True)
        n_docs = docs.count()
        dec: dict = {"n_docs": n_docs, "minhash": {}, "ngram": {}}
        for label, cfg in configs:
            if cfg["hash_family"] == "md5" and d > args.md5_cap:
                dec["minhash"][label] = {"skipped": f"> --md5-cap {args.md5_cap}"}
                continue
            m = minhash_mass(spark, docs, **cfg)
            m["candidates_per_doc"] = round(m["candidate_mass"] / n_docs, 3)
            if d <= args.join_cap:
                m.update(full_join_wall(spark, docs, cfg))
            dec["minhash"][label] = m
            print(f"[{d}x] minhash {label}: mass={m['candidate_mass']} "
                  f"({m['candidates_per_doc']}/doc, max bucket "
                  f"{m['max_bucket_df']})"
                  + (f" true_pairs={m.get('true_pairs')} "
                     f"wall={m.get('sec_wall')}s" if "true_pairs" in m else ""),
                  flush=True)
        dec["ngram"] = ngram_cap_stats(spark, docs)
        g = dec["ngram"]
        print(f"[{d}x] ngram: max_df={g['max_df']} p99={g['p99_df']} "
              f"discarded_share={g['discarded_share']} "
              f"mass capped/uncapped={g['mass_capped']}/{g['mass_uncapped']}",
              flush=True)
        report["decades"][f"{d}x"] = dec
        docs.unpersist()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
