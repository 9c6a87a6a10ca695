#!/usr/bin/env python3
"""MinHash-LSH band-parameter decade study (VERDICT r06 task 6).

``dedup_minhash_lsh_pairs`` was the worst headline decade scaler at
sf1 (4.3x at 10x data): with FIXED band parameters (8 bands x r=4)
the collision mass grows super-linearly with corpus size — more docs
sharing a band hash means more candidate pairs to exact-verify, and
the S-curve (P(collide) = 1 - (1 - j^r)^b) admits low-similarity
pairs that all fail verification (wasted work).  The documented knob
is to RETUNE bands at each decade: fewer, wider bands (4 x r=8) move
the 50% crossover from j ~ 0.55 to j ~ 0.84, cutting candidates at
the cost of recall for borderline pairs — the right trade when the
dedup threshold is 0.5+ and the corpus has grown 10x.

This script measures the catalog configuration and the retuned one at
two scale dirs (noop-sink wall clock, best of N) plus the candidate-
pair count each generates, making the collision-mass mechanism — not
just the wall clock — visible:

    python scripts/minhash_retune.py [--base /root/testdata/sf0.1]
        [--big /tmp/sf1-derived] [--runs 2]

Derive the big set first with ``python scripts/make_sf1_derived.py``.
Results are recorded in BASELINE.md's decade-watch notes.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1-derived")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.operators import dedup
    from end_end_data_pipeline__spark.session import get_spark
    from end_end_data_pipeline__spark.sources import lake

    spark = get_spark("minhash_retune")

    configs = [
        ("catalog 8x4 md5", dict(num_hashes=32, bands=8, hash_family="md5")),
        ("engine 8x4 xxh", dict(num_hashes=32, bands=8,
                                hash_family="xxhash64")),
        ("retuned 4x8 xxh", dict(num_hashes=32, bands=4,
                                 hash_family="xxhash64")),
    ]

    def run(sf_dir: str, cfg: dict) -> tuple[float, int, int]:
        docs = lake.load_table(spark, "documents", sf_dir)
        best = float("inf")
        for _ in range(args.runs):
            t = time.time()
            dedup.minhash_lsh_pairs(
                docs, "text", "doc_id", n=3, verify_threshold=0.5, **cfg
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t)
        # candidate mass: distinct banded collisions BEFORE verification
        sig = dedup.minhash_signatures(
            docs, "text", "doc_id", 3, cfg["num_hashes"], cfg["hash_family"]
        )
        unpivot = dedup._banded(
            sig, cfg["num_hashes"], cfg["bands"], cfg["hash_family"]
        )
        a, b_ = unpivot.alias("a"), unpivot.alias("b")
        cands = (
            a.join(
                b_,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select("a.doc", "b.doc")
            .distinct()
            .count()
        )
        pairs = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, verify_threshold=0.5, **cfg
        ).count()
        return best, cands, pairs

    # warm-up
    run(args.base, dict(configs[0][1]))
    print("| config | dir | sec | candidates | verified pairs |")
    print("|---|---|---|---|---|")
    for label, cfg in configs:
        for sf_dir in (args.base, args.big):
            sec, cands, pairs = run(sf_dir, cfg)
            print(
                f"| {label} | {Path(sf_dir).name} | {sec:.2f} |"
                f" {cands} | {pairs} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
