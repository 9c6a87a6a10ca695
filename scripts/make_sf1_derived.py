#!/usr/bin/env python3
"""Materialize a DERIVED ~sf1 dataset for the scale-trend study
(BASELINE.md): 10 key-shifted copies of the read-only sf0.1 fixtures,
written to /tmp/sf1-derived.  Perf-measurement data ONLY — correctness
oracles always run against the driver's own fixtures.

Key shifting preserves join integrity (copy i offsets every key by
i x 10^9, so customer->orders->lineitem chains stay intact and result
cardinalities grow ~10x); dimension tables (region/nation) are shared
across copies like real dims.  Document text is word-salted per copy
(word -> word_i) so the dedup pipelines see 10x distinct documents
instead of a pathological 10-way duplicate corpus that would measure
the duplicate explosion, not the scale trend.

    python scripts/make_sf1_derived.py [out_dir] [copies]

``copies`` defaults to 10 (the sf1 decade); ``30`` derives the sf3
fourth-decade set for the worst-scaler watch (VERDICT r06 task 8);
``1000`` derives the ~sf100 sixth-decade set (r08 — ~600 M lineitem
rows).  Above 30 copies the per-copy unionByName plan (1000 branches,
each with its own withColumns) would swamp Catalyst analysis, so the
generator switches to a broadcast ``range(copies)`` crossJoin with the
shift/salt applied as expressions over the copy index — identical row
content, one small plan, fully parallel generation.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-derived"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 1_000_000_000

# per-table key columns to shift per copy (dims omitted = shared)
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.session import get_spark
    from end_end_data_pipeline__spark.sources import lake

    out = Path(OUT)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    spark = get_spark("make-sf1")
    # write micros (not legacy INT96) so the derived files read back
    # through the same typed-scan path as the fixtures
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    for name in DIMS:
        df = lake.load_table(spark, name, SRC)
        df.coalesce(1).write.parquet(str(out / f"{name}.parquet"))
    for name, keys in SHIFT.items():
        base = lake.load_table(spark, name, SRC)
        if COPIES > 30:
            # sixth-decade fast path: broadcast-range crossJoin keeps
            # the plan O(1) in COPIES and the generation embarrassingly
            # parallel.  Repartition the BASE first so each task fans
            # out its own slice x COPIES with no post-join shuffle.
            n_parts = max(32, min(256, COPIES // 4))
            idx = spark.range(COPIES).withColumnRenamed("id", "__copy")
            c = base.repartition(n_parts).crossJoin(F.broadcast(idx))
            cc = F.col("__copy").cast("string")
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.col("__copy") * F.lit(OFF))
            if name == "customer":
                c = c.withColumn(
                    "c_name",
                    F.concat(F.lit("Cust"), cc, cc, F.lit("er#"),
                             F.substring("c_name", 10, 9)),
                )
            if name == "documents":
                # LETTER salt (digits translated a-j), not "_<i>": the
                # text tier's word scope is ^[a-z]+$, so a punctuated/
                # digit salt would knock EVERY word out of scope and
                # the BPE tier would see an empty corpus (found by the
                # sf1-derived oracle gate: bpe_token_stats raised its
                # designed too-few-merges error)
                salt = F.translate(cc, "0123456789", "abcdefghij")
                c = c.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda w: F.concat(w, F.lit("x"), salt),
                        ),
                    ),
                )
            if name == "embeddings":
                # distinct vector CONTENT per copy (same fix as names/
                # text): a per-(copy, dim) sign flip keeps every norm
                # and every WITHIN-copy cosine exactly (s_d^2 = 1) but
                # decorrelates cross-copy pairs — without it the 10
                # key-shifted clones of each vector form 10-cliques and
                # every pair query measures a duplicate explosion
                # (embedding_neardup_pairs: 68x at 10x data), not scale
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(
                            F.pmod(F.xxhash64(F.col("__copy"), i), F.lit(2))
                            == 0, x
                        ).otherwise(-x),
                    ),
                )
            c.drop("__copy").write.parquet(str(out / f"{name}.parquet"))
            print(f"{name}: {COPIES}x shifted copies written (fast path)")
            continue
        copies = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFF))
            if name == "customer":
                # distinct names per copy at pairwise edit distance
                # >= 2 (DOUBLED copy digit, a repetition code): the
                # deletion-neighborhood decade then measures 10x the
                # true near-dup work instead of a cross-copy duplicate
                # explosion (unsalted, each name's 10 key-shifted
                # clones turned every sf0.1 pair into 100 and every
                # name into a 10-clique: 262k -> 26.9M result rows) —
                # same reason documents get word-salted below.
                c = c.withColumn(
                    "c_name",
                    F.concat(
                        F.lit(f"Cust{i}{i}er#"), F.substring("c_name", 10, 9)
                    ),
                )
            if name == "documents":
                # distinct text per copy: salt every word with a LETTER
                # form of the copy index so shingle/minhash dfs scale
                # without duplicates AND the words stay inside the text
                # tier's ^[a-z]+$ scope (see the fast-path comment)
                letters = "".join(
                    "abcdefghij"[int(ch)] for ch in str(i)
                )
                c = c.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda w: F.concat(w, F.lit(f"x{letters}")),
                        ),
                    ),
                )
            if name == "embeddings":
                # per-(copy, dim) sign flip — see the fast-path comment
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        # lit(i) cast LONG to match the fast path's
                        # LONG __copy operand: xxhash64 is type-
                        # sensitive, so identical operand types are
                        # what make the two generation paths emit
                        # identical sign patterns (ADVICE r08)
                        lambda x, d: F.when(
                            F.pmod(
                                F.xxhash64(F.lit(i).cast("long"), d),
                                F.lit(2),
                            ) == 0, x
                        ).otherwise(-x),
                    ),
                )
            copies.append(c)
        full = copies[0]
        for c in copies[1:]:
            full = full.unionByName(c)
        full.write.parquet(str(out / f"{name}.parquet"))
        print(f"{name}: {COPIES}x shifted copies written")
    spark.stop()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
