"""Scale-hardening operator tests: salted join/agg equivalence and the
bucketed shuffle-free join (plan-asserted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_end_data_pipeline__spark.operators import scale
from end_end_data_pipeline__spark.sources import lake
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    orders = lake.load_table(spark, "orders", SF_SMOKE)
    customer = lake.load_table(spark, "customer", SF_SMOKE).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    salted = scale.salted_join(
        orders, customer, "o_custkey", F.col("o_orderkey"), salt_factor=8
    ).select("o_orderkey", "o_custkey", "c_mktsegment")
    cols = ["o_orderkey", "o_custkey", "c_mktsegment"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_two_phase_agg_equals_plain(spark):
    events = lake.load_table(spark, "events", SF_SMOKE)
    plain = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.max("value").alias("mx"),
        F.min("value").alias("mn"),
    )
    salted = scale.salted_two_phase_agg(
        events,
        ["event_type"],
        F.col("event_id"),
        {"n": ("event_id", "count"), "mx": ("value", "max"), "mn": ("value", "min")},
        salt_factor=16,
    )
    cols = ["event_type", "n", "mx", "mn"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_how_variants_equal_plain_join(spark):
    """Every allowed ``how`` must be row-identical to the plain join —
    including rows the small side does NOT match (the left/anti
    families are where small-side replication bugs would surface:
    a wrongly-salted probe would emit an unmatched row once per salt,
    or drop a semi match whose replica landed under another salt).
    Right/full outer must be rejected (unmatched small rows would
    appear salt_factor times)."""
    import pytest

    big = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (3, 13), (None, 14)],
        "k long, uid long",
    )
    small = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "z")], "k long, label string"
    )
    for how in ["inner", "left", "left_semi", "left_anti"]:
        plain = big.join(small, "k", how)
        salted = scale.salted_join(
            big, small, "k", F.col("uid"), salt_factor=4, how=how
        )
        cols = plain.columns
        assert salted.columns == cols, how
        key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
        got = sorted((tuple(r[c] for c in cols) for r in salted.collect()), key=key)
        want = sorted((tuple(r[c] for c in cols) for r in plain.collect()), key=key)
        assert got == want, how
    for how in ["right", "full", "outer", "cross"]:
        with pytest.raises(ValueError):
            scale.salted_join(big, small, "k", F.col("uid"), 4, how=how)


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land with every salt value — the whole
    point of salting."""
    hot = spark.range(1000).select(
        F.lit(1).alias("k"), F.col("id").alias("uid")
    )
    dim = spark.createDataFrame([(1, "x")], "k long, label string")
    salted = hot.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("uid")), F.lit(8)).cast("int")
    )
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts == 8
    out = scale.salted_join(hot, dim, "k", F.col("uid"), salt_factor=8)
    assert out.count() == 1000


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key ⇒ the join plan contains no
    Exchange (the shuffle was paid at write time)."""
    orders = lake.load_table(spark, "orders", SF_SMOKE)
    customer = lake.load_table(spark, "customer", SF_SMOKE)
    scale.write_bucketed(
        orders, "orders_b", ["o_custkey"], 8, path=str(tmp_path / "orders_b")
    )
    scale.write_bucketed(
        customer, "customer_b", ["c_custkey"], 8, path=str(tmp_path / "customer_b")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (at real scale neither side
        # broadcasts — that's when bucketing pays)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and it still computes the right thing
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_aqe_splits_skewed_join(spark):
    """Runtime skew mitigation (the AQE side of the salting coin): a
    550k-row hot key must get its shuffle partition split —
    `SortMergeJoin(skew=true)` in the final adaptive plan.  Note the
    payload column must survive the join (column pruning can shrink the
    shuffled rows to just the key, hiding the byte skew — exactly why
    this is asserted on a payload-carrying plan)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pad = F.concat(
            *[F.md5(F.col("id").cast("string").cast("binary")) for _ in range(4)]
        )
        big = spark.range(600000).select(
            F.when(F.col("id") < 550000, F.lit(1)).otherwise(F.col("id")).alias("k"),
            pad.alias("pad"),
        )
        dim = spark.range(600000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        agg = big.join(dim, "k").agg(
            F.sum(F.length("pad")).alias("s"), F.sum("w").alias("sw")
        )
        assert agg.collect()[0]["s"] == 600000 * 128
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_connected_components_vs_union_find(spark):
    """Min-label propagation vs a sequential union-find model on a
    deterministic random graph (chains, cliques, isolated pairs)."""
    import random

    from end_end_data_pipeline__spark.operators.graph import connected_components

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 40, 2)]            # 20 pairs
    edges += [(100 + i, 100 + i + 1) for i in range(30)]     # one 31-node chain
    edges += [(200 + a, 200 + b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(rng.randrange(300, 330), rng.randrange(300, 330)) for _ in range(25)]

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    # canonicalize both to min-of-component grouping
    from collections import defaultdict
    def groups(lab):
        g = defaultdict(set)
        for n, c in lab.items():
            g[c].add(n)
        return {frozenset(s) for s in g.values()}
    assert groups(got) == groups(expected)


def test_skew_stress_fixture_study(spark, tmp_path):
    """The skewed-FIXTURE study (scripts/skew_stress.py) at sf0.01: a
    hot orderkey holding ~10% of lineitem re-keyed rows must (a) trip
    AQE's skew split on the real join_order_lineitem_detail shape —
    requires the multi-mapper fixture layout; a single-file shuffle is
    unsplittable — and (b) produce identical results across naive /
    AQE-split / salted plans.  run() asserts both internally."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import skew_stress as sk

    out = str(tmp_path / "skew")
    # sf0.01, not SF_SMOKE: at sf0.001 the hot partition is ~15KB —
    # below any meaningful skew threshold
    sk.make_skewed(spark, "/root/testdata/sf0.01", out, hot_frac=0.2)
    # sf0.01 files are ~100KB: default 128MB bin-packing would read all
    # 32 files as ONE map task, making the shuffle unsplittable — force
    # one mapper per file so the sf0.1-scale mapper layout reproduces
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")
        spark.conf.set("spark.sql.files.openCostInBytes", "1024")
        # the test session runs 8 shuffle partitions; at 8 the hot
        # partition is only ~2x median (non-hot rows dilute it) — 32
        # reproduces the production-shaped skew ratio
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        res = sk.run(spark, out, threshold="32KB", advisory="32KB")
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert set(res) == {"naive", "aqe", "salted"}
    assert all(v > 0 for v in res.values())


def test_runtime_bloom_filter_join(spark, tmp_path):
    """Spark's runtime bloom-filter join (the engine-native version of
    a semi-join pushdown): a selective dim-side filter should inject a
    BloomFilter aggregate that pre-filters the fact side BEFORE its
    shuffle — the plan-level proof that at 100 TB the big side is
    thinned at the scan, not at the join."""
    import pyspark.sql.functions as F

    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(200_000).select(
        (F.col("id") % 10_000).alias("k"), F.col("id").alias("v")
    ).write.parquet(fact_p)
    spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    ).write.parquet(dim_p)
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        # default 10GB gates the filter to huge scans; the test fact
        # table is tiny, so drop the gate to exercise the rewrite
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0"
        )
        # force a shuffle join so the runtime filter has a shuffle to save
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter("w % 100 = 0")  # selective
        joined = fact.join(dim, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, plan
        # and the answer is still exactly right
        assert joined.count() == 200_000 // 10_000 * (10_000 // 50)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_gdpr_physical_erasure(spark, tmp_path):
    """Right-to-be-forgotten on the manifest table: delete_where + a
    keep_last=1 vacuum must leave NO parquet file anywhere under the
    table that still contains the erased key — logical deletion alone
    (old snapshots) is not erasure."""
    import glob

    import duckdb

    from end_end_data_pipeline__spark.sources import manifest_table as mt
    from tests.test_manifest_table import _batch

    target = str(tmp_path / "t")
    rows = [(i, float(i), "c", 1) for i in range(1, 30)]
    mt.merge_versioned(_batch(spark, rows), target, ["id"], n_buckets=4)
    mt.delete_where(spark, target, [("id", "=", 13)])
    # pre-vacuum: version 1's files still hold the key (time travel)
    files = glob.glob(f"{target}/data/**/*.parquet", recursive=True)
    con = duckdb.connect()
    held = sum(
        con.execute(f"SELECT COUNT(*) FROM '{f}' WHERE id = 13").fetchone()[0]
        for f in files
    )
    assert held > 0
    mt.vacuum(spark, target, keep_last=1)
    files = glob.glob(f"{target}/data/**/*.parquet", recursive=True)
    assert files
    held = sum(
        con.execute(f"SELECT COUNT(*) FROM '{f}' WHERE id = 13").fetchone()[0]
        for f in files
    )
    assert held == 0  # physically gone
    assert mt.read_snapshot(spark, target).count() == 28


def test_parquet_merge_schema_union(spark, tmp_path):
    """Plain-parquet schema drift on read: mergeSchema unions file
    schemas (new columns read back null for old files) — the S10
    behavior the manifest table implements manifest-side."""
    import pyspark.sql.functions as F

    p = str(tmp_path / "t")
    spark.range(3).select(F.col("id")).write.parquet(p + "/a")
    spark.range(3).select(
        F.col("id"), F.lit("x").alias("extra")
    ).write.parquet(p + "/b")
    df = spark.read.option("mergeSchema", True).parquet(p + "/a", p + "/b")
    assert set(df.columns) == {"id", "extra"}
    assert df.filter(F.col("extra").isNull()).count() == 3


def test_grouped_global_rank_equals_window(spark):
    """The two-phase range/offset rank must be bit-identical to the
    window row_number, grouped and global."""
    from pyspark.sql import Window

    from end_end_data_pipeline__spark.operators.scale import grouped_global_rank
    from end_end_data_pipeline__spark.sources import lake
    from tests.conftest import SF_SMOKE

    orders = lake.load_table(spark, "orders", SF_SMOKE)
    cents = orders.select(
        F.col("o_orderpriority").alias("pri"),
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(13,2)") * 100)
        .cast("bigint")
        .alias("xc"),
    )
    # grouped
    w = Window.partitionBy("pri").orderBy("xc", "o_orderkey")
    want = {
        (r["pri"], r["o_orderkey"]): r["r"]
        for r in cents.withColumn(
            "r", F.row_number().over(w).cast("long")
        ).collect()
    }
    got_df = grouped_global_rank(cents, ["pri"], ["xc", "o_orderkey"])
    got = {(r["pri"], r["o_orderkey"]): r["r"] for r in got_df.collect()}
    assert got == want
    # the decoupling property itself: under the same range partitioning
    # the operator uses, every group SPANS multiple partitions (a
    # window partitionBy would pin each group to exactly one task)
    spans = (
        cents.repartitionByRange(8, "pri", "xc", "o_orderkey")
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("pri")
        .agg(F.countDistinct("__pid").alias("np"))
        .collect()
    )
    assert all(r["np"] > 1 for r in spans), spans
    # global (no groups): one total order, ranks 1..n
    wg = Window.orderBy("xc", "o_orderkey")
    want_g = {
        r["o_orderkey"]: r["r"]
        for r in cents.withColumn(
            "r", F.row_number().over(wg).cast("long")
        ).collect()
    }
    got_g = {
        r["o_orderkey"]: r["r"]
        for r in grouped_global_rank(cents, [], ["xc", "o_orderkey"]).collect()
    }
    assert got_g == want_g


def test_grouped_global_rank_validates_order(spark):
    import pytest

    from end_end_data_pipeline__spark.operators.scale import grouped_global_rank
    from end_end_data_pipeline__spark.sources import lake
    from tests.conftest import SF_SMOKE

    orders = lake.load_table(spark, "orders", SF_SMOKE)
    with pytest.raises(ValueError, match="order_cols"):
        grouped_global_rank(orders, ["o_orderpriority"], [])


def test_grouped_global_rank_null_and_typed_groups(spark):
    """NULL and '' are distinct groups; boolean group values match
    their offsets (the failure modes of a rendered-string key map)."""
    from pyspark.sql import Row, Window
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from end_end_data_pipeline__spark.operators.scale import grouped_global_rank

    rows = []
    i = 0
    for g in [None, "", "a", "b"]:
        for flag in [True, False]:
            for _ in range(6):
                i += 1
                rows.append(Row(g=g, flag=flag, v=(i * 37) % 23, id=i))
    schema = StructType(
        [
            StructField("g", StringType(), True),
            StructField("flag", BooleanType(), False),
            StructField("v", LongType(), False),
            StructField("id", LongType(), False),
        ]
    )
    df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    w = Window.partitionBy("g", "flag").orderBy("v", "id")
    want = {
        r["id"]: r["r"]
        for r in df.withColumn("r", F.row_number().over(w).cast("long")).collect()
    }
    got_rows = grouped_global_rank(
        df, ["g", "flag"], ["v", "id"], n_parts=4
    ).collect()
    got = {r["id"]: r["r"] for r in got_rows}
    assert got == want
    assert None not in {r["r"] for r in got_rows}


def test_grouped_global_rank_nan_group(spark):
    """A float NaN group spanning range partitions must still receive a
    total per-group ranking: Spark groups all NaNs together, and the
    driver-side prefix sum canonicalizes NaN dict keys to match (a
    per-object NaN key would give every partition start offset 0)."""
    from pyspark.sql import Row, Window
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from end_end_data_pipeline__spark.operators.scale import grouped_global_rank

    rows = []
    i = 0
    for g in [float("nan"), -0.0, 1.5]:
        for _ in range(12):  # 12 rows per group across 4 range splits
            i += 1
            rows.append(Row(g=g, v=(i * 37) % 29, id=i))
    # plus a +0.0 group that Spark merges with -0.0
    for _ in range(12):
        i += 1
        rows.append(Row(g=0.0, v=(i * 37) % 29, id=i))
    schema = StructType(
        [
            StructField("g", DoubleType(), False),
            StructField("v", LongType(), False),
            StructField("id", LongType(), False),
        ]
    )
    df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: r["r"]
        for r in df.withColumn("r", F.row_number().over(w).cast("long")).collect()
    }
    got_rows = grouped_global_rank(df, ["g"], ["v", "id"], n_parts=4).collect()
    got = {r["id"]: r["r"] for r in got_rows}
    assert got == want
    # the NaN group really is ONE group of 12 with ranks 1..12
    import math

    nan_ranks = sorted(r["r"] for r in got_rows if math.isnan(r["g"]))
    assert nan_ranks == list(range(1, 13))
    zero_ranks = sorted(r["r"] for r in got_rows if r["g"] == 0.0)
    assert zero_ranks == list(range(1, 25))  # -0.0 and +0.0 merged


def test_grouped_global_rank_high_cardinality_fallback(spark):
    """Above max_driver_groups the operator must refuse the driver-side
    offset map and fall back to the plain window form — results still
    bit-identical to the window oracle."""
    from pyspark.sql import Window

    from end_end_data_pipeline__spark.operators.scale import grouped_global_rank

    n = 3000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("g"),  # ~1000 distinct groups
        (F.col("id") * 37 % 101).alias("v"),
        F.col("id"),
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: r["r"]
        for r in df.withColumn("r", F.row_number().over(w).cast("long")).collect()
    }
    out = grouped_global_rank(df, ["g"], ["v", "id"], max_driver_groups=100)
    got = {r["id"]: r["r"] for r in out.collect()}
    assert got == want
    # the fallback plan is the WINDOW form: no range-repartition /
    # spark_partition_id machinery (plan contains a Window node and no
    # __pid projection)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__pid" not in plan
    assert "window" in plan.lower()


def test_cheapest_paths_khop_prefers_cheaper_long_path(spark):
    """Weighted relaxation semantics: a 2-hop cost-2 path must undercut
    a direct cost-10 edge; a node 3 hops out must be absent at k=2 and
    appear at k=3; parallel edges keep the cheapest."""
    from end_end_data_pipeline__spark.operators.graph import cheapest_paths_khop

    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1), (2, 4, 5), (1, 3, 7)],
        "src long, dst long, w long",
    )
    sources = spark.createDataFrame([(1,)], "node long")

    d2 = {r["node"]: r["cost"]
          for r in cheapest_paths_khop(edges, sources, k=2, undirected=False).collect()}
    # 1->3->2 = 2 beats direct 10; 4 only via the expensive edge at k=2
    assert d2 == {1: 0, 2: 2, 3: 1, 4: 15}

    d3 = {r["node"]: r["cost"]
          for r in cheapest_paths_khop(edges, sources, k=3, undirected=False).collect()}
    assert d3[4] == 7  # 1->3->2->4


def test_cheapest_paths_khop_weight_type_guard(spark):
    """r07 advice: scale-0 decimals are exactly integral and must pass
    the fractional-weight guard (they cast to long losslessly);
    positive-scale decimals and doubles stay rejected."""
    import pytest

    from end_end_data_pipeline__spark.operators.graph import cheapest_paths_khop

    sources = spark.createDataFrame([(1,)], "node long")
    dec0 = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1)], "src long, dst long, w long"
    ).selectExpr("src", "dst", "CAST(w AS DECIMAL(10,0)) AS w")
    d = {r["node"]: r["cost"]
         for r in cheapest_paths_khop(dec0, sources, k=2, undirected=False).collect()}
    assert d == {1: 0, 2: 2, 3: 1}

    for cast_t in ("DECIMAL(10,2)", "DOUBLE"):
        bad = dec0.selectExpr("src", "dst", f"CAST(w AS {cast_t}) AS w")
        with pytest.raises(ValueError, match="integer"):
            cheapest_paths_khop(bad, sources, k=2, undirected=False)


def test_ordered_prefix_sums_equals_window(spark):
    """Distributed prefix sums are bit-identical to the single-task
    ``SUM(c) OVER (ORDER BY ...)`` form, for several partition counts
    (including n_parts > distinct keys, which leaves empty splits)."""
    from pyspark.sql import Window

    orders = lake.load_table(spark, "orders", SF_SMOKE).limit(500)
    per_v = (
        orders.select(
            (F.col("o_totalprice").cast("decimal(13,2)") * 100)
            .cast("bigint")
            .alias("xc"),
            (F.col("o_orderkey") % 3).alias("s"),
        )
        .groupBy("xc")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
            .cast("long")
            .alias("d1"),
            F.sum(F.when(F.col("s") != 0, 1).otherwise(0))
            .cast("long")
            .alias("d2"),
        )
    )
    w = Window.orderBy("xc").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["xc"]: (r["c1"], r["c2"])
        for r in per_v.select(
            "xc",
            F.sum("d1").over(w).alias("c1"),
            F.sum("d2").over(w).alias("c2"),
        ).collect()
    }
    totals = per_v.agg(
        F.sum("d1").alias("t1"), F.sum("d2").alias("t2")
    ).first()
    for n_parts in (1, 4, 1000):
        out = scale.ordered_prefix_sums(
            per_v, ["xc"], ["d1", "d2"], n_parts=n_parts, with_totals=True
        )
        rows = out.collect()
        got = {r["xc"]: (r["__cum_d1"], r["__cum_d2"]) for r in rows}
        assert got == want, f"n_parts={n_parts}"
        assert all(
            r["__tot_d1"] == totals["t1"] and r["__tot_d2"] == totals["t2"]
            for r in rows
        )


def test_global_ntile_equals_window_ntile(spark):
    """The arithmetic (rank, n) → bucket formula reproduces
    ``ntile(b) OVER (ORDER BY ...)`` bit-for-bit: uneven n mod b
    remainders, b that divides n, n < b, descending order via negated
    key, and several partition counts."""
    from pyspark.sql import Window

    orders = lake.load_table(spark, "orders", SF_SMOKE)
    scored = orders.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(13,2)") * 100)
        .cast("bigint")
        .alias("xc"),
    )
    for b, limit in ((10, 497), (7, 490), (10, 6)):
        sub = scored.limit(limit)
        w = Window.orderBy("xc", "o_orderkey")
        want = {
            r["o_orderkey"]: r["bucket"]
            for r in sub.select(
                "o_orderkey", F.ntile(b).over(w).alias("bucket")
            ).collect()
        }
        for n_parts in (1, 5):
            got = {
                r["o_orderkey"]: r["bucket"]
                for r in scale.global_ntile(
                    sub, ["xc", "o_orderkey"], b, n_parts=n_parts
                ).collect()
            }
            assert got == want, f"b={b} limit={limit} n_parts={n_parts}"
    # descending order carried as a negated key must equal ntile DESC
    sub = scored.limit(253)
    wd = Window.orderBy(F.col("xc").desc(), "o_orderkey")
    want = {
        r["o_orderkey"]: r["bucket"]
        for r in sub.select(
            "o_orderkey", F.ntile(10).over(wd).alias("bucket")
        ).collect()
    }
    got = {
        r["o_orderkey"]: r["bucket"]
        for r in scale.global_ntile(
            sub.withColumn("negxc", -F.col("xc")),
            ["negxc", "o_orderkey"],
            10,
        ).collect()
    }
    assert got == want


def test_global_ntile_and_prefix_sums_empty_input(spark):
    """Empty frames flow through without error (no partials collected
    ⇒ zero offsets) and come back empty with the added columns."""
    empty = spark.createDataFrame([], "xc long, d1 long")
    out = scale.ordered_prefix_sums(empty, ["xc"], ["d1"], with_totals=True)
    assert out.count() == 0
    assert {"__cum_d1", "__tot_d1"} <= set(out.columns)
    out2 = scale.global_ntile(empty, ["xc"], 10)
    assert out2.count() == 0
    assert "bucket" in out2.columns


def test_ordered_prefix_sums_decimal_carrier(spark):
    """DECIMAL sum_type: distributed cumulative decimal sums are
    bit-identical to the window form (exact Decimal folding on the
    driver), including descending order via Column sort exprs; float
    carriers are refused."""
    import pytest
    from pyspark.sql import Window

    lineitem = lake.load_table(spark, "lineitem", SF_SMOKE).limit(800)
    rev = lineitem.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(25,6)"
            )
        ).alias("rev")
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r["l_partkey"]: r["cum"]
        for r in rev.select(
            "l_partkey", F.sum("rev").over(w).alias("cum")
        ).collect()
    }
    tot = rev.agg(F.sum("rev").alias("t")).first()["t"]
    out = scale.ordered_prefix_sums(
        rev,
        [F.col("rev").desc(), F.col("l_partkey")],
        ["rev"],
        n_parts=5,
        with_totals=True,
        sum_type="decimal(35,6)",
    ).collect()
    got = {r["l_partkey"]: r["__cum_rev"] for r in out}
    assert got == want
    assert all(r["__tot_rev"] == tot for r in out)
    with pytest.raises(ValueError, match="order-dependent"):
        scale.ordered_prefix_sums(rev, ["l_partkey"], ["rev"],
                                  sum_type="double")


def test_grouped_global_rank_n_groups_hint_paths(spark):
    """r07 review: both hint branches must be exercised — a hint under
    the cutoff runs the distributed offset scheme WITHOUT the
    approx_count_distinct pre-scan, a hint over it falls back to the
    plain window — and both match the no-hint result exactly."""
    from pyspark.sql import Window

    from end_end_data_pipeline__spark.operators.scale import grouped_global_rank

    df = (
        spark.range(0, 500)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 37 % 101).alias("v"),
            F.col("id"),
        )
        .repartition(5)
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: r["r"]
        for r in df.withColumn("r", F.row_number().over(w).cast("long")).collect()
    }
    for kwargs in (
        {"n_groups_hint": 3},          # trusted hint → offset scheme
        {"n_groups_hint": 10_000_000}, # over max_driver_groups → window
        {},                            # pre-scan estimate → offset scheme
    ):
        got = {
            r["id"]: r["r"]
            for r in grouped_global_rank(
                df, ["g"], ["v", "id"], **kwargs
            ).collect()
        }
        assert got == want, kwargs
