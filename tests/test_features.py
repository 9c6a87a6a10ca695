"""Brute-force cross-checks for the feature-engineering catalog
queries (hashing trick, LOO/smoothed target encoding, group-aware
split) — independent Python replays beyond the DuckDB oracle parity.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from end_end_data_pipeline__spark.plans.catalog import load_all
from tests.conftest import SF_SMOKE


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_hashing_trick_vs_python(spark):
    got = {
        (r["c_custkey"], r["bucket"]): r["val"]
        for r in load_all()["features_hashing_trick"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    cust = duckdb.sql(
        "SELECT c_custkey, c_mktsegment, n_name"
        f" FROM '{SF_SMOKE}/customer.parquet' c"
        f" JOIN '{SF_SMOKE}/nation.parquet' n"
        " ON c.c_nationkey = n.n_nationkey"
    ).df()
    pri = duckdb.sql(
        "SELECT o_custkey, o_orderpriority, COUNT(*) AS w"
        f" FROM '{SF_SMOKE}/orders.parquet' GROUP BY 1, 2"
    ).df()
    feats = defaultdict(int)
    for r in cust.itertuples():
        for feat, w in ((f"n={r.n_name}", 1), (f"s={r.c_mktsegment}", 1)):
            h = _u32(feat)
            sign = 1 if (h // 16) % 2 == 0 else -1
            feats[(int(r.c_custkey), h % 16)] += sign * w
    for r in pri.itertuples():
        h = _u32(f"p={r.o_orderpriority}")
        sign = 1 if (h // 16) % 2 == 0 else -1
        feats[(int(r.o_custkey), h % 16)] += sign * int(r.w)
    want = {k: v for k, v in feats.items() if True}
    assert got == want


def test_target_encoding_loo_vs_python(spark):
    rows = (
        load_all()["features_target_encoding_loo"].fn(spark, SF_SMOKE).collect()
    )
    pdf = duckdb.sql(
        "SELECT o_orderkey, c_mktsegment AS segment,"
        " CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS label"
        f" FROM '{SF_SMOKE}/orders.parquet' o"
        f" JOIN '{SF_SMOKE}/customer.parquet' c ON o.o_custkey = c.c_custkey"
    ).df()
    n = defaultdict(int)
    pos = defaultdict(int)
    for r in pdf.itertuples():
        n[r.segment] += 1
        pos[r.segment] += int(r.label)
    by_key = {int(r.o_orderkey): (r.segment, int(r.label)) for r in pdf.itertuples()}
    assert len(rows) == len(by_key)
    for r in rows:
        seg, label = by_key[r["o_orderkey"]]
        assert r["segment"] == seg and r["label"] == label
        assert r["te_loo_ppm"] == (pos[seg] - label) * 1_000_000 // (n[seg] - 1)
        assert r["te_smooth_ppm"] == (
            (pos[seg] * 1_000_000 + 20 * 500_000) // (n[seg] + 20)
        )
        # the smoothed encoding sits between the prior and the raw mean
        raw = pos[seg] * 1_000_000 // n[seg]
        lo, hi = sorted((raw, 500_000))
        assert lo - 1 <= r["te_smooth_ppm"] <= hi + 1


def test_groupwise_split_partitions_customers(spark):
    rows = load_all()["corpus_groupwise_split"].fn(spark, SF_SMOKE).collect()
    pdf = duckdb.sql(
        "SELECT o_orderkey, o_custkey,"
        " CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT) AS cents"
        f" FROM '{SF_SMOKE}/orders.parquet'"
    ).df()
    agg = defaultdict(lambda: [set(), 0, 0, 0])
    for r in pdf.itertuples():
        fold = _u32(str(int(r.o_custkey))) % 5
        a = agg[fold]
        a[0].add(int(r.o_custkey))
        a[1] += 1
        a[2] += int(r.cents)
        a[3] += int(r.o_orderkey)
    got = {
        r["fold"]: (r["n_customers"], r["n_orders"], r["cents"], r["orderkey_checksum"])
        for r in rows
    }
    want = {f: (len(a[0]), a[1], a[2], a[3]) for f, a in agg.items()}
    assert got == want
    # the folds PARTITION the customer set (no group spans folds)
    all_cust = set().union(*(a[0] for a in agg.values()))
    assert sum(len(a[0]) for a in agg.values()) == len(all_cust)
