"""Targeted tests for the statistical operators (operators/stats.py,
operators/timeseries.ewma_lags, operators/graph.bfs_hops): the
guarantee arguments behind the catalog queries, checked against
sequential in-memory models.
"""

from __future__ import annotations

import random
from collections import Counter, deque
from decimal import Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.operators.graph import bfs_hops
from end_end_data_pipeline__spark.operators.stats import (
    heavy_hitters,
    misra_gries_candidates,
    quantized_covariance,
)
from end_end_data_pipeline__spark.operators.timeseries import ewma_lags


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _zipf_keys(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    # Zipf-ish: key i drawn with weight 1/(i+1)
    keys = [f"k{i}" for i in range(50)]
    weights = [1.0 / (i + 1) for i in range(50)]
    return rng.choices(keys, weights=weights, k=n)


@pytest.mark.parametrize("seed,k,n_parts", [(7, 10, 5), (11, 5, 3), (13, 20, 8)])
def test_heavy_hitters_equals_exact_groupby(spark, seed, k, n_parts):
    """The sketch-pruned result must equal GROUP BY/HAVING exactly,
    for any partitioning — the MG superset guarantee."""
    data = _zipf_keys(2000, seed)
    df = spark.createDataFrame([(x,) for x in data], "key string").repartition(
        n_parts
    )
    got = {
        (r["key"], r["freq"]) for r in heavy_hitters(df, "key", k).collect()
    }
    cnt = Counter(data)
    want = {(key, c) for key, c in cnt.items() if c * k > len(data)}
    assert got == want


def test_misra_gries_candidates_superset(spark):
    """Every true heavy hitter appears in the candidate set (the MG
    guarantee the exact pass relies on)."""
    data = _zipf_keys(3000, seed=3)
    k = 8
    df = spark.createDataFrame([(x,) for x in data], "key string").repartition(4)
    sk = misra_gries_candidates(df, "key", k).collect()
    cands = {r["key"] for r in sk if r["key"] is not None}
    n = sum(r["part_rows"] for r in sk if r["key"] is None)
    assert n == len(data)
    cnt = Counter(data)
    heavy = {key for key, c in cnt.items() if c * k > n}
    assert heavy <= cands


def test_heavy_hitters_k_validation(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="k must be"):
        misra_gries_candidates(df, "key", 0)


# ---------------------------------------------------------------------------
# Quantized covariance / PCA
# ---------------------------------------------------------------------------


def test_quantized_covariance_matches_numpy(spark):
    rng = np.random.default_rng(42)
    d, n, scale = 6, 400, 10_000
    # 0.25σ keeps |x·scale| inside the ±32767 clamp, so the raw-cov
    # error bound below reflects pure quantization, not clipping
    x = (0.25 * rng.normal(size=(n, d))).astype(np.float32)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in x], "embedding array<float>"
    ).repartition(4)
    rows = quantized_covariance(df, "embedding", scale=scale).collect()
    assert len(rows) == d * (d + 1) // 2
    got = np.zeros((d, d))
    for r in rows:
        got[r["i"], r["j"]] = got[r["j"], r["i"]] = r["cov"]
    q = np.clip(
        np.floor(x.astype(np.float64) * scale + 0.5), -32_767, 32_767
    )
    want_q = np.cov(q.T, bias=True) / (scale * scale)
    assert np.allclose(got, want_q, rtol=0, atol=1e-12)
    # quantization error vs the raw float covariance is bounded
    want_raw = np.cov(x.astype(np.float64).T, bias=True)
    assert np.abs(got - want_raw).max() < 1e-3


def test_pca_end_to_end(spark):
    """The standard big-data PCA split: distributed covariance →
    driver-local eigendecomposition → projection check."""
    rng = np.random.default_rng(7)
    d, n = 5, 500
    # anisotropic cloud: one dominant direction
    base = rng.normal(size=(n, 1)) @ np.array([[0.6, 0.2, 0.1, 0.02, 0.01]])
    x = (base + 0.02 * rng.normal(size=(n, d))).astype(np.float32)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in x], "embedding array<float>"
    ).repartition(3)
    rows = quantized_covariance(df, "embedding").collect()
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    evals, evecs = np.linalg.eigh(cov)
    assert evals.min() > -1e-9  # PSD up to quantization noise
    top = evecs[:, -1]
    proj = (x.astype(np.float64) - x.mean(axis=0)) @ top
    # variance captured by the top component equals its eigenvalue
    assert np.isclose(proj.var(), evals[-1], rtol=1e-2)
    # and it dominates, as constructed
    assert evals[-1] > 10 * evals[-2]


def test_quantized_covariance_empty_raises(spark):
    df = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="no rows"):
        quantized_covariance(df)


# ---------------------------------------------------------------------------
# BFS shortest paths
# ---------------------------------------------------------------------------


def _seq_bfs(edges: list[tuple[int, int]], source: int, max_hops: int):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {source: 0}
    dq = deque([source])
    while dq:
        u = dq.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


@pytest.mark.parametrize("seed", [1, 2])
def test_bfs_hops_matches_sequential(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(1, 40))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, source=1, max_hops=6).collect()}
    want = _seq_bfs(edges, 1, 6)
    assert got == want


def test_bfs_isolated_source(spark):
    df = spark.createDataFrame([(5, 6)], "src long, dst long")
    got = bfs_hops(df, source=1, max_hops=3).collect()
    assert [(r["node"], r["hops"]) for r in got] == [(1, 0)]


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_matches_sequential_model(spark):
    xs = [5, 8, 2, 0, 7, 3, 9, 4, 6, 1]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t int, x int")
    out = (
        df.select(
            "t", ewma_lags("x", "t", ["g"], decay="0.9", n_lags=8).alias("ewma")
        )
        .orderBy("t")
        .collect()
    )
    lam = Decimal("0.9")
    for r in out:
        t = r["t"]
        lags = [xs[t - i] for i in range(8) if t - i >= 0]
        num = sum((lam**i) * v for i, v in enumerate(lags))
        den = sum(lam**i for i in range(len(lags)))
        assert r["ewma"] == pytest.approx(float(num) / float(den), abs=1e-12)


def test_ewma_parameter_guards(spark):
    with pytest.raises(ValueError, match="decay"):
        ewma_lags("x", "t", [], decay="1.5")
    with pytest.raises(ValueError, match="n_lags"):
        ewma_lags("x", "t", [], n_lags=11)


def test_robust_median_mad_vs_python(spark):
    """Rank-exact median/MAD must equal the sequential definition."""
    import statistics

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from end_end_data_pipeline__spark.sources import lake
    from tests.conftest import SF_SMOKE

    rows = load_all()["robust_median_mad_by_priority"].fn(spark, SF_SMOKE).collect()
    orders = (
        lake.load_table(spark, "orders", SF_SMOKE)
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_pri: dict[str, list[float]] = {}
    for r in orders:
        by_pri.setdefault(r["o_orderpriority"], []).append(
            round(r["o_totalprice"] * 100)
        )
    assert {r["o_orderpriority"] for r in rows} == set(by_pri)
    for r in rows:
        xs = by_pri[r["o_orderpriority"]]
        med = statistics.median(xs)
        mad = statistics.median(abs(x - med) for x in xs)
        assert r["n_orders"] == len(xs)
        assert r["median_value"] == pytest.approx(med / 100.0, abs=1e-9)
        assert r["mad_value"] == pytest.approx(mad / 100.0, abs=1e-9)


def test_gini_bounds_and_known_values(spark):
    """Bounds AND a sequential-reference value check per nation (a
    wrong rank convention or a dropped +1 stays inside the bounds —
    only the reference catches it)."""
    from end_end_data_pipeline__spark.plans.catalog import load_all
    from end_end_data_pipeline__spark.sources import lake
    from tests.conftest import SF_SMOKE

    rows = load_all()["inequality_gini_by_nation"].fn(spark, SF_SMOKE).collect()
    assert rows
    orders = lake.load_table(spark, "orders", SF_SMOKE)
    customer = lake.load_table(spark, "customer", SF_SMOKE)
    nation = lake.load_table(spark, "nation", SF_SMOKE)
    per_cust = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "o_totalprice")
        .collect()
    )
    rev: dict[str, dict[int, int]] = {}
    for r in per_cust:
        rev.setdefault(r["n_name"], {}).setdefault(r["c_custkey"], 0)
        rev[r["n_name"]][r["c_custkey"]] += round(r["o_totalprice"] * 100)
    for r in rows:
        xs = sorted(rev[r["nation"]].values())
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        want = (2 * six - (n + 1) * sx) / (n * sx)
        assert r["n_customers"] == n
        assert r["gini"] == pytest.approx(want, abs=1e-12), r["nation"]
        assert 0.0 <= r["gini"] < 1.0, r
        assert r["gini"] <= (n - 1) / n + 1e-12


def test_trimmed_mean_between_bounds(spark):
    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    rows = (
        load_all()["robust_trimmed_mean_order_value"].fn(spark, SF_SMOKE).collect()
    )
    assert rows
    for r in rows:
        # trimming both tails by the same count keeps the mean finite
        # and cannot move it outside the untrimmed min/max envelope;
        # with symmetric trim counts it stays close to the plain mean
        assert r["trimmed_mean_value"] > 0
        assert abs(r["trimmed_mean_value"] - r["mean_value"]) < r["mean_value"]


def test_iqr_fence_vs_python(spark):
    """Rank-picked quartiles and the outlier census must equal the
    sequential type-1-quantile definition."""
    import math

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from end_end_data_pipeline__spark.sources import lake
    from tests.conftest import SF_SMOKE

    rows = load_all()["robust_iqr_fence_outliers"].fn(spark, SF_SMOKE).collect()
    orders = (
        lake.load_table(spark, "orders", SF_SMOKE)
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_pri: dict[str, list[int]] = {}
    for r in orders:
        by_pri.setdefault(r["o_orderpriority"], []).append(
            round(r["o_totalprice"] * 100)
        )
    assert {r["o_orderpriority"] for r in rows} == set(by_pri)
    for r in rows:
        xs = sorted(by_pri[r["o_orderpriority"]])
        n = len(xs)
        q1 = xs[math.ceil(n / 4) - 1]
        q3 = xs[math.ceil(3 * n / 4) - 1]
        fence = q3 + 1.5 * (q3 - q1)
        assert r["n_orders"] == n
        assert r["q1_value"] == pytest.approx(q1 / 100.0, abs=1e-9)
        assert r["q3_value"] == pytest.approx(q3 / 100.0, abs=1e-9)
        assert r["upper_fence"] == pytest.approx(fence / 100.0, abs=1e-9)
        assert r["n_outliers"] == sum(1 for x in xs if x > fence)
        assert r["q1_value"] <= r["q3_value"] <= r["upper_fence"]


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    """The Poisson-bootstrap CI must bracket the exact mean, and the
    whole result must be a pure function of the data (identical on
    re-run — hash-derived weights, no RNG)."""
    from end_end_data_pipeline__spark.plans.queries_stats import (
        stats_bootstrap_ci_order_value,
    )
    from tests.conftest import SF_SMOKE

    r1 = stats_bootstrap_ci_order_value(spark, SF_SMOKE).collect()[0]
    r2 = stats_bootstrap_ci_order_value(spark, SF_SMOKE).collect()[0]
    assert r1 == r2
    assert r1["ci_lo_cents"] <= r1["mean_cents"] <= r1["ci_hi_cents"]
    # the interval is meaningfully tight at n ~ 1.5k (sigma/sqrt(n))
    assert (r1["ci_hi_cents"] - r1["ci_lo_cents"]) < r1["mean_cents"]


def test_ks_two_sample_extremes(spark):
    """KS statistic sanity at the extremes: identical samples give
    D = 0 / no rejection; disjoint supports give D = 1 (1e6 ppm) and a
    rejection at any reasonable n."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    def ks(df):
        per_v = df.groupBy("xc").agg(
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("long").alias("d1"),
            F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).cast("long").alias("d2"),
        )
        w = Window.orderBy("xc").rowsBetween(Window.unboundedPreceding, 0)
        cum = per_v.select(
            F.sum("d1").over(w).alias("c1"), F.sum("d2").over(w).alias("c2")
        )
        full = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        stats = cum.select(
            "c1", "c2",
            F.max("c1").over(full).alias("n1"),
            F.max("c2").over(full).alias("n2"),
        ).agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.max(F.abs(F.col("n2") * F.col("c1") - F.col("n1") * F.col("c2")))
            .cast("long").alias("d_num"),
        )
        return stats.select(
            F.expr("CAST(d_num * 1000000 DIV (n1 * n2) AS BIGINT)").alias("d_ppm"),
            F.expr(
                "CAST(d_num AS DECIMAL(38,0)) * CAST(d_num AS DECIMAL(38,0)) * 10000"
                " > CAST(18442 AS DECIMAL(38,0)) * n1 * n2 * (n1 + n2)"
            ).alias("reject_5pct"),
        ).collect()[0]

    same = spark.createDataFrame(
        [(v, s) for v in range(100) for s in (1, 2)], "xc long, s int"
    )
    r = ks(same)
    assert r["d_ppm"] == 0 and not r["reject_5pct"]

    disjoint = spark.createDataFrame(
        [(v, 1) for v in range(100)] + [(v + 1000, 2) for v in range(100)],
        "xc long, s int",
    )
    r = ks(disjoint)
    assert r["d_ppm"] == 1_000_000 and r["reject_5pct"]


# ---------------------------------------------------------------------------
# round-6 ML-eval / timeseries wave: brute-force cross-checks
# ---------------------------------------------------------------------------


def _fixture_df(table, cols):
    import duckdb

    from tests.conftest import SF_SMOKE

    return duckdb.sql(
        f"SELECT {cols} FROM '{SF_SMOKE}/{table}.parquet'"
    ).df()


def _daily_cents():
    import duckdb

    from tests.conftest import SF_SMOKE

    return duckdb.sql(
        "SELECT CAST(o_orderdate AS DATE) AS d,"
        " SUM(CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT)) AS x"
        f" FROM '{SF_SMOKE}/orders.parquet' GROUP BY 1"
    ).df()


def test_mannwhitney_auc_vs_numpy_bruteforce(spark):
    """u2_num from the distinct-value spine must equal the O(n1*n2)
    pairwise definition 2*(#{x1 > x2} + 0.5*#{x1 == x2})."""
    import numpy as np

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    row = (
        load_all()["stats_mannwhitney_auc"].fn(spark, SF_SMOKE).collect()[0]
    )
    pdf = _fixture_df(
        "orders",
        "CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT) AS xc,"
        " o_custkey",
    )
    cust = _fixture_df("customer", "c_custkey, c_mktsegment")
    m = pdf.merge(cust, left_on="o_custkey", right_on="c_custkey")
    x1 = m.loc[m.c_mktsegment == "BUILDING", "xc"].to_numpy()
    x2 = m.loc[m.c_mktsegment == "MACHINERY", "xc"].to_numpy()
    gt = int((x1[:, None] > x2[None, :]).sum())
    eq = int((x1[:, None] == x2[None, :]).sum())
    assert row["n1"] == len(x1) and row["n2"] == len(x2)
    assert row["u2_num"] == 2 * gt + eq
    assert row["auc_ppm"] == (2 * gt + eq) * 500000 // (len(x1) * len(x2))


def test_decile_lift_invariants(spark):
    """Deciles partition the population into near-equal cuts; gains are
    monotone; the full-population lift is exactly 1.0 (1e6 ppm)."""
    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    rows = load_all()["ml_decile_lift"].fn(spark, SF_SMOKE).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    gains = [r["gain_ppm"] for r in rows]
    assert gains == sorted(gains)
    assert rows[-1]["cum_lift_ppm"] == 1_000_000
    assert rows[-1]["gain_ppm"] == 1_000_000
    assert rows[-1]["cum_n"] == sum(sizes)


def test_interval_peak_concurrency_vs_python_sweep(spark):
    """Peak and argmax-day per nation must match a per-day occupancy
    dict built row-at-a-time in Python."""
    from collections import Counter, defaultdict
    from datetime import timedelta

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["nation"]: (r["peak_in_transit"], r["peak_first_day"], r["n_shipments"])
        for r in load_all()["interval_peak_concurrency"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    li = _fixture_df(
        "lineitem",
        "l_orderkey, l_linenumber, l_suppkey, CAST(l_shipdate AS DATE) AS sd",
    )
    sup = _fixture_df("supplier", "s_suppkey, s_nationkey")
    nat = _fixture_df("nation", "n_nationkey, n_name")
    m = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    occ: dict = defaultdict(Counter)
    n_ship: Counter = Counter()
    for r in m.itertuples():
        transit = int(r.l_orderkey * 3 + r.l_linenumber) % 14 + 1
        n_ship[r.n_name] += 1
        for k in range(transit):
            occ[r.n_name][r.sd + timedelta(days=k)] += 1
    for nation, days in occ.items():
        peak = max(days.values())
        first = min(d for d, c in days.items() if c == peak)
        assert got[nation] == (peak, first.strftime("%Y-%m-%d"), n_ship[nation]), nation


def test_seasonal_naive_error_vs_pandas(spark):
    """Monthly MAE/sMAPE must match a pandas lag-7 reindex join."""
    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["month"]: (r["n_days"], r["sum_abs_err_cents"], r["mae_cents"], r["smape_ppm"])
        for r in load_all()["forecast_seasonal_naive_error"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    daily = _daily_cents()
    by_day = {r.d: int(r.x) for r in daily.itertuples()}
    from collections import defaultdict
    from datetime import timedelta

    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_abs, sum_smape
    for d, a in by_day.items():
        f = by_day.get(d - timedelta(days=7))
        if f is None:
            continue
        month = d.strftime("%Y-%m")
        agg[month][0] += 1
        agg[month][1] += abs(a - f)
        agg[month][2] += abs(a - f) * 2_000_000 // (a + f)
    want = {
        m: (n, s, s // n, sm // n) for m, (n, s, sm) in agg.items()
    }
    assert got == want


def test_acf_lags_bounds_and_bruteforce(spark):
    """|acf| <= 1e6 ppm at every lag (Cauchy-Schwarz on subset sums);
    lag-1 and lag-7 numerators match exact-int Python."""
    from datetime import timedelta

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    rows = load_all()["timeseries_acf_lags"].fn(spark, SF_SMOKE).collect()
    assert [r["lag"] for r in rows] == list(range(1, 15))
    assert all(abs(r["acf_ppm"]) <= 1_000_000 for r in rows)
    daily = _daily_cents()
    xs = {r.d: int(r.x) for r in daily.itertuples()}
    n, s = len(xs), sum(xs.values())
    dv = {d: n * x - s for d, x in xs.items()}
    den = sum(v * v for v in dv.values())
    for lag in (1, 7):
        num = sum(
            v * dv[d - timedelta(days=lag)]
            for d, v in dv.items()
            if d - timedelta(days=lag) in dv
        )
        r = next(r for r in rows if r["lag"] == lag)
        # trunc-toward-zero division on both engines:
        q = abs(num) * 1_000_000 // den
        assert r["acf_ppm"] == (q if num >= 0 else -q)


def test_control_chart_xmr_vs_python(spark):
    """Limit and run signals must match an exact-int Python replay."""
    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = [
        (r["day"], r["cents"], r["signal"])
        for r in load_all()["control_chart_xmr_signals"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    daily = _daily_cents()
    series = sorted((r.d, int(r.x)) for r in daily.itertuples())
    xs = [x for _, x in series]
    n, sx = len(xs), sum(xs)
    smr = sum(abs(a - b) for a, b in zip(xs[1:], xs))
    want = []
    for (d, x) in series:
        if 100 * (n - 1) * abs(n * x - sx) > 266 * n * smr:
            want.append(
                (d.strftime("%Y-%m-%d"), x,
                 "limit_above" if n * x > sx else "limit_below")
            )
    above = [1 if n * x > sx else 0 for x in xs]
    for i in range(7, len(xs)):
        s8 = sum(above[i - 7 : i + 1])
        if s8 in (0, 8):
            d, x = series[i]
            want.append(
                (d.strftime("%Y-%m-%d"), x,
                 "run8_above" if s8 == 8 else "run8_below")
            )
    assert got == sorted(want)


def test_centroid_classifier_vs_numpy(spark):
    """Confusion cells must match an int64 numpy replay of the
    fixed-point centroid assignment."""
    import duckdb
    import numpy as np

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        (r["label"], r["pred"]): (r["n_cell"], r["member_id_sum"])
        for r in load_all()["embedding_centroid_classifier_eval"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    pdf = duckdb.sql(
        "SELECT vec_id, label, embedding"
        f" FROM '{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    vecs = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    q = np.floor(vecs * 1_000_000).astype(np.int64)
    labels = pdf.label.to_numpy().astype(np.int64)
    ids = pdf.vec_id.to_numpy().astype(np.int64)
    uniq = np.sort(np.unique(labels))
    cents = []
    for lbl in uniq:
        s = q[labels == lbl].sum(axis=0)
        cnt = int((labels == lbl).sum())
        cents.append((s + cnt * 1_000_000) // cnt - 1_000_000)
    cents = np.stack(cents)  # (L, dim) exact floor means
    # exact int64 distances: (n, L)
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    pred = uniq[d.argmin(axis=1)]  # argmin ties -> first = smallest label
    want = {}
    for lbl, pr, vid in zip(labels, pred, ids):
        n, s = want.get((lbl, pr), (0, 0))
        want[(int(lbl), int(pr))] = (n + 1, s + int(vid))
    assert got == want
    assert sum(n for n, _ in got.values()) == len(ids)


def test_longest_streak_vs_python(spark):
    """Streak table must match a plain-Python consecutive-run scan."""
    import duckdb

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["user_id"]: (r["n_active_days"], r["longest_streak"], r["streak_start"])
        for r in load_all()["streaks_longest_active_run"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    pdf = duckdb.sql(
        "SELECT DISTINCT user_id, CAST(ts AS DATE) AS d"
        f" FROM '{SF_SMOKE}/events.parquet' ORDER BY user_id, d"
    ).df()
    from collections import defaultdict
    from datetime import timedelta

    by_user = defaultdict(list)
    for r in pdf.itertuples():
        by_user[int(r.user_id)].append(r.d)
    want = {}
    for uid, days in by_user.items():
        best_len, best_start = 0, None
        run_len, run_start = 0, None
        prev = None
        for d in days:
            if prev is not None and d == prev + timedelta(days=1):
                run_len += 1
            else:
                run_len, run_start = 1, d
            if run_len > best_len:
                best_len, best_start = run_len, run_start
            prev = d
        want[uid] = (len(days), best_len, best_start.strftime("%Y-%m-%d"))
    assert got == want


def test_rolling_median_vs_python(spark):
    """Doubled rolling medians must match sorted-window Python."""
    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = [
        (r["day"], r["cents"], r["n_win"], r["med2_cents"])
        for r in load_all()["timeseries_rolling_median_7d"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    daily = _daily_cents()
    series = sorted((r.d, int(r.x)) for r in daily.itertuples())
    want = []
    for i, (d, x) in enumerate(series):
        w = sorted(x2 for _, x2 in series[max(0, i - 6) : i + 1])
        n = len(w)
        med2 = w[(n + 1) // 2 - 1] + w[n // 2]
        want.append((d.strftime("%Y-%m-%d"), x, n, med2))
    assert got == want


def test_interval_overlap_pairs_vs_python(spark):
    """Bucketed overlap join must equal the O(n²)-per-supplier brute
    force: every qualifying pair exactly once, overlaps exact."""
    from collections import defaultdict
    from datetime import timedelta

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["s_suppkey"]: (r["n_pairs"], r["max_overlap_days"], r["total_overlap_days"])
        for r in load_all()["interval_overlap_concurrent_shipments"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    li = _fixture_df(
        "lineitem",
        "l_suppkey, l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS sd",
    )
    by_sup = defaultdict(list)
    for r in li.itertuples():
        transit = int(r.l_orderkey * 3 + r.l_linenumber) % 14 + 1
        by_sup[int(r.l_suppkey)].append((r.sd, r.sd + timedelta(days=transit)))
    want = {}
    for sk, ivs in by_sup.items():
        ovs = []
        for i in range(len(ivs)):
            for j in range(i + 1, len(ivs)):
                (s1, e1), (s2, e2) = ivs[i], ivs[j]
                if s1 < e2 and s2 < e1:
                    ovs.append((min(e1, e2) - max(s1, s2)).days)
        if ovs:
            want[sk] = (len(ovs), max(ovs), sum(ovs))
    assert got == want


def test_interval_union_coverage_vs_python(spark):
    """Union measure must equal a day-set size built interval by
    interval."""
    from collections import defaultdict
    from datetime import timedelta

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["s_suppkey"]: (r["covered_days"], r["span_days"], r["utilization_ppm"])
        for r in load_all()["interval_union_coverage_days"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    li = _fixture_df(
        "lineitem",
        "l_suppkey, l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS sd",
    )
    days = defaultdict(set)
    bounds = {}
    for r in li.itertuples():
        sk = int(r.l_suppkey)
        transit = int(r.l_orderkey * 3 + r.l_linenumber) % 14 + 1
        end = r.sd + timedelta(days=transit)
        for k in range(transit):
            days[sk].add(r.sd + timedelta(days=k))
        lo, hi = bounds.get(sk, (r.sd, end))
        bounds[sk] = (min(lo, r.sd), max(hi, end))
    want = {}
    for sk, ds in days.items():
        lo, hi = bounds[sk]
        span = (hi - lo).days
        want[sk] = (len(ds), span, len(ds) * 1_000_000 // span)
    assert got == want


def test_conformal_threshold_vs_python(spark):
    """Per-segment thresholds and coverage must match an exact-int
    Python replay; coverage should sit near the nominal 90%."""
    import hashlib

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["segment"]: (r["n_cal"], r["n_test"], r["threshold"], r["coverage_ppm"])
        for r in load_all()["ml_conformal_threshold"].fn(spark, SF_SMOKE).collect()
    }
    pdf = _fixture_df(
        "orders",
        "o_orderkey, o_custkey,"
        " CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT) AS xc",
    )
    cust = _fixture_df("customer", "c_custkey, c_mktsegment")
    m = pdf.merge(cust, left_on="o_custkey", right_on="c_custkey")
    from collections import defaultdict

    cal = defaultdict(list)
    test = defaultdict(list)
    stats = defaultdict(lambda: [0, 0])
    rows = [
        (int(r.o_orderkey), r.c_mktsegment, int(r.xc)) for r in m.itertuples()
    ]
    for okey, seg, xc in rows:
        fold = int(hashlib.md5(str(okey).encode()).hexdigest()[:8], 16) % 2
        if fold == 0:
            stats[seg][0] += 1
            stats[seg][1] += xc
    for okey, seg, xc in rows:
        n, s = stats[seg]
        fold = int(hashlib.md5(str(okey).encode()).hexdigest()[:8], 16) % 2
        (cal if fold == 0 else test)[seg].append((abs(n * xc - s), okey))
    for seg in stats:
        n, _ = stats[seg]
        k = (n * 9 + 9) // 10
        thr = sorted(cal[seg])[k - 1][0]
        n_test = len(test[seg])
        cov = sum(1 for sc, _ in test[seg] if sc <= thr) * 1_000_000 // n_test
        assert got[seg] == (n, n_test, thr, cov)
        assert 800_000 < cov < 1_000_000  # near nominal 90%


def test_weighted_median_vs_python(spark):
    """Doubled weighted medians must match a sequential cumulative-
    weight scan."""
    from collections import defaultdict

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["grp"]: (r["total_weight"], r["wmed2_cents"])
        for r in load_all()["robust_weighted_median_value"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    li = _fixture_df(
        "lineitem",
        "l_returnflag AS grp,"
        " CAST(CAST(l_extendedprice AS DECIMAL(13,2)) * 100 AS BIGINT) AS v,"
        " CAST(CAST(l_quantity AS DECIMAL(12,0)) AS BIGINT) AS w",
    )
    groups = defaultdict(lambda: defaultdict(int))
    for r in li.itertuples():
        groups[r.grp][int(r.v)] += int(r.w)
    for grp, byv in groups.items():
        tw = sum(byv.values())
        cw = 0
        m_lo = m_hi = None
        for v in sorted(byv):
            cw += byv[v]
            if m_lo is None and 2 * cw >= tw:
                m_lo = v
            if m_hi is None and 2 * cw > tw:
                m_hi = v
        assert got[grp] == (tw, m_lo + m_hi), grp


def test_growth_mom_yoy_vs_python(spark):
    """Growth ppm columns must match a dict-based month-ordinal join,
    including NULLs for missing periods."""
    import duckdb

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        r["month"]: (r["cents"], r["mom_ppm"], r["yoy_ppm"])
        for r in load_all()["growth_mom_yoy_revenue"].fn(spark, SF_SMOKE).collect()
    }
    pdf = duckdb.sql(
        "SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)),"
        " '%Y-%m') AS month,"
        " SUM(CAST(CAST(o_totalprice AS DECIMAL(13,2)) * 100 AS BIGINT))"
        " AS cents"
        f" FROM '{SF_SMOKE}/orders.parquet' GROUP BY 1"
    ).df()
    cents = {r.month: int(r.cents) for r in pdf.itertuples()}

    def shift(month, k):
        y, m = int(month[:4]), int(month[5:])
        mo = y * 12 + m - 1 - k
        return f"{mo // 12:04d}-{mo % 12 + 1:02d}"

    def tdiv(a, b):
        q = abs(a) * 1_000_000 // b
        return q if a >= 0 else -q

    for month, c in cents.items():
        p1, p12 = cents.get(shift(month, 1)), cents.get(shift(month, 12))
        mom = tdiv(c - p1, p1) if p1 else None
        yoy = tdiv(c - p12, p12) if p12 else None
        assert got[month] == (c, mom, yoy), month


def test_link_prediction_vs_python(spark):
    """Top-50 predicted links must match a dict-based wedge count."""
    from collections import defaultdict

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = [
        (r["u"], r["v"], r["common_neighbors"], r["deg_u"], r["deg_v"],
         r["jaccard_ppm"])
        for r in load_all()["graph_link_prediction_jaccard"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    orders = _fixture_df("orders", "o_orderkey, o_custkey")
    cust = _fixture_df("customer", "c_custkey")
    mx = int(cust.c_custkey.max())
    edges = set()
    for r in orders.itertuples():
        if int(r.o_orderkey) % 23 == 0:
            s, d = int(r.o_custkey), int(r.o_orderkey) % mx + 1
            if s != d:
                edges.add((min(s, d), max(s, d)))
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    cand = defaultdict(int)
    for n, xs in nbrs.items():
        xs = sorted(xs)
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                cand[(xs[i], xs[j])] += 1
    scored = [
        (u, v, cn, len(nbrs[u]), len(nbrs[v]),
         cn * 1_000_000 // (len(nbrs[u]) + len(nbrs[v]) - cn))
        for (u, v), cn in cand.items()
        if (u, v) not in edges
    ]
    want = sorted(scored, key=lambda t: (-t[5], -t[2], t[0], t[1]))[:50]
    assert got == want


def test_cohort_ltv_vs_python(spark):
    """LTV grid must match a dict replay of weekly cohort revenue."""
    import duckdb
    from collections import defaultdict

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = {
        (r["cohort_week"], r["age_wk"]): (
            r["n_users"], r["cents"], r["cum_cents"], r["cum_cents_per_user"]
        )
        for r in load_all()["cohort_ltv_curve"].fn(spark, SF_SMOKE).collect()
    }
    pdf = duckdb.sql(
        "SELECT user_id, event_type, date_trunc('week', ts) AS wk,"
        " CAST(CAST(value AS DECIMAL(13,2)) * 100 AS BIGINT) AS cents"
        f" FROM '{SF_SMOKE}/events.parquet'"
    ).df()
    first_wk = {}
    for r in pdf.itertuples():
        uid = int(r.user_id)
        if uid not in first_wk or r.wk < first_wk[uid]:
            first_wk[uid] = r.wk
    size = defaultdict(int)
    for wk in first_wk.values():
        size[wk] += 1
    rev = defaultdict(int)
    for r in pdf.itertuples():
        if r.event_type != "purchase":
            continue
        cw = first_wk[int(r.user_id)]
        age = (r.wk - cw).days // 7
        rev[(cw, age)] += int(r.cents)
    cum = {}
    for (cw, age) in sorted(rev):
        prev = cum.get((cw, age - 1))
        run = rev[(cw, age)] + (prev if prev is not None else 0)
        # carry forward over gaps in age
        back = age - 1
        if prev is None:
            run = rev[(cw, age)]
            while back >= 0:
                if (cw, back) in cum:
                    run += cum[(cw, back)]
                    break
                back -= 1
        cum[(cw, age)] = run
    want = {}
    for (cw, age), cents in rev.items():
        n = size[cw]
        want[(cw.strftime("%Y-%m-%d"), age)] = (
            n, cents, cum[(cw, age)], cum[(cw, age)] // n
        )
    assert got == want


def test_burstiness_vs_python(spark):
    """Top-25 Fano factors must match an exact-int Python replay."""
    import duckdb

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from tests.conftest import SF_SMOKE

    got = [
        (r["user_id"], r["n_gaps"], r["mean_gap_sec"], r["fano_scaled"])
        for r in load_all()["behavior_interarrival_burstiness"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    pdf = duckdb.sql(
        "SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts"
        f" FROM '{SF_SMOKE}/events.parquet' ORDER BY user_id, ts, event_id"
    ).df()
    from collections import defaultdict

    seq = defaultdict(list)
    for r in pdf.itertuples():
        # whole-second epoch per timestamp FIRST (both engines truncate
        # each side before subtracting), then difference
        seq[int(r.user_id)].append(int(r.ts.value) // 10**9)
    scored = []
    for uid, times in seq.items():
        gaps = [b - a for a, b in zip(times, times[1:])]
        n, s = len(gaps), sum(gaps)
        if n < 10 or s <= 0:
            continue
        s2 = sum(g * g for g in gaps)
        scored.append(
            (uid, n, s // n, (n * s2 - s * s) * 1_000_000 // ((n - 1) * s))
        )
    want = sorted(scored, key=lambda t: (-t[3], t[0]))[:25]
    assert got == want


@pytest.mark.parametrize("seed,k", [(7, 10), (11, 5)])
def test_heavy_hitters_hint_path_equals_mg_path(spark, seed, k):
    """r07: the n_keys_hint single-pass path must return the exact
    same heavy-hitter set as the two-pass MG path (and as exact
    GROUP BY/HAVING); a hint above the 100k cutoff falls through to
    the MG shape."""
    data = _zipf_keys(2000, seed)
    df = spark.createDataFrame([(x,) for x in data], "key string").repartition(4)
    cnt = Counter(data)
    want = {(key, c) for key, c in cnt.items() if c * k > len(data)}
    hinted = {
        (r["key"], r["freq"])
        for r in heavy_hitters(df, "key", k, n_keys_hint=50).collect()
    }
    assert hinted == want
    big_hint = {
        (r["key"], r["freq"])
        for r in heavy_hitters(df, "key", k, n_keys_hint=200_000).collect()
    }
    assert big_hint == want


def test_heavy_hitters_null_keys_both_paths(spark):
    """NULL keys count toward the row total on both paths but are
    never reported as heavy hitters — without the hint path's explicit
    NULL filter, a NULL-majority frame returned (NULL, freq) from one
    path and nothing from the other (review r07)."""
    # 12 NULLs, 6 'a', 2 'b' → with k=3 the threshold is freq·3 > 20:
    # NULL (36>20) would qualify if reportable; 'a' (18>20) must NOT
    # qualify — proving NULLs still inflate the denominator
    data = [(None,)] * 12 + [("a",)] * 6 + [("b",)] * 2
    df = spark.createDataFrame(data, "key string").repartition(3)
    for kwargs in ({"n_keys_hint": 3}, {}):
        got = {
            (r["key"], r["freq"])
            for r in heavy_hitters(df, "key", 3, **kwargs).collect()
        }
        assert got == set(), (kwargs, got)
    # sanity: a non-null key over the NULL-inflated threshold reports
    data2 = [(None,)] * 4 + [("a",)] * 12 + [("b",)] * 4
    df2 = spark.createDataFrame(data2, "key string").repartition(3)
    for kwargs in ({"n_keys_hint": 3}, {}):
        got = {
            (r["key"], r["freq"])
            for r in heavy_hitters(df2, "key", 3, **kwargs).collect()
        }
        assert got == {("a", 12)}, (kwargs, got)


def test_interval_overlap_salting_bit_identical(spark):
    """r08 (VERDICT r07 task 4): the opt-in hot-bucket salt on the
    interval-overlap join must be a pure physical rewrite — every pair
    still forms exactly once (each B row keeps one xxhash64%s salt and
    exactly one of the s A-replicas matches it), so the rollup is
    bit-identical to the unsalted plan for any salt_factor.  Covers
    same-month, adjacent-month and within-group (multiplicity) pairs."""
    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.plans.queries_stats import (
        interval_overlap_rollup,
    )

    iv = spark.range(600).select(
        (F.pmod(F.col("id"), F.lit(7)) + 1).alias("sk"),
        F.timestamp_seconds(
            F.lit(1706745600)  # 2024-02-01
            + F.pmod(F.col("id") * 9973, F.lit(56 * 86400))  # Feb+Mar spread
        ).alias("s"),
        F.timestamp_seconds(
            F.lit(1706745600)
            + F.pmod(F.col("id") * 9973, F.lit(56 * 86400))
            + 3600 + F.pmod(F.col("id") * 31, F.lit(5 * 86400))
        ).alias("e"),
    )
    # inject multiplicity: duplicate a slice of rows verbatim
    iv = iv.unionByName(iv.filter(F.pmod(F.col("id"), F.lit(5)) == 0))

    base = sorted(tuple(r) for r in interval_overlap_rollup(iv, 1).collect())
    assert base, "fixture produced no overlap pairs"
    for s in (3, 8):
        got = sorted(tuple(r) for r in interval_overlap_rollup(iv, s).collect())
        assert got == base, f"salt_factor={s} diverged"
