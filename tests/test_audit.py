"""Structural invariants of the audit/diagnostics queries
(``plans/queries_audit.py``) — the oracle-parity suite already proves
cross-engine hash equality; these check the MATH means what the
docstrings claim."""

from __future__ import annotations

import math

import pytest

from end_end_data_pipeline__spark.plans.catalog import load_all
from tests.conftest import SF_SMOKE

QUERIES = load_all()


def test_benford_shares_partition_unity(spark):
    rows = QUERIES["fraud_benford_digit_audit"].fn(spark, SF_SMOKE).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert math.isclose(sum(r["observed_share"] for r in rows), 1.0, rel_tol=1e-9)
    # expected shares are the Benford constants for the digits present
    for r in rows:
        assert math.isclose(
            r["expected_share"], math.log10(1 + 1 / r["digit"]), rel_tol=1e-12
        )
        assert r["chi2_cell"] >= 0.0


def test_hhi_bounds(spark):
    rows = QUERIES["market_hhi_concentration"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        n = r["n_suppliers"]
        # HHI of n shares lies in [1/n, 1]; top share in [1/n, 1]
        assert 1.0 / n - 1e-12 <= r["hhi"] <= 1.0 + 1e-12
        assert 1.0 / n - 1e-12 <= r["top_supplier_share"] <= 1.0 + 1e-12
        # HHI >= top_share^2 (one term of the sum)
        assert r["hhi"] >= r["top_supplier_share"] ** 2 - 1e-12


def test_seasonal_decompose_reconstructs(spark):
    rows = QUERIES["timeseries_seasonal_decompose"].fn(spark, SF_SMOKE).collect()
    full = [r for r in rows if r["trend"] is not None]
    assert full, "no full-window days in fixture"
    for r in full:
        assert math.isclose(
            r["trend"] + r["seasonal"] + r["remainder"],
            float(r["n_events"]),
            rel_tol=0,
            abs_tol=1e-9,
        )
    # seasonal component sums to ~0 across dows weighted by full-day counts
    per_type_dev = {}
    for r in full:
        per_type_dev.setdefault(r["event_type"], 0.0)
        per_type_dev[r["event_type"]] += float(r["n_events"]) - r["trend"]
    for et, dev_sum in per_type_dev.items():
        seas_sum = sum(
            r["seasonal"] for r in full if r["event_type"] == et
        )
        assert math.isclose(seas_sum, dev_sum, rel_tol=0, abs_tol=1e-6), et


def test_cusum_endpoints_and_peak(spark):
    rows = QUERIES["timeseries_cusum_changepoint"].fn(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        # C_N == 0 exactly (N*S - N*S)
        assert rs[-1]["cusum"] == 0.0, et
        peak = max(abs(r["cusum"]) for r in rs)
        for r in rs:
            # flat series (peak == 0) must flag nothing at all
            assert r["is_changepoint"] == (
                peak > 0 and abs(r["cusum"]) == peak
            ), et


def test_token_quality_ranges(spark):
    rows = (
        QUERIES["text_token_frequency_quality"].fn(spark, SF_SMOKE).collect()
    )
    assert rows
    for r in rows:
        assert 0.0 <= r["rare_frac"] <= 1.0
        # every token occurs at least once corpus-wide
        assert r["mean_token_count"] >= 1.0
        assert r["n_rare"] <= r["n_tokens"]


def test_assoc_rules_direction_pairing(spark):
    rows = (
        QUERIES["assoc_rules_brand_confidence"].fn(spark, SF_SMOKE).collect()
    )
    if not rows:
        pytest.skip("fixture below min pair support")
    idx = {(r["antecedent"], r["consequent"]): r for r in rows}
    for (a, b), r in idx.items():
        assert 0.0 < r["confidence"] <= 1.0
        rev = idx.get((b, a))
        assert rev is not None, "reverse rule missing"
        # symmetric quantities agree across directions
        assert rev["n_pair"] == r["n_pair"]
        assert math.isclose(rev["lift"], r["lift"], rel_tol=1e-12)
        assert math.isclose(rev["support"], r["support"], rel_tol=1e-12)


def test_equidepth_histogram_invariants(spark):
    rows = sorted(
        QUERIES["histogram_equidepth_order_value"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    counts = [r["n_orders"] for r in rows]
    # equal depth up to the n mod b remainder
    assert max(counts) - min(counts) <= 1
    # ntile hands the remainder to the FIRST buckets
    assert counts == sorted(counts, reverse=True)
    for a, b in zip(rows, rows[1:]):
        assert a["lo_value"] <= a["hi_value"] <= b["lo_value"]


def test_priority_sample_is_weighted_and_stable(spark):
    rows = (
        QUERIES["corpus_weighted_sample_priority"].fn(spark, SF_SMOKE).collect()
    )
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 101))
    for r in rows:
        assert r["priority"] >= r["weight"] > 0  # u <= 1 implies w/u >= w
    # pure function of ids: a second run returns the identical sample
    again = (
        QUERIES["corpus_weighted_sample_priority"].fn(spark, SF_SMOKE).collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_sequence_gaps_reconstruct(spark):
    """Present ids + reported gap ranges must tile [min, max] exactly."""
    from end_end_data_pipeline__spark.sources import lake

    ids = sorted(
        r["o_orderkey"]
        for r in lake.load_table(spark, "orders", SF_SMOKE)
        .select("o_orderkey")
        .collect()
    )
    gaps = QUERIES["integrity_sequence_gaps"].fn(spark, SF_SMOKE).collect()
    want = []
    for a, b in zip(ids, ids[1:]):
        if b > a + 1:
            want.append((a + 1, b - 1, b - a - 1))
    got = sorted((r["gap_start"], r["gap_end"], r["n_missing"]) for r in gaps)
    assert got == sorted(want)
    assert sum(g[2] for g in got) == (ids[-1] - ids[0] + 1) - len(ids)


def test_duplicate_payments_witnessed(spark):
    """Every flagged order must have an earlier same-customer
    same-amount order within the 3-day window."""
    from end_end_data_pipeline__spark.sources import lake

    orders = (
        lake.load_table(spark, "orders", SF_SMOKE)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .collect()
    )
    by_key: dict[tuple, list] = {}
    for r in orders:
        k = (r["o_custkey"], round(r["o_totalprice"] * 100))
        by_key.setdefault(k, []).append(
            (r["o_orderdate"].date(), r["o_orderkey"])
        )
    flagged = QUERIES["fraud_duplicate_payments"].fn(spark, SF_SMOKE).collect()
    for r in flagged:
        k = (r["o_custkey"], round(r["amount"] * 100))
        times = sorted(by_key[k])
        import datetime

        d = datetime.date.fromisoformat(r["order_date"])
        prev = max(
            (t for t in times if (t[0], t[1]) < (d, r["o_orderkey"])),
            default=None,
        )
        assert prev is not None
        assert (d - prev[0]).days == r["days_since_prev"] <= 3
