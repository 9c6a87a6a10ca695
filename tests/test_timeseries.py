"""Gap-fill / LOCF regularization (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from end_end_data_pipeline__spark.operators import timeseries


def test_gap_fill_densifies_zero_fills_and_carries(spark):
    d = dt.date
    rows = [
        # group "a": observed 1st, 3rd, 6th — gaps on 2nd, 4th, 5th
        ("a", d(2024, 1, 1), 2, 10.0),
        ("a", d(2024, 1, 3), 1, 30.0),
        ("a", d(2024, 1, 6), 4, 60.0),
        # group "b": single day — no gaps, span of one
        ("b", d(2024, 1, 9), 7, 99.0),
    ]
    daily = spark.createDataFrame(
        rows, "g string, d date, n long, total double"
    ).withColumn("carried", F.col("total"))
    out = timeseries.gap_fill(
        daily,
        group_cols=["g"],
        date_col="d",
        zero_fill={"n": 0, "total": 0.0},
        locf_cols=["carried"],
    )
    got = {
        (r["g"], str(r["d"])): (r["n"], r["total"], r["carried"], r["is_gap"])
        for r in out.collect()
    }
    assert len(got) == 6 + 1  # a: 6-day span, b: 1 day
    assert got[("a", "2024-01-01")] == (2, 10.0, 10.0, False)
    assert got[("a", "2024-01-02")] == (0, 0.0, 10.0, True)  # zero + LOCF
    assert got[("a", "2024-01-03")] == (1, 30.0, 30.0, False)
    assert got[("a", "2024-01-04")] == (0, 0.0, 30.0, True)
    assert got[("a", "2024-01-05")] == (0, 0.0, 30.0, True)
    assert got[("a", "2024-01-06")] == (4, 60.0, 60.0, False)
    assert got[("b", "2024-01-09")] == (7, 99.0, 99.0, False)
    # spans start at an observed date -> no leading gap, LOCF never null
    assert all(v[2] is not None for v in got.values())


def test_pagerank_invariants(spark):
    """Power-method invariants on a hand graph: rank mass ~1 every
    iteration (dangling mass redistributed, not lost), a sink fed by
    everyone outranks its feeders, and symmetric nodes tie exactly."""
    from end_end_data_pipeline__spark.operators.graph import pagerank

    # 1->3, 2->3, 3 dangling; 4<->5 symmetric pair
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (4, 5), (5, 4)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out[3] > out[1] and out[3] > out[2]
    assert out[1] == out[2]  # symmetric sources tie exactly
    assert out[4] == out[5]  # 2-cycle ties exactly


def test_gap_fill_preserves_observed_nulls(spark):
    """An observed row's genuine NULL measurement survives: zero_fill
    touches gap rows only, and LOCF never rewrites an observed value."""
    import datetime as dt

    d = dt.date
    daily = spark.createDataFrame(
        [("a", d(2024, 1, 1), 2, 10.0),
         ("a", d(2024, 1, 2), None, None),   # observed, value unknown
         ("a", d(2024, 1, 4), 1, 40.0)],
        "g string, d date, n long, total double",
    ).withColumn("carried", F.col("total"))
    out = {
        str(r["d"]): (r["n"], r["total"], r["carried"], r["is_gap"])
        for r in timeseries.gap_fill(
            daily, ["g"], "d",
            zero_fill={"n": 0, "total": 0.0}, locf_cols=["carried"],
        ).collect()
    }
    assert out["2024-01-01"] == (2, 10.0, 10.0, False)
    # observed NULL stays NULL — not coalesced, not LOCF-overwritten
    assert out["2024-01-02"] == (None, None, None, False)
    # the gap carries the last NON-NULL observed value (Jan 1's)
    assert out["2024-01-03"] == (0, 0.0, 10.0, True)
    assert out["2024-01-04"] == (1, 40.0, 40.0, False)
