"""Every catalog query with an oracle must match DuckDB exactly at
sf0.001 (fast) — the local replica of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from end_end_data_pipeline__spark.plans.catalog import load_all
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_run

QUERIES = load_all()
WITH_ORACLE = [n for n, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY = [n for n, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_SMOKE)
    ddf = duck_run(q.oracle, SF_SMOKE)
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_SMOKE)
    assert df.count() >= 0
