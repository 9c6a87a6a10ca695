"""Every catalog query with an oracle must match DuckDB exactly —
the local replica of the driver's correctness gate.

Default fixture dir is sf0.001 (fast CI).  Set
``SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01`` to run the suite
at the driver's own scale factor — the same sweep
``scripts/driver_gate.py --all`` performs as a standalone command.
"""

from __future__ import annotations

import os

import pytest

from end_end_data_pipeline__spark.plans.catalog import load_all
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_run

SF_PARITY = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", SF_SMOKE)

QUERIES = load_all()
WITH_ORACLE = [n for n, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY = [n for n, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_PARITY)
    ddf = duck_run(q.oracle, SF_PARITY)
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_PARITY)
    assert df.count() >= 0
