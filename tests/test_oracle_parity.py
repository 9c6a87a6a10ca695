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


def test_sf1_gate_rewrites_equal_brute_oracles():
    """The accelerated DuckDB oracle rewrites that the 100x-scale dedup
    gate runs (scripts/sf1_dedup_gate.py) must stay EXACTLY equivalent
    to the brute-force catalog oracles — DuckDB vs DuckDB at sf0.001,
    so any drift in either side's SQL (or in the shared shingle CTE)
    fails CI instead of silently weakening the sf1 evidence chain."""
    import sys

    from tests.oracle import _canon

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import sf1_dedup_gate as g

    pre = g._preconditions(SF_SMOKE)
    assert pre["c_name_len_violations"] == 0
    assert pre["max_shingle_df"] <= 128
    for name, fast in (
        ("dedup_ngram_jaccard_pairs", g._ngram_fast_sql()),
        ("fuzzy_deletion_pairs", g.FUZZY_FAST),
    ):
        a = duck_run(QUERIES[name].oracle, SF_SMOKE)
        b = duck_run(fast, SF_SMOKE)
        assert sorted(a.columns) == sorted(b.columns), name
        assert _canon(a) == _canon(b), f"{name}: rewrite drifted from brute oracle"
