"""Gold-mart oracle tests: build the banking silver+gold layers, then
re-derive every mart with DuckDB over the SAME silver parquet and
compare exactly (decimal money ⇒ no float tolerance needed)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.plans import marts


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("marts"))
    paths = marts.build_banking_marts(spark, out, n_customers=150)
    con = duckdb.connect()
    for key, p in paths.items():
        con.execute(
            f"CREATE VIEW {key.replace('/', '_')} AS SELECT * FROM '{p}/*.parquet'"
        )
    return spark, con, paths


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _duck(con, sql, n_cols):
    return sorted(tuple(row) for row in con.execute(sql).fetchall())


def test_daily_txn_volume_matches_duckdb(built):
    spark, con, paths = built
    got = _rows(
        spark.read.parquet(paths["gold/daily_txn_volume"]),
        ["txn_date", "txn_type", "currency", "status", "n_txns", "total_amount"],
    )
    want = _duck(con, """
        SELECT CAST(t.created_at AS DATE) AS txn_date, t.txn_type, a.currency,
               t.status, COUNT(*) AS n_txns,
               CAST(SUM(t.amount) AS DECIMAL(28,2)) AS total_amount
        FROM silver_transactions t JOIN silver_accounts a ON t.account_id = a.id
        GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
    """, 6)
    assert got == want


def test_customer_value_matches_duckdb(built):
    spark, con, paths = built
    got = _rows(
        spark.read.parquet(paths["gold/customer_value"]),
        ["customer_id", "n_accounts", "total_balance", "n_txns", "txn_volume"],
    )
    want = _duck(con, """
        WITH per_acct AS (
            SELECT account_id, COUNT(*) AS n_txns,
                   CAST(SUM(amount) AS DECIMAL(28,2)) AS vol
            FROM silver_transactions GROUP BY 1
        )
        SELECT c.id AS customer_id, COUNT(a.id) AS n_accounts,
               CAST(SUM(a.balance) AS DECIMAL(28,2)) AS total_balance,
               CAST(COALESCE(SUM(p.n_txns), 0) AS BIGINT) AS n_txns,
               CAST(COALESCE(SUM(p.vol), 0) AS DECIMAL(28,2)) AS txn_volume
        FROM silver_customers c
        JOIN silver_accounts a ON a.customer_id = c.id
        LEFT JOIN per_acct p ON p.account_id = a.id
        GROUP BY 1
    """, 5)
    assert got == want


def test_running_balance_matches_duckdb(built):
    spark, con, paths = built
    got = _rows(
        spark.read.parquet(paths["gold/account_running_balance"]),
        ["account_id", "running_balance", "n_txns"],
    )
    sign_case = " ".join(
        f"WHEN txn_type = '{t}' THEN {s}" for t, s in marts.SIGN.items()
    )
    want = _duck(con, f"""
        WITH signed AS (
            SELECT account_id, id, created_at,
                   CAST(amount * (CASE {sign_case} ELSE 0 END)
                        AS DECIMAL(18,2)) AS flow
            FROM silver_transactions
        ), running AS (
            SELECT account_id,
                   CAST(SUM(flow) OVER (PARTITION BY account_id
                                        ORDER BY created_at, id
                                        ROWS UNBOUNDED PRECEDING)
                        AS DECIMAL(28,2)) AS running_balance,
                   ROW_NUMBER() OVER (PARTITION BY account_id
                                      ORDER BY created_at DESC, id DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY account_id) AS n_txns
            FROM signed
        )
        SELECT account_id, running_balance, n_txns FROM running WHERE rn = 1
    """, 3)
    assert got == want


def test_rebuild_is_idempotent(built):
    spark, con, paths = built
    before = spark.read.parquet(paths["gold/customer_value"]).count()
    out_root = paths["gold/customer_value"].rsplit("/gold/", 1)[0]
    marts.build_banking_marts(spark, out_root, n_customers=150)
    after = spark.read.parquet(paths["gold/customer_value"]).count()
    assert before == after


def test_incremental_refresh_converges_to_full_rebuild(spark, tmp_path):
    """Write the mart from old transactions, deliver new days
    incrementally, and require exact convergence with a from-scratch
    rebuild — while untouched date partitions' files stay physically
    identical (dynamic overwrite only rewrote affected dates)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from end_end_data_pipeline__spark.sources import datagen

    star = datagen.banking_star(spark, n_customers=120, txns_per_account=4)
    txns, accounts = star["transactions"], star["accounts"]
    cutoff = txns.approxQuantile("id", [0.7], 0.0)[0]
    old, new = txns.filter(F.col("id") <= cutoff), txns.filter(F.col("id") > cutoff)

    gold = str(tmp_path / "daily_vol")
    marts.mart_daily_txn_volume(old, accounts).write.mode("overwrite").partitionBy(
        "txn_date"
    ).parquet(gold)

    new_dates = {r["d"] for r in new.select(F.to_date("created_at").alias("d")).distinct().collect()}
    untouched_before = {
        p: sorted(os.listdir(os.path.join(gold, p)))
        for p in os.listdir(gold)
        if p.startswith("txn_date=")
        and p.split("=", 1)[1] not in {str(d) for d in new_dates}
    }

    marts.refresh_daily_txn_volume(txns, accounts, new, gold)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(gold)
        .select("txn_date", "txn_type", "currency", "status", "n_txns", "total_amount")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in marts.mart_daily_txn_volume(txns, accounts)
        .select("txn_date", "txn_type", "currency", "status", "n_txns", "total_amount")
        .collect()
    )
    assert got == want
    # untouched partitions were not rewritten
    for p, files in untouched_before.items():
        assert sorted(os.listdir(os.path.join(gold, p))) == files


# ---------------------------------------------------------------------------
# Orchestration runner (the reference's declared Airflow/dbt layer)
# ---------------------------------------------------------------------------


def test_dag_topo_order_deterministic_and_validated(spark):
    from end_end_data_pipeline__spark.plans.orchestrate import Job, topo_order

    noop = lambda s, c: None  # noqa: E731
    jobs = {
        "c": Job("c", noop, deps=("a", "b")),
        "b": Job("b", noop, deps=("a",)),
        "a": Job("a", noop),
        "z": Job("z", noop),
    }
    # ready jobs run in name order -> fully deterministic
    assert topo_order(jobs) == ["a", "z", "b", "c"]

    with pytest.raises(ValueError, match="unknown job"):
        topo_order({"a": Job("a", noop, deps=("ghost",))})
    with pytest.raises(ValueError, match="cycle"):
        topo_order({
            "a": Job("a", noop, deps=("b",)),
            "b": Job("b", noop, deps=("a",)),
        })


def test_dag_failure_skips_downstream_only(spark):
    from end_end_data_pipeline__spark.plans.orchestrate import Job, run_dag

    def boom(s, c):
        raise RuntimeError("boom")

    ran = []
    mk = lambda n: lambda s, c: ran.append(n)  # noqa: E731
    jobs = {
        "a": Job("a", mk("a")),
        "bad": Job("bad", boom, deps=("a",)),
        "down": Job("down", mk("down"), deps=("bad",)),
        "side": Job("side", mk("side"), deps=("a",)),
    }
    run = run_dag(spark, jobs)
    assert run.results["bad"].status == "failed"
    assert run.results["down"].status == "upstream_failed"
    assert run.results["side"].status == "ok"
    assert "down" not in ran and "side" in ran
    assert not run.ok


def test_marts_dag_rerun_produces_identical_state(spark, tmp_path):
    """The full declared DAG (silver synth -> gold marts) re-run on the
    same out_dir must converge to bit-identical mart contents — the
    idempotent-refresh contract of the orchestration layer."""
    from end_end_data_pipeline__spark.plans.orchestrate import (
        banking_marts_dag,
        run_dag,
    )

    out = str(tmp_path / "marts")
    jobs = banking_marts_dag(out, n_customers=60)
    run1 = run_dag(spark, jobs)
    assert run1.ok, {n: r.error for n, r in run1.results.items()}
    # silver jobs run before their gold consumers
    order = run1.order
    assert order.index("silver_transactions") < order.index("gold_daily_txn_volume")

    def snapshot():
        return {
            name: sorted(
                tuple(r) for r in spark.read.parquet(res.output).collect()
            )
            for name, res in run1.results.items()
            if name.startswith("gold_")
        }

    first = snapshot()
    run2 = run_dag(spark, banking_marts_dag(out, n_customers=60))
    assert run2.ok
    assert snapshot() == first


def test_asof_forward_and_tolerance(spark):
    from end_end_data_pipeline__spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "id long, ts string",
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", 7.0), (2, "2024-01-01 14:30:00", 9.0)],
        "id long, ts string, v double",
    ).select("id", F.col("ts").cast("timestamp").alias("ts"), "v")

    fwd = {
        r["id"]: r["asof_v"]
        for r in asof_join(left, right, key="id", direction="forward").collect()
    }
    assert fwd == {1: 7.0, 2: 9.0}
    # 1h tolerance: id 2's next match is 2.5h away -> nulled, row kept
    tol = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, key="id", direction="forward", tolerance_seconds=3600
        ).collect()
    }
    assert tol == {1: 7.0, 2: None}
    # backward with tolerance: id 1 has no earlier right row
    back = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, key="id", direction="backward", tolerance_seconds=3600
        ).collect()
    }
    assert back == {1: None, 2: None}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, key="id", direction="nearest")


def test_flatten_hierarchy_cycle_guard_and_shapes(spark):
    from end_end_data_pipeline__spark.operators.graph import flatten_hierarchy

    # chain 3 -> 2 -> 1 (root), plus isolated root 9
    parents = spark.createDataFrame(
        [(3, 2), (2, 1), (1, None), (9, None)], "node long, parent long"
    )
    got = {
        r["node"]: (r["root"], r["depth"], r["path"], r["is_cut"])
        for r in flatten_hierarchy(parents).collect()
    }
    assert got == {
        3: (1, 2, "3/2/1", False),
        2: (1, 1, "2/1", False),
        1: (1, 0, "1", False),
        9: (9, 0, "9", False),
    }
    # a 2-cycle must terminate at max_depth, not loop forever — and be
    # FLAGGED (r07 review: the docstring promised a flag none existed;
    # without it a cycle member is indistinguishable from a real
    # depth-5 chain)
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    out = flatten_hierarchy(cyc, max_depth=5).collect()
    assert all(r["depth"] == 5 and r["is_cut"] for r in out)
    # an all-roots forest (loop never runs) must still resolve
    roots = spark.createDataFrame([(7, None), (8, None)], "node long, parent long")
    got_roots = {
        r["node"]: (r["root"], r["depth"], r["path"])
        for r in flatten_hierarchy(roots).collect()
    }
    assert got_roots == {7: (7, 0, "7"), 8: (8, 0, "8")}


def test_masking_policies_semantics(spark):
    from end_end_data_pipeline__spark.functions import masking

    df = spark.createDataFrame(
        [(1, "alice@example.com", 4242424242424242, 1234.56),
         (2, "alice@example.com", 9999888877776666, 999.99)],
        "id long, email string, card long, bal double",
    )
    out = masking.apply_policy(
        df, {"email": "hash", "card": "partial", "bal": "bucket:1000"}
    )
    rows = {r["id"]: r for r in out.collect()}
    # deterministic joinable pseudonym: same input -> same mask
    assert rows[1]["email"] == rows[2]["email"]
    assert rows[1]["email"] != "alice@example.com" and len(rows[1]["email"]) == 32
    # display mask keeps last 4
    assert rows[1]["card"].endswith("4242") and set(rows[1]["card"][:-4]) == {"*"}
    # short values star out FULLY (never an identity mask)
    short = masking.apply_policy(
        spark.createDataFrame([(1, "1234"), (2, "ab")], "id long, pin string"),
        {"pin": "partial"},
    )
    got_short = {r["id"]: r["pin"] for r in short.collect()}
    assert got_short == {1: "****", 2: "**"}
    # bucketed, type preserved
    assert rows[1]["bal"] == 1000.0 and rows[2]["bal"] == 0.0
    assert dict(out.dtypes)["bal"] == "double"
    # schema shape preserved (names), id untouched
    assert out.columns == df.columns and rows[1]["id"] == 1
    import pytest as _p

    with _p.raises(ValueError, match="unknown column"):
        masking.apply_policy(df, {"nope": "hash"})
    with _p.raises(ValueError, match="unknown masking policy"):
        masking.apply_policy(df, {"email": "rot13"})
    with _p.raises(ValueError, match="width"):
        masking.apply_policy(df, {"bal": "bucket:0"})


def test_round_down_truncates_toward_zero(spark):
    """r07 review: Decimal ROUND_DOWN truncates toward ZERO; a bare
    floor() is toward -inf, off by one cent on negative money."""
    from end_end_data_pipeline__spark.functions.scalar import round_down

    df = spark.createDataFrame(
        [(1.239,), (-1.239,), (-1.0,), (0.0,)], "x double"
    )
    got = [
        float(r["y"]) for r in df.select(round_down("x").alias("y")).collect()
    ]
    assert got == [1.23, -1.23, -1.0, 0.0]


def test_bucketize_null_and_degenerate_range(spark):
    """r07 review: a NULL input must bucket to 0, not silently to the
    TOP bucket (Spark least/greatest skip null args); hi == lo must
    collapse to bucket 0 instead of dividing by zero."""
    from end_end_data_pipeline__spark.functions.zorder import bucketize

    df = spark.createDataFrame([(None,), (0.0,), (100.0,)], "x double")
    got = [
        r["b"]
        for r in df.select(
            bucketize(F.col("x"), 0.0, 100.0, 16).alias("b")
        ).collect()
    ]
    assert got == [0, 0, 15]
    flat = [
        r["b"]
        for r in df.select(
            bucketize(F.col("x"), 5.0, 5.0, 16).alias("b")
        ).collect()
    ]
    assert flat == [0, 0, 0]
