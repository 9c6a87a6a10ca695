"""Gold-mart oracle tests: build the banking silver+gold layers, then
re-derive every mart with DuckDB over the SAME silver parquet and
compare exactly (decimal money ⇒ no float tolerance needed)."""

from __future__ import annotations

import duckdb
import pytest

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
