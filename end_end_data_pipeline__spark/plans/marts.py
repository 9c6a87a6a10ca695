"""Gold-layer marts — the analytics layer the reference declared but
never built (``README.md:57,62`` list ``docker/dags/`` and
``banking_dbt/``; the Airflow DAG dir scanned empty and no dbt
relations exist in the Postgres catalog — SURVEY.md §0).

This module is that layer, dbt-style but Spark-native: a
dependency-ordered build of silver (typed banking tables) → gold marts,
each written date-partitioned parquet via the lake writer.  Marts:

- ``daily_txn_volume`` — per day × txn_type × currency × status counts
  and exact DECIMAL(18,2) amounts (A2/A3/A6 over J2);
- ``customer_value`` — customer→account→transaction rollup: account
  portfolio, balances, txn volume (J5/A2; the W5-style quartile is
  downstream of this mart);
- ``account_running_balance`` — per-account signed running balance
  reconstruction, materialized at the latest transaction (A9/W1).

All money stays DecimalType end-to-end — sums are exact and
order-independent, so each mart is bit-checkable against a sequential
engine over the same silver parquet (tests/test_marts.py does exactly
that with DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.sources import datagen

SIGN = {
    "DEPOSIT": 1, "REFUND": 1, "INTEREST": 1,
    "WITHDRAWAL": -1, "TRANSFER": -1, "PAYMENT": -1, "FEE": -1,
}


def signed_amount(txn: DataFrame) -> F.Column:
    """Signed money flow per transaction (SURVEY A9: the reference's
    ``accounts.balance`` is a maintained aggregate; the lake rebuilds it
    from the flow implied by ``txn_type``, reference ``generator.py:38-46``)."""
    expr = None
    for t, s in SIGN.items():
        cond = F.col("txn_type") == t
        val = F.col("amount") * s
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(F.lit(0)).cast("decimal(18,2)")


def mart_daily_txn_volume(txns: DataFrame, accounts: DataFrame) -> DataFrame:
    return (
        txns.join(accounts.select(F.col("id").alias("account_id"), "currency"),
                  "account_id")
        .groupBy(
            F.to_date("created_at").alias("txn_date"),
            "txn_type", "currency", "status",
        )
        .agg(
            F.count("*").alias("n_txns"),
            F.sum("amount").cast("decimal(28,2)").alias("total_amount"),
        )
    )


def mart_customer_value(
    customers: DataFrame, accounts: DataFrame, txns: DataFrame
) -> DataFrame:
    acct = accounts.select(
        F.col("id").alias("account_id"),
        F.col("customer_id"),
        "balance",
    )
    per_acct_txn = txns.groupBy("account_id").agg(
        F.count("*").alias("n_txns"),
        F.sum("amount").cast("decimal(28,2)").alias("txn_volume"),
    )
    per_cust = (
        acct.join(per_acct_txn, "account_id", "left")
        .groupBy("customer_id")
        .agg(
            F.count("*").alias("n_accounts"),
            F.sum("balance").cast("decimal(28,2)").alias("total_balance"),
            F.coalesce(F.sum("n_txns"), F.lit(0)).alias("n_txns"),
            F.coalesce(F.sum("txn_volume"), F.lit(0))
            .cast("decimal(28,2)")
            .alias("txn_volume"),
        )
    )
    return customers.select(
        F.col("id").alias("customer_id"), "email"
    ).join(per_cust, "customer_id", "left")


def mart_account_running_balance(txns: DataFrame) -> DataFrame:
    """Latest running balance per account: signed cumulative sum over
    event time, keep the last row (W1 + W2 composed).  One hash shuffle
    on account_id."""
    w = Window.partitionBy("account_id").orderBy("created_at", "id")
    running = txns.withColumn(
        "running_balance",
        F.sum(signed_amount(txns)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("decimal(28,2)"),
    )
    latest = Window.partitionBy("account_id").orderBy(
        F.col("created_at").desc(), F.col("id").desc()
    )
    return (
        running.withColumn("__rn", F.row_number().over(latest))
        .withColumn(
            "n_txns", F.count("*").over(Window.partitionBy("account_id"))
        )
        .filter(F.col("__rn") == 1)
        .select(
            "account_id",
            F.col("created_at").alias("as_of"),
            "running_balance",
            "n_txns",
        )
    )


def build_banking_marts(
    spark: SparkSession, out_dir: str, n_customers: int = 200
) -> dict[str, str]:
    """The dbt-DAG analog, dependency-ordered: synthesize the banking
    star (silver), persist it, then build + persist each gold mart.
    Returns mart name → parquet path.  Everything overwrite-idempotent,
    so re-runs converge (the reference generator loops and re-inserts;
    here a rebuild is a deterministic refresh)."""
    star = datagen.banking_star(spark, n_customers=n_customers, txns_per_account=5)
    paths: dict[str, str] = {}
    for name, df in star.items():
        p = os.path.join(out_dir, "silver", name)
        df.write.mode("overwrite").parquet(p)
        paths[f"silver/{name}"] = p

    silver = {
        name: spark.read.parquet(os.path.join(out_dir, "silver", name))
        for name in star
    }
    gold = {
        "daily_txn_volume": mart_daily_txn_volume(
            silver["transactions"], silver["accounts"]
        ),
        "customer_value": mart_customer_value(
            silver["customers"], silver["accounts"], silver["transactions"]
        ),
        "account_running_balance": mart_account_running_balance(
            silver["transactions"]
        ),
    }
    for name, df in gold.items():
        p = os.path.join(out_dir, "gold", name)
        df.write.mode("overwrite").parquet(p)
        paths[f"gold/{name}"] = p
    return paths


def refresh_daily_txn_volume(
    txns: DataFrame,
    accounts: DataFrame,
    new_txns: DataFrame,
    gold_path: str,
) -> None:
    """Incremental (dbt-incremental-style) refresh of the daily volume
    mart: only the dates present in ``new_txns`` are recomputed — from
    the full transaction set restricted to those dates (a date-
    partitioned lake prunes that scan to the affected partitions) —
    then written with dynamic partition overwrite, leaving every other
    date's files untouched.

    The mart must have been written ``partitionBy("txn_date")``.  A
    full rebuild and any sequence of incremental refreshes converge to
    the same table (tests/test_marts.py proves it)."""
    spark = txns.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    affected = new_txns.select(
        F.to_date("created_at").alias("txn_date")
    ).distinct()
    scoped = txns.join(
        affected,
        F.to_date(txns.created_at) == affected.txn_date,
        "left_semi",
    )
    recomputed = mart_daily_txn_volume(scoped, accounts)
    (
        recomputed.write.mode("overwrite")
        .partitionBy("txn_date")
        .parquet(gold_path)
    )
