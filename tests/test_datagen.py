"""Generator-invariant property tests (SURVEY.md §5): the synthesized
banking star must satisfy the reference generator's invariants
(reference ``generator.py`` cites in each assertion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.sources import datagen


@pytest.fixture(scope="module")
def star(spark):
    return datagen.banking_star(spark, n_customers=200, txns_per_account=3)


def test_cardinalities(star):
    c, a = star["customers"].count(), star["accounts"].count()
    assert c == 200
    assert 200 <= a <= 800  # 1-4 accounts/customer (generator.py:19-20)
    assert star["transactions"].count() == a * 3


def test_emails_unique(star):
    # UNIQUE email constraint (SCHEMA.sql:6, generator.py:101-108)
    cust = star["customers"]
    assert cust.select("email").distinct().count() == cust.count()


def test_fk_integrity(star):
    # FKs resolve (SCHEMA.sql:13,23)
    orphans_a = star["accounts"].join(
        star["customers"], star["accounts"].customer_id == star["customers"].id, "left_anti"
    )
    orphans_t = star["transactions"].join(
        star["accounts"], star["transactions"].account_id == star["accounts"].id, "left_anti"
    )
    assert orphans_a.count() == 0
    assert orphans_t.count() == 0


def test_timestamp_ordering_invariant(star):
    # txn.created_at >= account.created_at >= customer.created_at
    # (generator.py:251-254,310-313)
    a = star["accounts"].alias("a")
    c = star["customers"].alias("c")
    t = star["transactions"].alias("t")
    bad_a = a.join(c, F.col("a.customer_id") == F.col("c.id")).filter(
        F.col("a.created_at") < F.col("c.created_at")
    )
    bad_t = t.join(a, F.col("t.account_id") == F.col("a.id")).filter(
        F.col("t.created_at") < F.col("a.created_at")
    )
    assert bad_a.count() == 0
    assert bad_t.count() == 0


def test_amount_clamp_and_domains(star):
    # amount >= 1.00 (generator.py:292); status/type domains (:49-54,:38-46)
    t = star["transactions"]
    assert t.filter(F.col("amount") < 1.00).count() == 0
    types = {r[0] for r in t.select("txn_type").distinct().collect()}
    assert types <= set(datagen.AMOUNT_RANGES_CENTS)
    statuses = {r[0] for r in t.select("status").distinct().collect()}
    assert statuses <= {"COMPLETED", "PENDING", "FAILED", "CANCELLED"}


def test_status_distribution(star):
    # 85/8/4/3 within tolerance (generator.py:49-54)
    t = star["transactions"]
    n = t.count()
    completed = t.filter(F.col("status") == "COMPLETED").count()
    assert 0.78 <= completed / n <= 0.92


def test_transfers_have_counterparty(star):
    t = star["transactions"]
    assert t.filter(
        (F.col("txn_type") == "TRANSFER") & F.col("related_account_id").isNull()
    ).count() == 0
    assert t.filter(
        (F.col("txn_type") != "TRANSFER") & F.col("related_account_id").isNotNull()
    ).count() == 0


def test_related_account_fk_resolves(star):
    # the counterparty FK must land on an EXISTING account — both the
    # same-customer sibling branch and the any-customer branch
    # (SCHEMA.sql FK on related_account_id; generator.py:296-304)
    transfers = star["transactions"].filter(F.col("related_account_id").isNotNull())
    orphans = transfers.join(
        star["accounts"],
        transfers.related_account_id == star["accounts"].id,
        "left_anti",
    )
    assert orphans.count() == 0
    # both branches actually occur (same- and cross-customer targets)
    t = (
        transfers.join(
            star["accounts"].select(
                F.col("id").alias("aid"), F.col("customer_id").alias("scust")
            ),
            transfers.account_id == F.col("aid"),
        )
        .join(
            star["accounts"].select(
                F.col("id").alias("rid"), F.col("customer_id").alias("rcust")
            ),
            transfers.related_account_id == F.col("rid"),
        )
    )
    same = t.filter(F.col("scust") == F.col("rcust")).count()
    cross = t.filter(F.col("scust") != F.col("rcust")).count()
    assert same > 0 and cross > 0


def test_determinism_across_runs(spark):
    # same seed → identical rows regardless of partitioning
    a = datagen.banking_star(spark, 50)["transactions"]
    b = datagen.banking_star(spark, 50)["transactions"]
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_business_hours_bias(star):
    # ~70% business-hours 9-18 (generator.py:154-157)
    t = star["transactions"]
    share = t.filter(F.hour("created_at").between(9, 17)).count() / t.count()
    assert share >= 0.60
