"""Deterministic banking-star synthesis (SURVEY.md UD4, §3.1) — the
reference generator's customer → accounts → transactions fan-out
(reference ``generator.py:181-319``) re-expressed as pure DataFrame
ops: ``spark.range`` + ``explode(sequence(...))`` + hash-derived
uniforms.  No Python UDFs, no driver loops, no RETURNING round-trips —
keys are pre-assigned arithmetically, so synthesis of any size is
embarrassingly parallel (the reference's ceiling is ~275 rows/s;
this is bounded only by cluster write bandwidth).

Determinism: every "random" draw is a 32-bit hash of (id, salt) —
independent of partitioning, so fixtures are reproducible across
runs and cluster layouts (unlike ``F.rand(seed)``, which depends on
partition assignment).  Round 8: all draws are PURE-INTEGER closed
forms over that u32 (threshold ladders as integer literals, index
picks and range draws as ``(u32 * n) >> 32``, money as integer
cents) — no double comparisons, no double→decimal casts — so a
second engine can replay the entire synthesis bit-for-bit.  Two hash
families plug into the same arithmetic:

- ``xxhash64`` (engine default): ``pmod(xxhash64(id, salt), 2^32)``.
- ``md5`` (verifiability twin, same pattern as the MinHash md5
  family): the first 8 hex chars of ``md5(id || '|' || salt)`` —
  computable in DuckDB, so ``banking_generator_fanout``'s oracle
  independently recomputes the whole fan-out instead of pinning
  literals.

Distributions follow FIXTURES.md §B (cites into the reference):
account types 35/35/15/15 (``generator.py:231``), currencies
60/15/10/8/4/3 (``:244-248``), txn types 25/20/25/15/5/5/5 (``:278``),
status 85/8/4/3 (``:49-54``), amounts per-type with round-number bias
(``:286-289``) clamped ≥ 1.00 (``:292``), timestamps 2020-2024 with
70% business-hours (``:154-157``), child ts ≥ parent ts
(``:251-254,310-313``), TRANSFER rows get a related account, 40%
same-customer (``:296-304``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2020 = 1577836800  # 2020-01-01 UTC
EPOCH_2025 = 1735689600  # 2025-01-01 UTC (exclusive upper bound)

U32 = 1 << 32

FIRST_NAMES = [
    "ava", "ben", "chloe", "dan", "ella", "finn", "grace", "henry",
    "iris", "jack", "kate", "liam", "mia", "noah", "olive", "paul",
]
LAST_NAMES = [
    "adams", "brooks", "carter", "diaz", "evans", "foster", "garcia",
    "hayes", "ito", "jones", "khan", "lopez", "meyer", "nolan",
]
CITIES = ["springfield", "rivertown", "lakeside", "hillview", "maplewood",
          "oakdale", "fairmont", "brookfield"]
STATES = ["CA", "NY", "TX", "WA", "IL", "MA", "GA", "CO"]
COUNTRIES = ["USA", "CANADA", "UK", "INDIA", "GERMANY"]
STREET_TYPES = ["St", "Ave", "Blvd", "Ln"]

# weighted-choice tables (value, weight) — shared by the Spark draws
# below AND the DuckDB oracle generator in plans/queries_streaming.py,
# so both engines ladder over the SAME integer thresholds.
ACCT_TYPE_WEIGHTS = [
    ("SAVINGS", 0.35), ("CHECKING", 0.35),
    ("BUSINESS", 0.15), ("INVESTMENT", 0.15),
]
CURRENCY_WEIGHTS = [
    ("USD", 0.60), ("EUR", 0.15), ("GBP", 0.10), ("INR", 0.08),
    ("CAD", 0.04), ("AUD", 0.03),
]
TXN_TYPE_WEIGHTS = [
    ("DEPOSIT", 0.25), ("WITHDRAWAL", 0.20), ("TRANSFER", 0.25),
    ("PAYMENT", 0.15), ("REFUND", 0.05), ("FEE", 0.05), ("INTEREST", 0.05),
]
STATUS_WEIGHTS = [
    ("COMPLETED", 0.85), ("PENDING", 0.08), ("FAILED", 0.04),
    ("CANCELLED", 0.03),
]

# probability thresholds as u32 integers (compare ``u32 < THR``) —
# int(p * 2^32) computed ONCE here so Spark literals and oracle SQL
# literals cannot drift.
THR_FIRST_CHECKING = int(0.90 * U32)  # generator.py:222-225
THR_BIZ_HOURS = int(0.70 * U32)       # generator.py:154-157
THR_ROUND_BIAS = int(0.30 * U32)      # generator.py:286-289
THR_SAME_CUSTOMER = int(0.40 * U32)   # generator.py:296-304

# per-type amount ranges in INTEGER CENTS (reference generator.py:38-46)
AMOUNT_RANGES_CENTS = {
    "DEPOSIT": (1000, 500000),
    "WITHDRAWAL": (1000, 200000),
    "TRANSFER": (1000, 1000000),
    "PAYMENT": (500, 300000),
    "REFUND": (500, 50000),
    "FEE": (100, 5000),
    "INTEREST": (100, 20000),
}

BALANCE_CENTS_MOD = 10_000_000  # balance uniform over [0, 100000.00)


def cum_thresholds(choices: list[tuple[str, float]]) -> tuple[list[tuple[str, int]], str]:
    """Cumulative u32 thresholds for a weighted-choice table: every
    entry but the last maps to ``int(cum_weight * 2^32)``; the last is
    the ladder's OTHERWISE.  The Python-float accumulation happens
    exactly once here, so the Spark when-ladder and the DuckDB CASE
    ladder compare against identical integer literals."""
    out: list[tuple[str, int]] = []
    acc = 0.0
    for value, w in choices[:-1]:
        acc += w
        out.append((value, int(acc * U32)))
    return out, choices[-1][0]


def _u32(seed_col: Column, salt: str, family: str = "xxhash64") -> Column:
    """Deterministic uniform u32 from (value, salt) — partition-
    independent.  ``md5`` family: DuckDB-replicable
    ``('0x' || substr(md5(seed || '|' || salt), 1, 8))::BIGINT``."""
    if family == "md5":
        s = F.concat_ws("|", seed_col.cast("string"), F.lit(salt))
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
    return F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(U32))


def _scaled(u32: Column, n: int | Column) -> Column:
    """``floor(uniform * n)`` with zero float arithmetic:
    ``(u32 * n) >> 32``.  Exact for n < 2^31 (product < 2^63)."""
    n_col = F.lit(n) if isinstance(n, int) else n
    return F.shiftright(u32 * n_col, 32)


def _weighted(
    seed_col: Column, salt: str, choices: list[tuple[str, float]],
    family: str = "xxhash64",
) -> Column:
    """Weighted categorical via a cumulative when-ladder over one u32
    (the ``random.choices(weights=...)`` analog, reference
    ``generator.py:135-139``) — integer thresholds, no float compare."""
    u = _u32(seed_col, salt, family)
    ladder, last = cum_thresholds(choices)
    expr = None
    for value, thr in ladder:
        cond = u < F.lit(thr)
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(last)


def _ts_between_s(
    seed_col: Column, salt: str, lo_s: Column, hi_s: Column,
    family: str = "xxhash64",
) -> Column:
    """Uniform EPOCH-SECONDS draw in [lo, hi) with the generator's 70%
    business-hours (9-18) reassignment (reference
    ``generator.py:141-163``) — pure integer arithmetic on the UTC
    epoch-day grid (a ``date_trunc`` here would move with the session
    timezone, making every checksum config-dependent)."""
    span = F.greatest(hi_s - lo_s, F.lit(1))
    base = lo_s + _scaled(_u32(seed_col, salt, family), span)
    biased_hour = F.lit(9) + _scaled(_u32(seed_col, salt + "_bh", family), 9)
    day_start = base - F.pmod(base, F.lit(86400))
    in_day = base - day_start
    snapped = day_start + biased_hour * 3600 + F.pmod(in_day, F.lit(3600))
    use_bias = _u32(seed_col, salt + "_p", family) < F.lit(THR_BIZ_HOURS)
    chosen = F.when(use_bias, snapped).otherwise(base)
    # the hour snap can move within-day times before ``lo`` (e.g. a child
    # row on its parent's creation day) — clamp to preserve the
    # parent-before-child invariant (reference generator.py:251-254)
    return F.greatest(chosen, lo_s)


def customers(
    spark: SparkSession, n: int, seed: str = "s42",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Customer rows with synthesized names/emails (reference
    ``generator.py:185-208``): email = first.last+id@domain, lowercase —
    id suffix plays the md5-uniquifier role (``generator.py:111``)
    while keeping emails UNIQUE by construction (``SCHEMA.sql:6``)."""
    ids = spark.range(1, n + 1).withColumnRenamed("id", "id")

    def pick(pool: list[str], salt: str) -> Column:
        return F.element_at(
            F.array(*[F.lit(x) for x in pool]),
            (_scaled(_u32(F.col("id"), seed + salt, hash_family), len(pool))
             + 1).cast("int"),
        )

    first = pick(FIRST_NAMES, "fn")
    last = pick(LAST_NAMES, "ln")
    created_s = _ts_between_s(
        F.col("id"), seed + "ct",
        F.lit(EPOCH_2020), F.lit(EPOCH_2025), hash_family,
    )
    # nested address struct (reference generator.py:125-133 builds one
    # via faker; deterministic pool draws here — schemas.ADDRESS shape)
    street = F.concat_ws(
        " ",
        (_scaled(_u32(F.col("id"), seed + "hn", hash_family), 9899)
         + 100).cast("string"),
        F.initcap(pick(LAST_NAMES, "stn")),
        pick(STREET_TYPES, "sts"),
    )
    address = F.struct(
        street.alias("street"),
        pick(CITIES, "ci").alias("city"),
        pick(STATES, "sta").alias("state"),
        F.lpad(
            (_scaled(_u32(F.col("id"), seed + "pc", hash_family), 99999)
             + 1).cast("string"),
            5, "0",
        ).alias("postal_code"),
        pick(COUNTRIES, "co").alias("country"),
    )
    return ids.select(
        F.col("id"),
        F.initcap(first).alias("first_name"),
        F.initcap(last).alias("last_name"),
        F.concat_ws("", first, F.lit("."), last, F.col("id").cast("string"),
                    F.lit("@example.com")).alias("email"),
        address.alias("address"),
        F.timestamp_seconds(created_s).alias("created_at"),
    )


def n_accounts_of(cust: Column, seed: str = "s42",
                  hash_family: str = "xxhash64") -> Column:
    """1-4 accounts for a customer id — re-derivable from the id alone
    (the FK trick ``transactions`` uses to pick provably-existing
    counterparty accounts without a join back to ``accounts``)."""
    return 1 + _scaled(_u32(cust, seed + "na", hash_family), 4)


def accounts(customers_df: DataFrame, seed: str = "s42",
             hash_family: str = "xxhash64") -> DataFrame:
    """1-4 accounts per customer via ``explode(sequence(...))`` — the
    grouped fan-out loop (reference ``generator.py:220-268``) with 90%
    of customers guaranteed a CHECKING account (``generator.py:222-225``)."""
    n_accts = n_accounts_of(F.col("id"), seed, hash_family)
    exploded = (
        customers_df.select(
            F.col("id").alias("customer_id"),
            F.col("created_at").cast("long").alias("cust_created_s"),
            F.posexplode(F.sequence(F.lit(1), n_accts.cast("int")))
            .alias("slot", "_one"),
        )
    )
    acct_seed = F.col("customer_id") * 16 + F.col("slot")
    acct_type = _weighted(acct_seed, seed + "ty", ACCT_TYPE_WEIGHTS, hash_family)
    # slot 0 → CHECKING for 90% of customers (generator.py:222-225)
    first_checking = (F.col("slot") == 0) & (
        _u32(F.col("customer_id"), seed + "fc", hash_family)
        < F.lit(THR_FIRST_CHECKING)
    )
    currency = _weighted(acct_seed, seed + "cur", CURRENCY_WEIGHTS, hash_family)
    balance_cents = F.pmod(
        _u32(acct_seed, seed + "bal", hash_family), F.lit(BALANCE_CENTS_MOD)
    )
    created_s = _ts_between_s(
        acct_seed, seed + "act",
        F.col("cust_created_s"), F.lit(EPOCH_2025), hash_family,
    )
    return exploded.select(
        (F.col("customer_id") * 16 + F.col("slot")).alias("id"),
        F.col("customer_id"),
        F.when(first_checking, "CHECKING").otherwise(acct_type).alias("account_type"),
        (balance_cents / F.lit(100.0)).cast("decimal(18,2)").alias("balance"),
        currency.alias("currency"),
        F.timestamp_seconds(created_s).alias("created_at"),
    )


def transactions(accounts_df: DataFrame, per_account: int = 4, seed: str = "s42",
                 hash_family: str = "xxhash64") -> DataFrame:
    """Transactions fan-out (reference ``generator.py:273-319``):
    weighted type/status, per-type amount ranges with round-number bias
    and the ≥ 1.00 clamp, txn ts ≥ account ts, TRANSFER rows linked to
    a counterparty account (40% same-customer heuristic approximated by
    hashing within the account-id space)."""
    exploded = accounts_df.select(
        F.col("id").alias("account_id"),
        F.col("customer_id"),
        F.col("created_at").cast("long").alias("acct_created_s"),
        F.posexplode(F.sequence(F.lit(1), F.lit(per_account))).alias("slot", "_one"),
    )
    txn_seed = F.col("account_id") * 1024 + F.col("slot")
    txn_type = _weighted(txn_seed, seed + "tt", TXN_TYPE_WEIGHTS, hash_family)
    status = _weighted(txn_seed, seed + "st", STATUS_WEIGHTS, hash_family)
    # amount: uniform in the per-type range (integer cents), 30% rounded
    # to a multiple of 10 dollars = 1000 cents HALF_UP
    # (generator.py:286-289), clamped ≥ 1.00 = 100 cents
    # (generator.py:292)
    u_amt = _u32(txn_seed, seed + "am", hash_family)
    amount_cents = None
    for t, (lo_c, hi_c) in AMOUNT_RANGES_CENTS.items():
        e = F.lit(lo_c) + _scaled(u_amt, hi_c - lo_c)
        amount_cents = (
            F.when(txn_type == t, e) if amount_cents is None
            else amount_cents.when(txn_type == t, e)
        )
    half_up = amount_cents + 500
    rounded_cents = half_up - F.pmod(half_up, F.lit(1000))
    use_round = _u32(txn_seed, seed + "rb", hash_family) < F.lit(THR_ROUND_BIAS)
    final_cents = F.greatest(
        F.when(use_round, rounded_cents).otherwise(amount_cents), F.lit(100)
    )
    created_s = _ts_between_s(
        txn_seed, seed + "tct",
        F.col("acct_created_s"), F.lit(EPOCH_2025), hash_family,
    )
    # counterparty FK (reference generator.py:296-304 picks from the
    # EXISTING account pool; FK constraint SCHEMA.sql on
    # related_account_id).  Account ids are customer_id*16 + slot with
    # slot < n_accts(customer) — n_accts is re-derivable from the
    # customer id (same seeded expression accounts() uses), so both
    # branches can land on a provably existing account:
    # - same-customer: sibling slot modulo this customer's n_accts;
    # - any-customer: uniform customer draw in [1, max_customer_id]
    #   (1-row broadcast-joined aggregate — no driver round-trip),
    #   then a slot modulo THAT customer's n_accts.
    max_cust = accounts_df.agg(
        F.max("customer_id").alias("__max_cust")
    ).withColumn("__one", F.lit(1))
    exploded = exploded.withColumn("__one", F.lit(1)).join(
        F.broadcast(max_cust), "__one"
    ).drop("__one")
    other_cust = F.least(
        _scaled(_u32(txn_seed, seed + "oth", hash_family), F.col("__max_cust")) + 1,
        F.col("__max_cust"),
    )
    related = F.when(
        txn_type == "TRANSFER",
        F.when(
            _u32(txn_seed, seed + "sc", hash_family) < F.lit(THR_SAME_CUSTOMER),
            F.col("customer_id") * 16
            + _scaled(_u32(txn_seed, seed + "sib", hash_family),
                      n_accounts_of(F.col("customer_id"), seed, hash_family)),
        ).otherwise(
            other_cust * 16
            + _scaled(_u32(txn_seed, seed + "slt", hash_family),
                      n_accounts_of(other_cust, seed, hash_family))
        ),
    )
    return exploded.select(
        txn_seed.alias("id"),
        F.col("account_id"),
        txn_type.alias("txn_type"),
        (final_cents / F.lit(100.0)).cast("decimal(18,2)").alias("amount"),
        related.alias("related_account_id"),
        status.alias("status"),
        F.timestamp_seconds(created_s).alias("created_at"),
    )


def banking_star(
    spark: SparkSession, n_customers: int = 100, txns_per_account: int = 4,
    seed: str = "s42", hash_family: str = "xxhash64",
) -> dict[str, DataFrame]:
    """One generator "iteration" at DataFrame scale (reference
    ``generator.py:181`` run_iteration): the three dependency-ordered
    tables, ready for bulk write.  ``hash_family="md5"`` produces the
    DuckDB-replicable verifiability twin (identical arithmetic, md5-
    derived u32 draws)."""
    c = customers(spark, n_customers, seed, hash_family)
    a = accounts(c, seed, hash_family)
    t = transactions(a, txns_per_account, seed, hash_family)
    return {"customers": c, "accounts": a, "transactions": t}
