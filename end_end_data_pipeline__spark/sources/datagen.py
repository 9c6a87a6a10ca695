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

from end_end_data_pipeline__spark.functions.scalar import round_down

EPOCH_2020 = 1577836800  # 2020-01-01 UTC
EPOCH_2025 = 1735689600  # 2025-01-01 UTC (exclusive upper bound)

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


def _u(seed_col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) from (value, salt) — partition-independent."""
    h = F.xxhash64(seed_col, F.lit(salt))
    return (F.pmod(h, F.lit(1_000_000_007)) / F.lit(1_000_000_007.0))


def _weighted(seed_col: Column, salt: str, choices: list[tuple[str, float]]) -> Column:
    """Weighted categorical via a cumulative when-ladder over one uniform
    (the ``random.choices(weights=...)`` analog, reference
    ``generator.py:135-139``)."""
    u = _u(seed_col, salt)
    expr = None
    acc = 0.0
    for value, w in choices[:-1]:
        acc += w
        expr = F.when(u < acc, value) if expr is None else expr.when(u < acc, value)
    return expr.otherwise(choices[-1][0])


def _ts_between(seed_col: Column, salt: str, lo: Column, hi: Column) -> Column:
    """Uniform timestamp in [lo, hi) with the generator's 70%
    business-hours (9-18) reassignment (reference ``generator.py:141-163``)."""
    lo_s = F.unix_timestamp(lo)
    hi_s = F.unix_timestamp(hi)
    span = F.greatest(hi_s - lo_s, F.lit(1))
    base = lo_s + (_u(seed_col, salt) * span).cast("long")
    # 70%: snap hour into 9..17, keep minute/second.  The day boundary
    # is the UTC epoch-day floor computed ARITHMETICALLY — a
    # date_trunc("day") here would move with the session timezone,
    # making the synthesized values (and every checksum over them)
    # config-dependent.
    biased_hour = (9 + (_u(seed_col, salt + "_bh") * 9).cast("long"))
    day_start = base - F.pmod(base, F.lit(86400))
    in_day = base - day_start
    snapped = day_start + biased_hour * 3600 + F.pmod(in_day, F.lit(3600))
    use_bias = _u(seed_col, salt + "_p") < 0.70
    chosen = F.when(use_bias, snapped).otherwise(base)
    # the hour snap can move within-day times before ``lo`` (e.g. a child
    # row on its parent's creation day) — clamp to preserve the
    # parent-before-child invariant (reference generator.py:251-254)
    return F.timestamp_seconds(F.greatest(chosen, lo_s))


def customers(spark: SparkSession, n: int, seed: str = "s42") -> DataFrame:
    """Customer rows with synthesized names/emails (reference
    ``generator.py:185-208``): email = first.last+id@domain, lowercase —
    id suffix plays the md5-uniquifier role (``generator.py:111``)
    while keeping emails UNIQUE by construction (``SCHEMA.sql:6``)."""
    ids = spark.range(1, n + 1).withColumnRenamed("id", "id")
    first = F.element_at(
        F.array(*[F.lit(x) for x in FIRST_NAMES]),
        (_u(F.col("id"), seed + "fn") * len(FIRST_NAMES)).cast("int") + 1,
    )
    last = F.element_at(
        F.array(*[F.lit(x) for x in LAST_NAMES]),
        (_u(F.col("id"), seed + "ln") * len(LAST_NAMES)).cast("int") + 1,
    )
    created = _ts_between(
        F.col("id"), seed + "ct",
        F.timestamp_seconds(F.lit(EPOCH_2020)),
        F.timestamp_seconds(F.lit(EPOCH_2025)),
    )
    # nested address struct (reference generator.py:125-133 builds one
    # via faker; deterministic pool draws here — schemas.ADDRESS shape)
    def pick(pool: list[str], salt: str):
        return F.element_at(
            F.array(*[F.lit(x) for x in pool]),
            (_u(F.col("id"), seed + salt) * len(pool)).cast("int") + 1,
        )

    street = F.concat_ws(
        " ",
        ((_u(F.col("id"), seed + "hn") * 9899).cast("int") + 100).cast("string"),
        F.initcap(pick(LAST_NAMES, "stn")),
        pick(["St", "Ave", "Blvd", "Ln"], "sts"),
    )
    address = F.struct(
        street.alias("street"),
        pick(CITIES, "ci").alias("city"),
        pick(STATES, "sta").alias("state"),
        F.lpad(((_u(F.col("id"), seed + "pc") * 99999).cast("int") + 1).cast("string"),
               5, "0").alias("postal_code"),
        pick(COUNTRIES, "co").alias("country"),
    )
    return ids.select(
        F.col("id"),
        F.initcap(first).alias("first_name"),
        F.initcap(last).alias("last_name"),
        F.concat_ws("", first, F.lit("."), last, F.col("id").cast("string"),
                    F.lit("@example.com")).alias("email"),
        address.alias("address"),
        created.alias("created_at"),
    )


def accounts(customers_df: DataFrame, seed: str = "s42") -> DataFrame:
    """1-4 accounts per customer via ``explode(sequence(...))`` — the
    grouped fan-out loop (reference ``generator.py:220-268``) with 90%
    of customers guaranteed a CHECKING account (``generator.py:222-225``)."""
    n_accts = 1 + (_u(F.col("id"), seed + "na") * 4).cast("int")
    exploded = (
        customers_df.select(
            F.col("id").alias("customer_id"),
            F.col("created_at").alias("cust_created_at"),
            F.posexplode(F.sequence(F.lit(1), n_accts)).alias("slot", "_one"),
        )
    )
    acct_seed = F.col("customer_id") * 16 + F.col("slot")
    acct_type = _weighted(
        acct_seed, seed + "ty",
        [("SAVINGS", 0.35), ("CHECKING", 0.35), ("BUSINESS", 0.15), ("INVESTMENT", 0.15)],
    )
    # slot 0 → CHECKING for 90% of customers (generator.py:222-225)
    first_checking = (F.col("slot") == 0) & (_u(F.col("customer_id"), seed + "fc") < 0.90)
    currency = _weighted(
        acct_seed, seed + "cur",
        [("USD", 0.60), ("EUR", 0.15), ("GBP", 0.10), ("INR", 0.08),
         ("CAD", 0.04), ("AUD", 0.03)],
    )
    balance = round_down(_u(acct_seed, seed + "bal") * 100000.0)
    created = _ts_between(
        acct_seed, seed + "act",
        F.col("cust_created_at"),
        F.timestamp_seconds(F.lit(EPOCH_2025)),
    )
    return exploded.select(
        (F.col("customer_id") * 16 + F.col("slot")).alias("id"),
        F.col("customer_id"),
        F.when(first_checking, "CHECKING").otherwise(acct_type).alias("account_type"),
        balance.alias("balance"),
        currency.alias("currency"),
        created.alias("created_at"),
    )


# per-type amount ranges (reference generator.py:38-46)
_AMOUNT_RANGES = {
    "DEPOSIT": (10.0, 5000.0),
    "WITHDRAWAL": (10.0, 2000.0),
    "TRANSFER": (10.0, 10000.0),
    "PAYMENT": (5.0, 3000.0),
    "REFUND": (5.0, 500.0),
    "FEE": (1.0, 50.0),
    "INTEREST": (1.0, 200.0),
}


def transactions(accounts_df: DataFrame, per_account: int = 4, seed: str = "s42") -> DataFrame:
    """Transactions fan-out (reference ``generator.py:273-319``):
    weighted type/status, per-type amount ranges with round-number bias
    and the ≥ 1.00 clamp, txn ts ≥ account ts, TRANSFER rows linked to
    a counterparty account (40% same-customer heuristic approximated by
    hashing within the account-id space)."""
    exploded = accounts_df.select(
        F.col("id").alias("account_id"),
        F.col("customer_id"),
        F.col("created_at").alias("acct_created_at"),
        F.posexplode(F.sequence(F.lit(1), F.lit(per_account))).alias("slot", "_one"),
    )
    txn_seed = F.col("account_id") * 1024 + F.col("slot")
    txn_type = _weighted(
        txn_seed, seed + "tt",
        [("DEPOSIT", 0.25), ("WITHDRAWAL", 0.20), ("TRANSFER", 0.25),
         ("PAYMENT", 0.15), ("REFUND", 0.05), ("FEE", 0.05), ("INTEREST", 0.05)],
    )
    status = _weighted(
        txn_seed, seed + "st",
        [("COMPLETED", 0.85), ("PENDING", 0.08), ("FAILED", 0.04), ("CANCELLED", 0.03)],
    )
    # amount: uniform in the per-type range, 30% rounded to a multiple of
    # 10 (generator.py:286-289), clamped ≥ 1.00 (generator.py:292)
    u_amt = _u(txn_seed, seed + "am")
    amount_raw = None
    for t, (lo, hi) in _AMOUNT_RANGES.items():
        e = F.lit(lo) + u_amt * F.lit(hi - lo)
        amount_raw = F.when(txn_type == t, e) if amount_raw is None else amount_raw.when(txn_type == t, e)
    rounded = (F.round(amount_raw / 10) * 10).cast("double")
    amount = F.greatest(
        round_down(F.when(_u(txn_seed, seed + "rb") < 0.30, rounded).otherwise(amount_raw)),
        F.lit(1.00).cast("decimal(18,2)"),
    )
    created = _ts_between(
        txn_seed, seed + "tct",
        F.col("acct_created_at"),
        F.timestamp_seconds(F.lit(EPOCH_2025)),
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
    def n_accts_of(cust: Column) -> Column:
        return 1 + (_u(cust, seed + "na") * 4).cast("int")

    max_cust = accounts_df.agg(
        F.max("customer_id").alias("__max_cust")
    ).withColumn("__one", F.lit(1))
    exploded = exploded.withColumn("__one", F.lit(1)).join(
        F.broadcast(max_cust), "__one"
    ).drop("__one")
    other_cust = F.least(
        (_u(txn_seed, seed + "oth") * F.col("__max_cust")).cast("long") + 1,
        F.col("__max_cust"),
    )
    related = F.when(
        txn_type == "TRANSFER",
        F.when(
            _u(txn_seed, seed + "sc") < 0.40,
            F.col("customer_id") * 16
            + (_u(txn_seed, seed + "sib") * n_accts_of(F.col("customer_id"))).cast("long"),
        ).otherwise(
            other_cust * 16
            + (_u(txn_seed, seed + "slt") * n_accts_of(other_cust)).cast("long")
        ),
    )
    return exploded.select(
        txn_seed.alias("id"),
        F.col("account_id"),
        txn_type.alias("txn_type"),
        amount.alias("amount"),
        related.alias("related_account_id"),
        status.alias("status"),
        created.alias("created_at"),
    )


def banking_star(
    spark: SparkSession, n_customers: int = 100, txns_per_account: int = 4, seed: str = "s42"
) -> dict[str, DataFrame]:
    """One generator "iteration" at DataFrame scale (reference
    ``generator.py:181`` run_iteration): the three dependency-ordered
    tables, ready for bulk write."""
    c = customers(spark, n_customers, seed)
    a = accounts(c, seed)
    t = transactions(a, txns_per_account, seed)
    return {"customers": c, "accounts": a, "transactions": t}
