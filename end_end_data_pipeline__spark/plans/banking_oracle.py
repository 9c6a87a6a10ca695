"""DuckDB replay of the banking-star synthesis (VERDICT r07 task 5).

``banking_generator_fanout``'s oracle used to PIN its three summary
rows as VALUES literals — a determinism check, not an independent
recompute.  This module generates DuckDB SQL that re-derives the
ENTIRE fan-out from the seed string alone: every u32 draw, threshold
ladder, index pick, business-hours timestamp snap, integer-cent
amount, and counterparty FK is replayed with the exact integer
arithmetic of :mod:`..sources.datagen` (md5 hash family), sharing the
pool lists and threshold constants so the two engines cannot drift.

Everything the two engines compare crosses as INTEGERS or pool
strings — no float compare, no double→decimal cast, no timezone-
dependent calendar op (epoch-seconds discipline throughout), which is
what makes a bit-exact cross-engine replay of ~1,200 synthesized rows
possible at all.
"""

from __future__ import annotations

from end_end_data_pipeline__spark.sources import datagen as dg


def _u32(expr: str, salt: str) -> str:
    """The md5-family u32 draw — DuckDB twin of ``datagen._u32``."""
    return ("(('0x' || substr(md5(CAST(" + expr + " AS VARCHAR) || '|"
            + salt + "'), 1, 8))::BIGINT)")


def _scaled(u32: str, n: str | int) -> str:
    """``floor(uniform * n)`` = ``(u32 * n) >> 32`` — ``datagen._scaled``."""
    return f"(({u32} * {n}) >> 32)"


def _pick(pool: list[str], expr: str, salt: str) -> str:
    lst = "['" + "','".join(pool) + "']"
    idx = _scaled(_u32(expr, salt), len(pool))
    return f"(({lst})[CAST({idx} AS INTEGER) + 1])"


def _initcap(expr: str) -> str:
    return f"(upper(substr({expr}, 1, 1)) || substr({expr}, 2))"


def _ladder(choices: list[tuple[str, float]], u32: str) -> str:
    """Integer-threshold CASE ladder — twin of ``datagen._weighted``."""
    steps, last = dg.cum_thresholds(choices)
    whens = " ".join(
        f"WHEN {u32} < {thr} THEN '{value}'" for value, thr in steps
    )
    return f"(CASE {whens} ELSE '{last}' END)"


def _ts(expr: str, salt: str, lo: str, hi: str) -> str:
    """Epoch-seconds draw with the 70% business-hours snap — twin of
    ``datagen._ts_between_s`` (pure integer, UTC epoch-day grid)."""
    span = f"GREATEST({hi} - {lo}, 1)"
    base = f"({lo} + {_scaled(_u32(expr, salt), span)})"
    bh = f"(9 + {_scaled(_u32(expr, salt + '_bh'), 9)})"
    day = f"({base} - ({base} % 86400))"
    snapped = f"({day} + {bh} * 3600 + (({base} - {day}) % 3600))"
    biased = (f"(CASE WHEN {_u32(expr, salt + '_p')} < {dg.THR_BIZ_HOURS} "
              f"THEN {snapped} ELSE {base} END)")
    return f"GREATEST({biased}, {lo})"


def _canon(parts: list[str]) -> str:
    """Sum-ready u32 of the canonical '|'-joined row string — twin of
    the Spark query's ``canon`` (NULLs → '~N~' sentinel)."""
    joined = " || '|' || ".join(
        f"COALESCE(CAST({p} AS VARCHAR), '~N~')" for p in parts
    )
    return f"(('0x' || substr(md5({joined}), 1, 8))::BIGINT)"


def fanout_oracle_sql(n_customers: int = 100, per_account: int = 4,
                      seed: str = "s42") -> str:
    """The full customers→accounts→transactions replay as one DuckDB
    statement returning (table_name, n_rows, id_sum, row_checksum)."""
    n_accts_c = f"(1 + {_scaled(_u32('c.id', seed + 'na'), 4)})"

    cust = f"""
    cust AS (
        SELECT g.id AS id,
               {_pick(dg.FIRST_NAMES, 'g.id', seed + 'fn')} AS first,
               {_pick(dg.LAST_NAMES, 'g.id', seed + 'ln')} AS last,
               {_ts('g.id', seed + 'ct', str(dg.EPOCH_2020), str(dg.EPOCH_2025))} AS created_s,
               CAST({_scaled(_u32('g.id', seed + 'hn'), 9899)} + 100 AS VARCHAR)
                   || ' ' || {_initcap(_pick(dg.LAST_NAMES, 'g.id', seed + 'stn'))}
                   || ' ' || {_pick(dg.STREET_TYPES, 'g.id', seed + 'sts')} AS street,
               {_pick(dg.CITIES, 'g.id', seed + 'ci')} AS city,
               {_pick(dg.STATES, 'g.id', seed + 'sta')} AS state,
               lpad(CAST({_scaled(_u32('g.id', seed + 'pc'), 99999)} + 1 AS VARCHAR),
                    5, '0') AS postal_code,
               {_pick(dg.COUNTRIES, 'g.id', seed + 'co')} AS country
        FROM generate_series(1, {n_customers}) g(id)
    )"""

    acct0 = f"""
    slots AS (SELECT * FROM (VALUES (0),(1),(2),(3)) s(slot)),
    acct0 AS (
        SELECT c.id * 16 + s.slot AS id,
               c.id AS customer_id,
               s.slot AS slot,
               c.created_s AS cust_created_s
        FROM cust c JOIN slots s ON s.slot < {n_accts_c}
    )"""

    acct = f"""
    acct AS (
        SELECT id, customer_id, slot,
               CASE WHEN slot = 0
                         AND {_u32('customer_id', seed + 'fc')} < {dg.THR_FIRST_CHECKING}
                    THEN 'CHECKING'
                    ELSE {_ladder(dg.ACCT_TYPE_WEIGHTS, _u32('id', seed + 'ty'))}
               END AS account_type,
               {_u32('id', seed + 'bal')} % {dg.BALANCE_CENTS_MOD} AS balance_cents,
               {_ladder(dg.CURRENCY_WEIGHTS, _u32('id', seed + 'cur'))} AS currency,
               {_ts('id', seed + 'act', 'cust_created_s', str(dg.EPOCH_2025))} AS created_s
        FROM acct0
    )"""

    amt_case = " ".join(
        f"WHEN txn_type = '{t}' THEN {lo} + {_scaled('u_am', hi - lo)}"
        for t, (lo, hi) in dg.AMOUNT_RANGES_CENTS.items()
    )
    n_accts_of = lambda c: f"(1 + {_scaled(_u32(c, seed + 'na'), 4)})"  # noqa: E731
    txn = f"""
    tslots AS (SELECT * FROM (VALUES {','.join(f'({i})' for i in range(per_account))}) s(slot)),
    txn0 AS (
        SELECT a.id * 1024 + s.slot AS id,
               a.id AS account_id,
               a.customer_id,
               a.created_s AS acct_created_s
        FROM acct a JOIN tslots s ON TRUE
    ),
    txn1 AS (
        SELECT *,
               {_ladder(dg.TXN_TYPE_WEIGHTS, _u32('id', seed + 'tt'))} AS txn_type,
               {_ladder(dg.STATUS_WEIGHTS, _u32('id', seed + 'st'))} AS status,
               {_u32('id', seed + 'am')} AS u_am,
               LEAST({_scaled(_u32('id', seed + 'oth'),
                              '(SELECT MAX(customer_id) FROM acct)')} + 1,
                     (SELECT MAX(customer_id) FROM acct)) AS other_cust
        FROM txn0
    ),
    txn2 AS (
        SELECT *, (CASE {amt_case} END) AS amount_cents_raw
        FROM txn1
    ),
    txn AS (
        SELECT id, account_id, txn_type, status,
               GREATEST(
                   CASE WHEN {_u32('id', seed + 'rb')} < {dg.THR_ROUND_BIAS}
                        THEN (amount_cents_raw + 500)
                             - ((amount_cents_raw + 500) % 1000)
                        ELSE amount_cents_raw END,
                   100) AS amount_cents,
               CASE WHEN txn_type = 'TRANSFER' THEN
                    CASE WHEN {_u32('id', seed + 'sc')} < {dg.THR_SAME_CUSTOMER}
                         THEN customer_id * 16
                              + {_scaled(_u32('id', seed + 'sib'), n_accts_of('customer_id'))}
                         ELSE other_cust * 16
                              + {_scaled(_u32('id', seed + 'slt'), n_accts_of('other_cust'))}
                    END
               END AS related_account_id,
               {_ts('id', seed + 'tct', 'acct_created_s', str(dg.EPOCH_2025))} AS created_s
        FROM txn2
    )"""

    cust_h = _canon(["c.id", _initcap("c.first"), _initcap("c.last"),
                     "c.first || '.' || c.last || CAST(c.id AS VARCHAR) || '@example.com'",
                     "c.street", "c.city", "c.state", "c.postal_code",
                     "c.country", "c.created_s"])
    acct_h = _canon(["id", "customer_id", "account_type", "balance_cents",
                     "currency", "created_s"])
    txn_h = _canon(["id", "account_id", "txn_type", "amount_cents",
                    "related_account_id", "status", "created_s"])

    return f"""
    WITH {cust},{acct0},{acct},{txn}
    SELECT 'customers' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(c.id) AS BIGINT) AS id_sum,
           CAST(SUM({cust_h}) AS BIGINT) AS row_checksum
    FROM cust c
    UNION ALL
    SELECT 'accounts', CAST(COUNT(*) AS BIGINT), CAST(SUM(id) AS BIGINT),
           CAST(SUM({acct_h}) AS BIGINT)
    FROM acct
    UNION ALL
    SELECT 'transactions', CAST(COUNT(*) AS BIGINT), CAST(SUM(id) AS BIGINT),
           CAST(SUM({txn_h}) AS BIGINT)
    FROM txn
    """
