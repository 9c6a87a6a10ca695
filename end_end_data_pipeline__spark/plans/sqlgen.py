"""Shared SQL fragments for the DuckDB oracle side of the catalog.

Mirrors ``functions.scalar.dec_sum``/``dec_avg``: double aggregates are
accumulated as exact decimals (order-independent) and cast back to
double, so the oracle and the distributed Spark plan agree bit-for-bit.

The final decimal→double step goes THROUGH A STRING (r08): a direct
``CAST(decimal AS DOUBLE)`` in DuckDB divides the int128 payload by
10^scale in double arithmetic — two roundings, up to 1 ULP off the
correctly-rounded value (measured: the sf1-derived gate caught
``agg_pricing_summary``'s sum_charge at ...941593 vs the true ...94159,
which Spark — exact BigDecimal conversion — got right).  decimal→string
is exact in both engines and string→double parsing is correctly rounded
in both (fast_float / Double.parseDouble), so the round-trip pins BOTH
engines to the correctly-rounded double by construction.  These
fragments run verbatim in BOTH engines (the TPC-H tier executes one
shared SQL text), so the pin applies to each side identically.

Asymmetry with ``functions.scalar.dec_sum`` (its DataFrame mirror):
that helper direct-casts decimal→double WITHOUT the string round-trip
— deliberately, because Spark's conversion is an exact
``BigDecimal.doubleValue()`` (already correctly rounded), so both
paths land on the same bits.  The round-trip here is the DuckDB-side
pin only; keep the two docstrings in sync if either policy changes.
"""

from __future__ import annotations


def dsum(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS STRING)"
        f" AS DOUBLE) AS {alias}"
    )


def davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS STRING)"
        f" AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
