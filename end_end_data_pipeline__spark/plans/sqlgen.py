"""Shared SQL fragments for the DuckDB oracle side of the catalog.

Mirrors ``functions.scalar.dec_sum``/``dec_avg``: double aggregates are
accumulated as exact decimals (order-independent) and cast back to
double, so the oracle and the distributed Spark plan agree bit-for-bit.
"""

from __future__ import annotations


def dsum(expr: str, alias: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
