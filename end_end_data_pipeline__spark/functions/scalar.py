"""Scalar expression helpers (SURVEY.md §2.8, F1-F13).

All JVM-side Catalyst expressions — no Python UDFs.  The two families:

- oracle-parity numeric aggregation (``dec_sum``/``dec_avg``): doubles
  are accumulated as exact decimals so the result is independent of
  partition/association order, then cast back to double.  This makes
  Spark's parallel aggregation bit-identical to any sequential engine
  (the DuckDB oracle), and at cluster scale it is also *more* correct
  than naive double summation (no catastrophic cancellation drift).
- CDC decimal policy (``to_money``/``micros_to_ts``/``round_down``):
  the reference transports NUMERIC(18,2) as double and timestamptz as
  epoch-micros (reference ``Connector_post_and_generate.py:29``,
  envelope shape ``consumer/consumer.py:66-67``); the silver layer
  restores lake types with these, and ``round_down`` reproduces the
  generator's ROUND_DOWN quantize (reference ``generator.py:78-80``)
  which differs from Spark's HALF_UP ``round``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Money / numeric ------------------------------------------------------------

MONEY = "decimal(18,2)"
# Wide-enough accumulator for sums of row-level money expressions; scale 6
# keeps product expressions (price * (1-discount)) exact to the microcent.
ACC = "decimal(25,6)"


def dec_sum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent SUM of a double column: exact-decimal accumulate,
    double result. Mirror SQL: ``sqlgen.dsum``.

    Asymmetry note (r08/r09): ``sqlgen.dsum`` routes its final
    decimal→double step through a STRING because DuckDB's direct cast
    double-rounds (int128 / 10^scale in double arithmetic — up to
    1 ULP off).  Spark's own decimal→double is an exact
    ``BigDecimal.doubleValue()`` (correctly rounded by construction),
    so the direct cast here is already the value the string round-trip
    would produce — the round-trip is a DuckDB-side pin, not a shared
    requirement."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG: exact-decimal sum divided by count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(25,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def exact_mean_std(
    n: Column, s: Column, s2: Column, unit: float = 1.0
) -> tuple[Column, Column]:
    """Mean and population std from EXACT integer/decimal moments
    (n, Σx, Σx²), as the one double expression tree every
    moments-based query must share for bit-parity with its oracle:
    ``mean = s / (n·unit)``, ``std = sqrt((n·s2 − s²) / (n²·unit²))``.
    ``unit`` rescales quantized moments (e.g. a 10⁴ quantization
    grid); the extra ×unit multiplications are exact for the powers
    of ten used here.  ``s``/``s2`` must be decimal(38,0)-accumulated
    so the subtraction happens exactly before the single double cast.
    Mirror SQL: spell the identical tree in the oracle.
    """
    n_dec = n.cast("decimal(38,0)")
    nd = n.cast("double")
    mean = s.cast("double") / (nd * F.lit(float(unit)))
    std = F.sqrt(
        (n_dec * s2 - s * s).cast("double")
        / (nd * nd * F.lit(float(unit) * float(unit)))
    )
    return mean, std


def to_money(col: Column | str) -> Column:
    """CDC double -> DECIMAL(18,2) at the silver layer."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def round_down(col: Column | str, places: int = 2) -> Column:
    """Truncate toward zero at ``places`` decimals (ROUND_DOWN quantize,
    reference ``generator.py:78-80``) — Spark's ``round`` is HALF_UP.
    Implemented as sign-split floor of the MAGNITUDE: a bare
    ``floor(x·10^p)`` truncates toward −∞, which on a negative money
    value is off by one cent vs Decimal ROUND_DOWN (floor(−123.5) =
    −124, ROUND_DOWN gives −123).  Positive inputs take the identical
    floor path as before."""
    c = F.col(col) if isinstance(col, str) else col
    factor = 10**places
    mag = F.floor(F.abs(c.cast(ACC)) * factor) / factor
    return F.when(c < 0, -mag).otherwise(mag).cast(MONEY)


def micros_to_ts(col: Column | str) -> Column:
    """Debezium epoch-micros long -> TimestampType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(c)


# Banking sign semantics live in plans/marts.py (SIGN map +
# signed_amount): a zero-caller duplicate here used to treat NULL /
# unrecognized txn types as DEBITS while the marts form maps them to 0
# — two sign conventions for the same SURVEY A9 rule was a correctness
# trap for whichever one a future caller picked (r07 review).
