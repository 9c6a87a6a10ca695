"""Column-level dynamic data masking — the structured-data complement
of the text-side PII redaction (``operators/text.py redact_pii``).

The reference stores customer PII (names, emails — reference
``SCHEMA.sql:4-6``) and serves it to every downstream consumer
unmasked; a lakehouse serving layer needs per-column policies.  Four
policies, all pure JVM expressions (codegen'd, no UDF):

- ``hash``: deterministic md5 pseudonym — JOINABLE (the same value
  masks identically everywhere, so fact/dim joins still line up) but
  not reversible without the original;
- ``partial``: keep the LAST 4 characters, star the rest (values of
  4 or fewer characters star out entirely — never an identity mask) —
  the card-number / account display convention;
- ``bucket:N``: numeric generalization to floor-of-N buckets
  (k-anonymity-style coarsening that keeps aggregates meaningful);
- ``null``: full suppression (type-preserving NULL).

Masked columns keep their name and type, so a masked frame is a
drop-in replacement for the unmasked one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the supported policy set is defined by _mask_expr below ("hash",
# "partial", "null", parameterized "bucket:N") — a separate POLICIES
# constant drifted from it (it omitted bucket:N) and had no callers,
# so the function stays the single source of truth (r07 review)


def _mask_expr(col: Column, dtype: str, policy: str) -> Column:
    if policy == "hash":
        return F.md5(col.cast("string").cast("binary"))
    if policy == "partial":
        s = col.cast("string")
        # values of length <= 4 mask FULLY — keeping the last 4 of a
        # 4-char value would be an identity function, not a mask
        keep = F.when(F.length(s) > 4, F.substring(s, -4, 4)).otherwise(F.lit(""))
        stars = F.repeat(
            F.lit("*"),
            F.when(F.length(s) > 4, F.length(s) - 4).otherwise(F.length(s)),
        )
        return F.concat(stars, keep)
    if policy == "null":
        return F.lit(None).cast(dtype)
    if policy.startswith("bucket:"):
        width = int(policy.split(":", 1)[1])
        if width <= 0:
            raise ValueError(f"bucket width must be positive: {policy!r}")
        return (F.floor(col / F.lit(width)) * F.lit(width)).cast(dtype)
    raise ValueError(f"unknown masking policy {policy!r}")


def apply_policy(df: DataFrame, policy: dict[str, str]) -> DataFrame:
    """Apply per-column masking policies; unlisted columns pass
    through.  ``hash``/``partial`` force the column to string (a
    pseudonym is not the original type); ``null`` and ``bucket:N``
    preserve the declared type."""
    types = dict(df.dtypes)
    for c in policy:
        if c not in types:
            raise ValueError(f"unknown column {c!r} in masking policy")
    out_cols = []
    for c in df.columns:
        if c in policy:
            out_cols.append(_mask_expr(F.col(c), types[c], policy[c]).alias(c))
        else:
            out_cols.append(F.col(c))
    return df.select(*out_cols)
