"""Local replica of the driver's Spark-vs-DuckDB correctness check:
run a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compare row count, column names, and
order-insensitive values (sorted columns, sorted rows)."""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    # the oracle is the FIXED reference: pin its session zone so a
    # hostile TZ env var exercises only the engine side (DuckDB's
    # TIMESTAMPTZ↔naive casts and epoch conversions follow the session
    # zone, which defaults to the environment's) — mirrors the Spark
    # side's own UTC pin in session.get_spark / lake.load_table
    con.execute("SET TimeZone='UTC'")
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; Spark-written sets (e.g. the
        # derived-decade dirs from scripts/make_sf1_derived.py) are
        # DIRECTORIES of part files — DuckDB needs an explicit glob.
        # RECURSIVE (**) so a Hive-partitioned layout (key=…/part-*)
        # still resolves, and assert the glob matched: an empty view
        # here would surface later as a baffling row-count mismatch
        # (ADVICE r08).
        if os.path.isdir(path):
            import glob as _glob

            pat = f"{path}/**/*.parquet"
            if not _glob.glob(pat, recursive=True):
                raise FileNotFoundError(f"no parquet part files under {path}")
            path = pat
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchdf()


def _norm_cell(v: Any) -> Any:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)  # full precision
    if isinstance(v, pd.Timestamp):
        # tz-aware values only arise when the parquet marks its
        # timestamps isAdjustedToUTC (Spark-written derived fixtures);
        # the oracle session is pinned to UTC, so converting to naive
        # UTC is exact and makes the rendering match the Spark side's
        # naive (session-UTC) timestamps.  Driver fixtures are naive
        # on both sides and take the fast path.
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def compare_structured(sp: pd.DataFrame, duck_df: pd.DataFrame) -> dict:
    """Structured facets of the oracle match over two PANDAS frames —
    the single definition of "matches" shared by :func:`compare` (the
    driver-shaped message list) and structured consumers like
    ``scripts/sf1_dedup_gate.py`` (ADVICE r09: no substring-matching of
    human-readable messages, no drift between parallel
    implementations).  ``rows_match``/``hash_match`` are None when an
    earlier facet already failed (the driver's convention: a facet
    that was never evaluated is not True)."""
    out: dict = {"schema_match": None, "rows_match": None,
                 "hash_match": None, "err": None}
    if sorted(sp.columns) != sorted(duck_df.columns):
        out["schema_match"] = False
        out["err"] = (f"columns: spark={sorted(sp.columns)} "
                      f"duck={sorted(duck_df.columns)}")
        return out
    out["schema_match"] = True
    out["rows_match"] = len(sp) == len(duck_df)
    a, b = _canon(sp), _canon(duck_df)
    out["hash_match"] = bool(out["rows_match"] and a == b)
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
    if not out["rows_match"]:
        # keep the value-diff detail alongside the count mismatch
        # (ADVICE r10: the structured rewrite had dropped it)
        out["err"] = f"row count: spark={len(sp)} duck={len(duck_df)}"
        if diffs:
            out["err"] += (f"; first diffs={diffs} "
                           f"len_delta={abs(len(a) - len(b))}")
    elif not out["hash_match"]:
        out["err"] = (f"values differ; first diffs={diffs} "
                      f"len_delta={abs(len(a) - len(b))}")
    return out


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    facets = compare_structured(spark_df.toPandas(), duck_df)
    return [facets["err"]] if facets["err"] else []
