"""Multi-format lake IO: one read/write surface over parquet, ORC,
CSV, and JSON files.

The reference's lake layer writes exactly one format (pandas
``to_parquet`` per micro-batch, reference ``consumer/consumer.py:44-48``)
and INFERS its schema per batch — the fidelity hazard SURVEY.md §1.2
calls out.  This module is the engine's format surface with that
hazard removed: every read PINS an explicit schema (no inference, no
per-batch drift), and text formats carry an explicit microsecond
timestamp format so a timestamp survives parquet → CSV → parquet
byte-identically.

Format guidance at scale (docstring contract, enforced by tests):

- **parquet / ORC**: columnar, compressed, predicate + column pushdown
  (`PushedFilters` in the scan plan) — the only formats for large
  persistent tables.
- **CSV / JSON**: interchange only — row-oriented, no pushdown beyond
  partition pruning, whole-row parse cost even for one column.  The
  engine reads them for ingest and writes them for export, never as
  the lake format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# microsecond-precision, timezone-stable wire format for text formats
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

FORMATS = ("parquet", "orc", "csv", "json")


def _text_options(reader_or_writer, fmt: str):
    if fmt == "csv":
        return reader_or_writer.option("header", True).option(
            "timestampFormat", TS_FMT
        )
    if fmt == "json":
        return reader_or_writer.option("timestampFormat", TS_FMT)
    return reader_or_writer


def write_files(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` as ``fmt`` files under ``path``."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (use one of {FORMATS})")
    _text_options(df.write.mode(mode), fmt).format(fmt).save(path)


def read_files(
    spark: SparkSession, path: str, fmt: str, schema: StructType
) -> DataFrame:
    """Read ``fmt`` files under ``path`` with the schema PINNED —
    schema inference is refused by design (the reference's per-batch
    pandas inference produced drifting lake files)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (use one of {FORMATS})")
    if schema is None:
        raise ValueError("schema is required — inference is refused by design")
    return _text_options(spark.read.schema(schema), fmt).format(fmt).load(path)
