"""end_end_data_pipeline__spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference CDC/ETL pipeline
(``ARVIND-36/END-END-DATA-PIPELINE-``, surveyed in ``SURVEY.md``) as an
idiomatic Spark engine:

- batch relational layer (joins, aggregations, windows, set ops) over
  explicit-schema Parquet lake tables (``sources.lake``),
- a CDC envelope decode + latest-wins upsert streaming core
  (``sources.cdc``, ``streaming``), fixing the reference's append-only
  consumer (reference ``consumer/consumer.py:66-75``),
- LLM-training-data operators (dedup, similarity search, text analysis,
  multimodal column plumbing) in ``operators``.

Everything is DataFrame/SQL-first: Catalyst owns planning; Python UDFs
appear only as Arrow-batched pandas UDFs where built-ins genuinely
cannot express the semantics.
"""

__version__ = "0.1.0"

from end_end_data_pipeline__spark.session import get_spark  # noqa: F401
