"""Event-time windowing (SURVEY.md ST2-ST4): tumbling, sliding, and
session windows with watermarks.

The reference buckets by *processing* time (``datetime.now()`` at flush,
reference ``consumer/consumer.py:45,48``) even though rows carry event
time — every record is effectively "late".  These operators are
event-time-correct; the faithful processing-time layout remains
available via ``sources.lake.write_date_partitioned``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str,
    width: str,
    group_cols: list[str],
    aggs: list,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation (ST2).  With a watermark
    (streaming), state for windows older than max(event time) − delay is
    dropped and late rows beyond it are discarded (ST3)."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return df.groupBy(F.window(F.col(ts_col), width), *group_cols).agg(*aggs)


def sliding_agg(
    events: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    group_cols: list[str],
    aggs: list,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) window aggregation (ST4): each event lands in
    width/slide windows."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return df.groupBy(F.window(F.col(ts_col), width, slide), *group_cols).agg(*aggs)


def session_agg(
    events: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list,
    watermark: str | None = None,
) -> DataFrame:
    """Session window aggregation (ST4): events within ``gap`` of each
    other merge into one session [min ts, max ts + gap) per group."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return df.groupBy(F.session_window(F.col(ts_col), gap), *group_cols).agg(*aggs)
