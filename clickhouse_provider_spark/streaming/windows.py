"""Watermarked windowed aggregations over the event stream — the
Structured Streaming form of the serving layer's time-bucket rollups
(daily_counts / time_range classes).

The canonical ns-long timestamps become TimestampType at µs precision for
Spark's event-time machinery (window() + withWatermark operate on
timestamps); the watermark bounds state for late data: windows older than
(max event time − delay) finalize and evict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(events: DataFrame, ns_col: str = "ts") -> DataFrame:
    """Attach an `event_time` TimestampType column from canonical Long ns
    (µs truncation — same floor semantics as the serving layer's ts DIV
    1000)."""
    return events.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ns_col} DIV 1000"))
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Tumbling-window counts per event_type with a late-data watermark.
    Works on both a stream (stateful windowed agg, append-finalized by the
    watermark) and a batch frame (same plan minus state) — the batch run
    is the oracle for the streaming test."""
    df = with_event_time(events)
    if streaming:
        df = df.withWatermark("event_time", watermark)
    # exact count-distinct is not stream-executable (unbounded per-window
    # dedup state) — streams use approx_count_distinct if needed; here we
    # keep the aggregates exact AND stream-safe: count + decimal sum
    return (
        df.groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only until
    the watermark passes it, then evicts — the stream form of the batch
    ``dedup_exact`` operator and the ingest-time guard ClickHouse gets
    from ReplacingMergeTree merges (reference README.md ReplacingMergeTree
    DDL; our batch twin is storage.py's dedup-on-read).

    Contract: duplicates arriving within the watermark delay of the first
    occurrence are dropped; a duplicate arriving later than the delay MAY
    be re-emitted (its fingerprint was evicted) — exactly the replay
    window the reference absorbs with ReplacingMergeTree, so downstream
    sinks still apply sort-key dedup-on-read. State is O(distinct keys
    per watermark window), independent of stream length — the property
    that makes exact streaming dedup viable at 100 TB/day.
    """
    df = with_event_time(events)
    df = df.withWatermark("event_time", watermark)
    return df.dropDuplicatesWithinWatermark(keys or ["event_id"])
