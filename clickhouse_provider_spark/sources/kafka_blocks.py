"""Kafka block-source variant (reference: the fetcher daemon consumes an
ordered block feed, src/main.rs:91-99 — on a real deployment the same feed
is commonly re-published to a Kafka topic; this module is the documented
mapping of every fetcher guarantee onto Spark's Kafka source).

Guarantee mapping:

- **ordered re-emit** — Kafka preserves order *within* a partition. A
  single-partition topic gives total height order (matching the fetcher's
  ordered channel); a multi-partition topic keyed by ``height`` gives
  per-partition order, and the downstream tx-assembly state already
  tolerates out-of-order arrival across partitions (same guarantee the
  file source provides under same-mtime reordering).
- **backpressure** — ``maxOffsetsPerTrigger`` caps each micro-batch, the
  bounded-channel analog (mpsc::channel(100), main.rs:91).
- **resume** — the streaming checkpoint stores Kafka offsets; restart
  resumes exactly where the last committed batch ended (the reference's
  ``max(height)+1`` resume, main.rs:81-90, without a DB round-trip).
  ``starting_offsets_json`` builds an explicit override for backfills.
- **auth** — SASL/SSL options pass through ``extra_options`` (the bearer
  token analog, main.rs:65).

The payload transformation (:func:`kafka_payload_to_blocks`) is pure
DataFrame ops — ``from_json`` with BLOCK_SCHEMA runs JVM-side — and is
shared by the real Kafka reader and the tests (which feed a kafka-shaped
DataFrame, since the container has no broker or kafka connector jar).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_provider_spark.schemas import BLOCK_SCHEMA

# The fixed schema Spark's Kafka source emits (docs: Structured Streaming
# + Kafka integration guide). Tests construct DataFrames with this shape.
KAFKA_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp")


def kafka_payload_to_blocks(raw: DataFrame) -> DataFrame:
    """Kafka records → typed block rows.

    ``value`` is the raw block JSON (binary); parsing is one JVM-side
    ``from_json`` in the scan stage — no Python in the hot path. Records
    whose payload fails to parse as a block (null height) are dropped,
    matching the fetcher's skip of ``null`` block bodies (main.rs:93-96).
    Kafka's ``offset`` is carried through as ``_source_offset`` for
    replay diagnostics.
    """
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), BLOCK_SCHEMA).alias("b"),
        F.col("partition").alias("_source_partition"),
        F.col("offset").alias("_source_offset"),
    )
    return parsed.filter(F.col("b.block.header.height").isNotNull()).select(
        "b.*", "_source_partition", "_source_offset"
    )


def starting_offsets_json(topic: str, partition_offsets: dict[int, int]) -> str:
    """Explicit resume point for backfill runs, e.g.
    ``{"blocks": {"0": 12345}}`` — the Kafka analog of the reference's
    ``start_block_height`` override (main.rs:81-84)."""
    return json.dumps({topic: {str(p): o for p, o in partition_offsets.items()}})


def block_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_blocks_per_trigger: int = 100,
    starting_offsets: str = "latest",
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming block source over a Kafka topic.

    Requires the ``spark-sql-kafka-0-10`` package on the classpath (not
    bundled in this container — the transformation layer is tested with a
    kafka-shaped DataFrame instead; see tests/test_kafka_source.py).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        # bounded-channel backpressure analog (main.rs:91)
        .option("maxOffsetsPerTrigger", max_blocks_per_trigger)
        # a trimmed-retention topic must not silently drop block ranges
        .option("failOnDataLoss", "true")
    )
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    return kafka_payload_to_blocks(reader.load())
