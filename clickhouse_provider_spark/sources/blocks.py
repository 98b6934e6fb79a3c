"""Block-JSON sources (reference: neardata HTTP fetcher, src/main.rs:91-99
— N parallel fetchers re-emitting blocks in height order into a bounded
channel; SURVEY.md §2A #1-#2).

Spark-first mapping: the fetcher's job (parallel fetch + ordered re-emit +
backpressure) is exactly what a file streaming source does — files named by
height arrive in order, ``maxFilesPerTrigger`` bounds in-flight work (the
channel(100) analog), and source partitions parallelize the read. Batch
backfill is a plain schema-applied JSON read; height ranges prune by the
``block_height`` filter pushed into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_provider_spark.schemas import BLOCK_SCHEMA


def read_blocks(
    spark: SparkSession,
    path: str,
    start_height: int | None = None,
    end_height: int | None = None,
) -> DataFrame:
    """Batch read of block JSON (one document per line or per file).

    ``start_height`` replicates the resume/backfill clamp (reference
    main.rs:81-90: start = max(first_block, last_db_height + 1))."""
    df = spark.read.schema(BLOCK_SCHEMA).json(path)
    if start_height is not None:
        df = df.filter(F.col("block.header.height") >= start_height)
    if end_height is not None:
        df = df.filter(F.col("block.header.height") <= end_height)
    return df


def block_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 100
) -> DataFrame:
    """Streaming source over a block-drop directory (ordered by
    height-derived file names). maxFilesPerTrigger = the reference's
    bounded-channel backpressure (mpsc::channel(100), main.rs:91)."""
    return (
        spark.readStream.schema(BLOCK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def latest_height(blocks_table: DataFrame) -> int | None:
    """Resume watermark: SELECT max(block_height) (reference ClickDB::max,
    src/click.rs:27-34). On a height-bucketed table this reduces to footer
    stats of the newest partition."""
    row = blocks_table.agg(F.max("block_height").alias("h")).collect()[0]
    return row["h"]
