"""Materialized continuous aggregate with INCREMENTAL refresh.

The batch operator (``operators/temporal.hypertable_rollup``) computes
multi-resolution rollups in one query; this module is its maintenance
story at 100 TB, where "recompute the rollup" is not an option:

- the finest level (hour x dims) is MATERIALIZED as parquet partitioned by
  day (`day_bucket`), sums stored as DECIMAL(38,6) so merges are exact and
  associative;
- :func:`refresh_rollup` folds a raw-events DELTA in: aggregate the delta
  to hour grain, read back ONLY the day partitions the delta touches
  (partition-pruned scan), re-sum, and rewrite ONLY those partitions
  (dynamic partition overwrite). Cost scales with the delta's time span,
  never with table history. Count+decimal-sum additivity makes the
  incremental result bit-equal to a full recompute
  (tests/test_rollup.py proves it on shuffled out-of-order deltas);
- :func:`read_rollup` serves any coarser resolution by re-aggregating the
  hour grain (a day query touches 24 rows per dim combination, not raw
  events), partition-pruned by the optional time range.

Mirrors the reference's storage posture: ClickHouse consumers get this
from a materialized-view cascade over the inserted tables (SummingMergeTree
shape — additive-state merges at part-merge time); here the additive merge
is explicit and exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000

#: stored sum type: fixed so initial writes and re-merged partitions carry
#: the identical parquet schema (Spark's sum() widens decimal precision per
#: aggregation depth otherwise)
_SUM_TYPE = "decimal(38,6)"


def _hour_grain(events: DataFrame, ts_us: str, dims: tuple[str, ...], value: str) -> DataFrame:
    return (
        events.groupBy(
            F.expr(f"({ts_us} DIV {HOUR_US}) * {HOUR_US}").alias("bucket_us"),
            *dims,
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value).cast("decimal(18,6)")).cast(_SUM_TYPE).alias("sum_value"),
        )
        .withColumn("day_bucket", F.expr(f"bucket_us DIV {DAY_US}"))
    )


def refresh_rollup(
    events_delta: DataFrame,
    warehouse: str,
    name: str = "events_rollup_1h",
    ts_us: str = "ts_us",
    dims: tuple[str, ...] = ("event_type",),
    value: str = "value",
) -> list[int]:
    """Fold a raw-events delta into the materialized hour rollup.

    Returns the list of day_bucket partitions rewritten. The delta may be
    arbitrarily out of order / overlap previously-seen hours: existing
    affected partitions are read back (pruned scan) and re-summed with the
    delta's hour aggregates — additive, exact, idempotent-per-delta (each
    delta must be applied exactly once; upstream replay dedup is
    storage.py's dedup-on-read, same as the ingest tables).
    """
    spark = events_delta.sparkSession
    path = os.path.join(warehouse, name)
    delta_hours = _hour_grain(events_delta, ts_us, dims, value)
    if not os.path.exists(path):
        delta_hours.write.mode("overwrite").partitionBy("day_bucket").parquet(path)
        return [r[0] for r in delta_hours.select("day_bucket").distinct().collect()]
    # scalar, bounded by the delta's day span (not table history) — same
    # collect posture as the resume-point watermark (sources/blocks.py)
    affected = [r[0] for r in delta_hours.select("day_bucket").distinct().collect()]
    existing = spark.read.parquet(path).filter(F.col("day_bucket").isin(affected))
    merged = (
        existing.unionByName(delta_hours)
        .groupBy("bucket_us", *dims, "day_bucket")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").cast(_SUM_TYPE).alias("sum_value"),
        )
        .select("bucket_us", *dims, "n", "sum_value", "day_bucket")
    )
    # dynamic overwrite: only the day partitions present in `merged` (the
    # affected set by construction) are replaced; history is untouched
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day_bucket")
        .parquet(path)
    )
    return sorted(affected)


def read_rollup(
    spark: SparkSession,
    warehouse: str,
    name: str = "events_rollup_1h",
    resolution_us: int = HOUR_US,
    dims: tuple[str, ...] = ("event_type",),
    time_range_us: tuple[int, int] | None = None,
) -> DataFrame:
    """Serve the rollup at any resolution that is a multiple of an hour,
    re-aggregated from the materialized hour grain. ``time_range_us``
    prunes day partitions BEFORE the scan (day_bucket is the partition
    column, so the filter eliminates directories, not rows)."""
    if resolution_us % HOUR_US != 0:
        raise ValueError("resolution must be a multiple of the stored hour grain")
    df = spark.read.parquet(os.path.join(warehouse, name))
    if time_range_us is not None:
        lo, hi = time_range_us
        df = df.filter(
            (F.col("day_bucket") >= lo // DAY_US) & (F.col("day_bucket") <= hi // DAY_US)
        ).filter((F.col("bucket_us") >= lo) & (F.col("bucket_us") < hi))
    return (
        df.groupBy(
            F.expr(f"(bucket_us DIV {resolution_us}) * {resolution_us}").alias("bucket_us"),
            *dims,
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").cast("double").alias("sum_value"),
        )
    )
