"""Physical-layout utilities for shuffle elimination at scale:
bucketing (co-located joins) and salting (skew spreading).

These are the knobs SURVEY §4 maps from the reference's storage-side
choices to Spark: the fact-fact join (lineitem⋈orders shape — or at the
pipeline's scale, outcomes⋈mapping on receipt ids) is the one shuffle
Catalyst can't remove on its own; pre-bucketing both sides on the join
key removes it permanently (every downstream join/agg on that key reads
co-partitioned buckets, zero exchange). Salting is the manual fallback
for skewed keys where AQE's runtime skew-split isn't available (e.g.
aggregations over a power-law key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    sort_key: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ sorted) table: joins and aggregations on
    the bucket key become exchange-free (verified in tests/test_layout.py
    — the join plan has no Exchange).

    Bucket metadata lives in the session catalog; on a cluster this is the
    shared metastore. n_buckets should match the downstream parallelism
    target (buckets = max join tasks)."""
    spark = df.sparkSession
    if mode == "overwrite":
        # a managed-table location can outlive its (session-scoped) catalog
        # entry; clear both so overwrite is really overwrite
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        import shutil

        shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    keys = [bucket_key] if isinstance(bucket_key, str) else bucket_key
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort_key:
        sorts = [sort_key] if isinstance(sort_key, str) else sort_key
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table)


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: Callable[[DataFrame], list[F.Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 groups by
    (key, random salt) so a hot key spreads over n_salts reducers; phase 2
    merges the partials. ``aggs`` must return DECOMPOSABLE partial
    aggregates (sum/count/min/max) — the caller derives averages etc.
    from the merged partials.

    Note: Spark's own hash aggregation already does map-side partials, so
    this matters when the *reduce* side of one key exceeds a single task
    (billions of rows behind one key) — the 100 TB power-law case.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(*aggs(salted))
    merged_cols = []
    for field in partial.schema.fields:
        if field.name in (key, "__salt"):
            continue
        name = field.name
        if name.startswith("count_"):
            merged_cols.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            merged_cols.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            merged_cols.append(F.max(name).alias(name))
        else:  # sums and sum-like partials merge by addition
            merged_cols.append(F.sum(name).alias(name))
    return partial.groupBy(key).agg(*merged_cols)


def salted_join_keys(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-join by replication: salt the skewed side randomly, explode
    the small side across all salt values, join on (key, salt). Spark's
    AQE skew-join does this adaptively for sort-merge joins; this explicit
    form covers the cases AQE doesn't (e.g. when the build side must stay
    a shuffle join, or pre-AQE engines)."""
    salted_big = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated_small, [key, "__salt"]).drop("__salt")


def spark_warehouse_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
