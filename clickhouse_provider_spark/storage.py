"""Table storage: the ClickHouse MergeTree layout re-expressed as
partitioned + sorted + bloom-filtered Parquet (reference DDL README.md:
117-331; SURVEY.md §2B #29-#34, §4).

Mapping of each storage-level mechanism:

- ``ORDER BY`` sort keys      → height-bucket partition dirs +
  sortWithinPartitions: range scans prune whole buckets (partition
  pruning) and row groups (parquet min/max on the sorted key)
- ``minmax`` skip index       → parquet column statistics (automatic)
- ``bloom_filter`` skip index → parquet bloom filters, enabled per column
  at write (``parquet.bloom.filter.enabled#col``)
- ``set(0)`` index            → dictionary encoding + stats (automatic on
  low-cardinality strings)
- ``ReplacingMergeTree``      → append-only writes + dedup-on-read view
  (`read_table`): last-write-wins on the sort key, exactly the reference's
  crash-replay idempotency (SAFE_CATCH_UP_OFFSET re-ingest collapses)
- LZ4 transport               → zstd parquet pages (session default)

At 100 TB: bucket size keeps per-partition data at file-count sanity;
writes of a height range touch only their buckets, and the dedup view's
window shuffles only within identical sort keys (replay overlap), never
the full table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from clickhouse_provider_spark.schemas import BLOOM_COLUMNS, SORT_KEYS

DEFAULT_BUCKET = 100_000  # blocks per partition dir

# column whose bucket partitions the table (first sort-key height column)
PARTITION_HEIGHT = {
    "actions": "block_height",
    "events": "block_height",
    "data": "block_height",
    "transactions": "tx_block_height",
    "account_txs": "tx_block_height",
    "block_txs": "block_height",
    "receipt_txs": "tx_block_height",
    "blocks": "block_height",
}


def write_table(
    df: DataFrame,
    warehouse: str,
    name: str,
    mode: str = "append",
    bucket_size: int = DEFAULT_BUCKET,
) -> str:
    """Append rows in MergeTree-like layout. Idempotency comes from the
    dedup-on-read view, not the write (matching the reference: re-inserts
    during catch-up are absorbed by ReplacingMergeTree merges)."""
    path = os.path.join(warehouse, name)
    height_col = PARTITION_HEIGHT[name]
    writer = (
        df.withColumn("height_bucket", (F.col(height_col) / bucket_size).cast("long"))
        .sortWithinPartitions(*SORT_KEYS[name])
        .write.mode(mode)
        .partitionBy("height_bucket")
    )
    for col in BLOOM_COLUMNS.get(name, []):
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
    writer.parquet(path)
    return path


def read_table(spark: SparkSession, warehouse: str, name: str) -> DataFrame:
    """Dedup-on-read view with ReplacingMergeTree semantics: one survivor
    per sort key (row_number over the key — at scale the window shuffles
    by sort-key hash; only genuinely duplicated keys carry >1 row)."""
    path = os.path.join(warehouse, name)
    df = spark.read.parquet(path).drop("height_bucket")
    key = SORT_KEYS[name]
    w = W.partitionBy(*key).orderBy(*key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_table(
    spark: SparkSession,
    warehouse: str,
    name: str,
    bucket_size: int = DEFAULT_BUCKET,
) -> int:
    """The MergeTree background-merge analog (OPTIMIZE FINAL): physically
    collapse sort-key duplicates and re-sort/compact each height bucket,
    so dedup-on-read becomes a no-op and small replay files disappear.

    At scale this runs per height-bucket (only buckets touched by recent
    writes need merging — a metadata check on file counts/mtimes), exactly
    like MergeTree merging recent parts; here the testable core is the
    full rewrite. Returns the number of physically removed duplicate rows.

    The rewrite is staged through a temp dir then swapped — readers never
    observe a half-written table and a crashed merge leaves the original.
    """
    import shutil
    import uuid

    path = os.path.join(warehouse, name)
    before = spark.read.parquet(path).count()
    merged = read_table(spark, warehouse, name)
    tmp = os.path.join(warehouse, f"_merge_{name}_{uuid.uuid4().hex[:8]}")
    height_col = PARTITION_HEIGHT[name]
    writer = (
        merged.withColumn("height_bucket", (F.col(height_col) / bucket_size).cast("long"))
        .repartition("height_bucket")
        .sortWithinPartitions(*SORT_KEYS[name])
        .write.mode("overwrite")
        .partitionBy("height_bucket")
    )
    for col in BLOOM_COLUMNS.get(name, []):
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
    writer.parquet(tmp)
    after = spark.read.parquet(tmp).count()
    old = path + ".old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return before - after


def upsert_table(
    spark: SparkSession,
    warehouse: str,
    name: str,
    new_rows: DataFrame,
    bucket_size: int = DEFAULT_BUCKET,
) -> None:
    """Partition-scoped MERGE: last-write-wins upsert keyed on the sort
    key, rewriting ONLY the height buckets the incoming rows touch.

    This is the Delta-MERGE analog on plain parquet: at 100 TB an ingest
    batch touches a handful of recent buckets, so the rewrite cost is
    O(batch's bucket span), never the table. New rows win over stored rows
    on sort-key collisions (ReplacingMergeTree "latest version" rule).
    """
    import shutil
    import uuid

    height_col = PARTITION_HEIGHT[name]
    key = SORT_KEYS[name]
    path = os.path.join(warehouse, name)
    stamped = new_rows.withColumn(
        "height_bucket", (F.col(height_col) / bucket_size).cast("long")
    )
    buckets = [r["height_bucket"] for r in stamped.select("height_bucket").distinct().collect()]
    if not buckets:
        return
    existing_paths = [
        p for b in buckets if os.path.exists(p := os.path.join(path, f"height_bucket={b}"))
    ]
    new_pref = stamped.withColumn("__pref", F.lit(0))
    if existing_paths:
        old = (
            spark.read.option("basePath", path)
            .parquet(*existing_paths)
            .withColumn("__pref", F.lit(1))
        )
        merged = new_pref.unionByName(old)
    else:
        merged = new_pref
    w = W.partitionBy(*key).orderBy("__pref")  # new rows (pref 0) win
    winner = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__pref")
    )
    tmp = os.path.join(warehouse, f"_upsert_{name}_{uuid.uuid4().hex[:8]}")
    writer = (
        winner.repartition("height_bucket")
        .sortWithinPartitions(*key)
        .write.mode("overwrite")
        .partitionBy("height_bucket")
    )
    for col in BLOOM_COLUMNS.get(name, []):
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
    writer.parquet(tmp)
    os.makedirs(path, exist_ok=True)  # first write: table root may not exist
    for b in buckets:
        dst = os.path.join(path, f"height_bucket={b}")
        src = os.path.join(tmp, f"height_bucket={b}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        if os.path.exists(src):
            os.rename(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)


def ingest_batch(blocks: DataFrame, warehouse: str, mode: str = "append") -> dict[str, str]:
    """Full batch ingest: both pipeline modes → all 8 tables (the
    reference runs them as two daemons over the same stream)."""
    from clickhouse_provider_spark.operators.actions import extract_tables
    from clickhouse_provider_spark.operators.transactions import assemble

    paths = {}
    act = extract_tables(blocks)
    txs = assemble(blocks)
    diagnostics = {"incomplete", "mapping"}
    for name, df in {**act, **{k: v for k, v in txs.items() if k not in diagnostics}}.items():
        paths[name] = write_table(df, warehouse, name, mode=mode)
    return paths
