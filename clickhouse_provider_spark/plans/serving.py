"""Consumer query surface over the produced explorer tables (reference:
"The explorer is transaction focused" README.md:248; query classes SURVEY
§2C #35-#44). Each function is the Spark form of the access path the
ClickHouse sort key / skip index serves:

- point lookups ride parquet bloom filters + partition pruning
- range scans ride the height-bucket layout + row-group min/max on the
  sorted key
- pagination is filter + orderBy(sort key) + limit → Catalyst's
  TakeOrderedAndProject (no global sort)

All read through storage.read_table, i.e. with ReplacingMergeTree dedup
semantics applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_provider_spark import storage


def tx_by_hash(spark: SparkSession, warehouse: str, tx_hash: str) -> DataFrame:
    """#39: point lookup incl. the assembled JSON blob (reference
    transactions PK (transaction_hash), README.md:266-267)."""
    return storage.read_table(spark, warehouse, "transactions").filter(
        F.col("transaction_hash") == tx_hash
    )


def account_history(
    spark: SparkSession,
    warehouse: str,
    account_id: str,
    after_height: int = 0,
    limit: int = 50,
) -> DataFrame:
    """#40: "transactions touching account X after height H, ordered"
    (reference account_txs PK (account_id, tx_block_height), README.md:
    280-281)."""
    return (
        storage.read_table(spark, warehouse, "account_txs")
        .filter(
            (F.col("account_id") == account_id)
            & (F.col("tx_block_height") > after_height)
        )
        .orderBy("tx_block_height", "transaction_hash")
        .limit(limit)
    )


def receipt_to_tx_lookup(spark: SparkSession, warehouse: str, receipt_id: str) -> DataFrame:
    """#41: receipt → transaction resolution (reference receipt_txs,
    README.md:297-309; bloom filter on receipt_id)."""
    return storage.read_table(spark, warehouse, "receipt_txs").filter(
        F.col("receipt_id") == receipt_id
    )


def block_transactions(spark: SparkSession, warehouse: str, block_height: int) -> DataFrame:
    """#42: all transactions touching a block (reference block_txs,
    README.md:283-295). Partition-pruned by the height bucket."""
    return storage.read_table(spark, warehouse, "block_txs").filter(
        F.col("block_height") == block_height
    )


def latest_block(spark: SparkSession, warehouse: str) -> DataFrame:
    """#43: newest block header (the reference's own resume query is the
    max() over this table, click.rs:27-34)."""
    blocks = storage.read_table(spark, warehouse, "blocks")
    return blocks.orderBy(F.col("block_height").desc()).limit(1)


def account_actions_range(
    spark: SparkSession,
    warehouse: str,
    account_id: str,
    from_height: int,
    to_height: int,
    limit: int = 100,
) -> DataFrame:
    """#35+#37: sorted range scan with an account needle (reference actions
    ORDER BY (block_height, account_id, receipt_index, action_index) +
    bloom on account_id, README.md:163,177-178)."""
    return (
        storage.read_table(spark, warehouse, "actions")
        .filter(
            F.col("block_height").between(from_height, to_height)
            & (F.col("account_id") == account_id)
        )
        .orderBy("block_height", "receipt_index", "action_index")
        .limit(limit)
    )


def events_by_name(
    spark: SparkSession, warehouse: str, event: str, limit: int = 100
) -> DataFrame:
    """#38: low-cardinality event filter (reference set(0) index on
    events.event, README.md:213)."""
    return (
        storage.read_table(spark, warehouse, "events")
        .filter(F.col("event") == event)
        .orderBy("block_height", "account_id", "receipt_index", "log_index")
        .limit(limit)
    )


def method_call_stats(
    spark: SparkSession, warehouse: str, from_height: int = 0
) -> DataFrame:
    """#44-style aggregation: per-method call counts + gas over the
    actions table (set(0) index on method_name class)."""
    return (
        storage.read_table(spark, warehouse, "actions")
        .filter(
            (F.col("block_height") >= from_height) & F.col("method_name").isNotNull()
        )
        .groupBy("method_name")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum("gas_burnt").alias("total_gas_burnt"),
            F.countDistinct("account_id").alias("n_contracts"),
        )
    )


def per_block_counts(spark: SparkSession, warehouse: str) -> DataFrame:
    """#44: the ScyllaDB blocks variant's num_transactions/num_receipts
    aggregates (reference README.md:88-89) derived from block_txs/
    receipt_txs."""
    btx = (
        storage.read_table(spark, warehouse, "block_txs")
        .groupBy("block_height")
        .agg(F.count(F.lit(1)).alias("num_transactions"))
    )
    blocks = storage.read_table(spark, warehouse, "blocks").select(
        "block_height", "block_hash", "block_timestamp"
    )
    return blocks.join(btx, "block_height", "left").na.fill({"num_transactions": 0})
