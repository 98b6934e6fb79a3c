"""Serving-layer queries over a warehouse built from the fixture chain."""

import json

import pytest

from clickhouse_provider_spark import storage
from clickhouse_provider_spark.plans import serving
from tests import fixture_chain as FC


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from clickhouse_provider_spark.schemas import BLOCK_SCHEMA

    blocks = spark.read.schema(BLOCK_SCHEMA).json(
        spark.sparkContext.parallelize(FC.chain_jsonl(), 2)
    )
    wh = str(tmp_path_factory.mktemp("serving_wh"))
    storage.ingest_batch(blocks, wh)
    return wh


def test_tx_by_hash(spark, warehouse):
    rows = serving.tx_by_hash(spark, warehouse, "T1").collect()
    assert len(rows) == 1
    blob = json.loads(rows[0]["transaction"])
    assert blob["transaction"]["hash"] == "T1"


def test_account_history(spark, warehouse):
    rows = serving.account_history(spark, warehouse, "dana.near").collect()
    assert {r["transaction_hash"] for r in rows} == {"T1", "T3"}
    rows2 = serving.account_history(spark, warehouse, "dana.near", after_height=101).collect()
    assert {r["transaction_hash"] for r in rows2} == {"T3"}


def test_receipt_lookup(spark, warehouse):
    rows = serving.receipt_to_tx_lookup(spark, warehouse, "R3").collect()
    assert len(rows) == 1 and rows[0]["transaction_hash"] == "T1"


def test_block_transactions(spark, warehouse):
    rows = serving.block_transactions(spark, warehouse, 103).collect()
    assert {r["transaction_hash"] for r in rows} == {"T1", "T3"}


def test_latest_block(spark, warehouse):
    assert serving.latest_block(spark, warehouse).first()["block_height"] == 104


def test_account_actions_range(spark, warehouse):
    rows = serving.account_actions_range(spark, warehouse, "contract.near", 100, 104).collect()
    assert [r["action"] for r in rows] == ["CREATE_ACCOUNT", "FUNCTION_CALL", "TRANSFER"]


def test_events_by_name(spark, warehouse):
    rows = serving.events_by_name(spark, warehouse, "nft_mint").collect()
    assert len(rows) == 1 and rows[0]["standard"] == "nep171"


def test_method_call_stats(spark, warehouse):
    stats = {r["method_name"]: r["n_calls"] for r in serving.method_call_stats(spark, warehouse).collect()}
    assert stats["ft_transfer"] == 2  # R1 and R5


def test_per_block_counts(spark, warehouse):
    rows = {r["block_height"]: r["num_transactions"] for r in serving.per_block_counts(spark, warehouse).collect()}
    assert rows == {100: 1, 101: 2, 102: 2, 103: 2, 104: 0}
