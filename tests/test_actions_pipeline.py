"""Golden-behavior tests for the actions-mode pipeline on the synthetic
chain (tests/fixture_chain.py) — pins the subtle reference semantics:
receipt_index ordering, status mapping, EVENT_JSON caps, args extraction
gates, utf8-or-base64 forms, contract hashing."""

import base64
import hashlib

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import actions as A
from tests import fixture_chain as FC


@pytest.fixture(scope="module")
def blocks(spark):
    from clickhouse_provider_spark.schemas import BLOCK_SCHEMA

    df = spark.read.schema(BLOCK_SCHEMA).json(
        spark.sparkContext.parallelize(FC.chain_jsonl(), 2)
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def tables_out(blocks):
    t = A.extract_tables(blocks)
    return {k: v.cache() for k, v in t.items()}


# --- receipt_index (SURVEY §2A #10 — the risk-register operator) ----------


def test_receipt_index_block101(tables_out):
    """Block 101: shard0 outcomes R1(0), GCD(skipped); shard0 chunk D0(1);
    shard1 outcomes R4(2)."""
    acts = tables_out["actions"].filter(F.col("block_height") == 101)
    idx = {r["receipt_id"]: r["receipt_index"] for r in acts.collect()}
    assert idx == {"R1": 0, "R4": 2}
    data = tables_out["data"].filter(F.col("block_height") == 101).collect()
    assert [(r["receipt_id"], r["receipt_index"]) for r in data] == [("DR0", 1)]


def test_gcd_produces_no_rows(tables_out):
    for t in tables_out.values():
        assert t.filter(F.col("receipt_id").startswith("GCD")).count() == 0


def test_receipt_index_dense_per_block(tables_out):
    """Indexes are dense 0..n-1 within every block across both tables."""
    union = (
        tables_out["actions"].select("block_height", "receipt_index", "receipt_id")
        .union(tables_out["data"].select("block_height", "receipt_index", "receipt_id"))
        .distinct()
    )
    for row in union.groupBy("block_height").agg(
        F.collect_set("receipt_index").alias("s")
    ).collect():
        assert sorted(row["s"]) == list(range(len(row["s"]))), row


# --- actions table semantics ----------------------------------------------


def test_action_rows_r1(tables_out):
    rows = (
        tables_out["actions"]
        .filter(F.col("receipt_id") == "R1")
        .orderBy("action_index")
        .collect()
    )
    assert [r["action"] for r in rows] == ["CREATE_ACCOUNT", "FUNCTION_CALL", "TRANSFER"]
    assert [r["action_index"] for r in rows] == [0, 1, 2]
    fc = rows[1]
    assert fc["method_name"] == "ft_transfer"
    assert fc["args_receiver_id"] == "dana.near"
    assert fc["args_amount"] == 42
    assert fc["args_token_id"] == "usdt"
    # quirk replicated: JSON key "args_owner_id" feeds args_owner_id
    assert fc["args_owner_id"] == "owner.near"
    assert fc["args_account_id"] is None
    assert fc["deposit"] == 1 and fc["attached_gas"] == 30_000_000_000_000
    assert fc["status"] == "SUCCESS"
    assert fc["status_success_value"] == '"42"'
    assert fc["return_value_int"] == 42
    assert rows[0]["action_json"] == '"CreateAccount"'
    assert rows[2]["deposit"] == 5_000_000_000_000_000_000_000_000
    assert all(r["transaction_hash"] == "T1" for r in rows)
    assert all(r["gas_price"] == 100000000 for r in rows)


def test_contract_hash_and_keys_r4(tables_out):
    rows = (
        tables_out["actions"]
        .filter(F.col("receipt_id") == "R4")
        .orderBy("action_index")
        .collect()
    )
    kinds = [r["action"] for r in rows]
    assert kinds == ["DEPLOY_CONTRACT", "ADD_KEY", "DELETE_KEY", "FUNCTION_CALL", "FUNCTION_CALL"]
    # contract_hash = base58(sha256(code)) — recomputed independently
    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    num = int.from_bytes(hashlib.sha256(FC.DEPLOY_CODE).digest(), "big")
    expect = ""
    while num:
        num, rem = divmod(num, 58)
        expect = alphabet[rem] + expect
    assert rows[0]["contract_hash"] == expect
    assert rows[1]["public_key"] == "ed25519:AddKeyPubKey111"
    assert rows[1]["access_key_contract_id"] == "app.near"
    assert rows[2]["public_key"] == "ed25519:DelKeyPubKey222"
    assert rows[2]["access_key_contract_id"] is None
    # invalid account id voids the whole args struct (serde gate)
    assert rows[3]["args_receiver_id"] is None and rows[3]["args_amount"] is None
    assert rows[3]["args"] is not None  # raw args still present (utf8)
    # non-utf8 args → base64: prefixed raw form, no parsed fields
    assert rows[4]["args"] == "base64:" + base64.b64encode(FC.BAD_UTF8).decode()
    assert rows[4]["args_receiver_id"] is None
    # empty SuccessValue → SUCCESS with empty string value
    assert rows[0]["status"] == "SUCCESS" and rows[0]["status_success_value"] == ""
    assert rows[0]["input_data_ids"] == ["D0"]


def test_status_variants(tables_out):
    r3 = tables_out["actions"].filter(F.col("receipt_id") == "R3").first()
    assert r3["status"] == "FAILURE"
    assert '"LackBalanceForState"' in r3["status_failure"] or "LackBalanceForState" in r3["status_failure"]
    assert r3["status_success_value"] is None and r3["return_value_int"] is None
    r5 = tables_out["actions"].filter(F.col("receipt_id") == "R5").first()
    assert r5["status"] == "FAILURE"  # bare-string Unknown
    assert r5["status_failure"] is None
    r2 = tables_out["actions"].filter(F.col("receipt_id") == "R2").first()
    assert r2["status"] == "SUCCESS" and r2["status_success_receipt"] == "R3"


# --- events table ----------------------------------------------------------


def test_event_rows(tables_out):
    rows = (
        tables_out["events"]
        .filter(F.col("receipt_id") == "R1")
        .orderBy("log_index")
        .collect()
    )
    assert [r["log_index"] for r in rows] == [0, 1, 2]
    plain, good, bad = rows
    assert plain["event"] is None and plain["log"] == FC.PLAIN_LOG
    assert good["standard"] == "nep171" and good["event"] == "nft_mint"
    # first data object only; >64-byte token dropped THEN truncated to 4
    assert good["data_owner_id"] == "collector.near"
    assert good["data_token_ids"] == ["tok1", "tok2", "tok3", "tok4"]
    assert good["data_token_id"] == "tok1"
    assert good["data_amount"] == 7
    assert good["data_authorized_id"] == "gallery.near"
    # malformed EVENT_JSON → all-null event, raw log preserved
    assert bad["version"] is None and bad["event"] is None
    assert bad["data_token_ids"] == []
    assert bad["log"] == FC.MALFORMED_EVENT_LOG
    assert all(r["transaction_hash"] == "T1" and r["receipt_index"] == 0 for r in rows)


def test_events_only_from_action_outcomes(tables_out):
    # data/GCD receipts never emit events; R4 has no logs
    assert tables_out["events"].filter(F.col("receipt_id").isin("DR0", "DR1", "GCD1", "R4")).count() == 0


# --- data table ------------------------------------------------------------


def test_data_rows(tables_out):
    rows = {r["receipt_id"]: r for r in tables_out["data"].collect()}
    assert set(rows) == {"DR0", "DR1", "DR2a", "DR2b"}
    assert rows["DR0"]["data"] == "d0-value"
    assert rows["DR1"]["data"] == "base64:" + base64.b64encode(FC.BAD_UTF8).decode()
    assert rows["DR2b"]["data"] is None
    assert rows["DR1"]["data_id"] == "D1"
    assert rows["DR0"]["account_id"] == "factory.near"


# --- assertions-as-filters -------------------------------------------------


def test_validate_units_clean(blocks):
    assert A.validate_units(blocks).count() == 0


def test_schema_column_counts(tables_out):
    # field counts of the reference row structs (FullActionRow actions.rs:
    # 48-92 = 39 fields, FullEventRow :94-124 = 26, FullDataRow :126-137 = 9)
    assert len(tables_out["actions"].columns) == 39
    assert len(tables_out["events"].columns) == 26
    assert len(tables_out["data"].columns) == 9
