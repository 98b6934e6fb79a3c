"""Deterministic synthetic BlockWithTxHashes chain covering FIXTURES.md
§B.4's edge cases. Shapes mirror neardata JSON as consumed by the reference
(SURVEY.md §1.3): u128s as decimal strings, byte fields base64, unit enum
variants as bare strings.

Chain (heights 100-104):
- T1 (block 100, alice): R1(101, 3 actions: CreateAccount/FunctionCall/
  Transfer, logs incl. valid+oversized+malformed EVENT_JSON) → R2(102,
  consumes data D1, SuccessReceiptId→R3) → R3(103, Failure) ⇒ spans 4 blocks
- T2 (block 101 shard 1, bob): R4 same-block execution; DeployContract +
  AddKey(FunctionCall perm) + DeleteKey; consumes D0 (shard 0 chunk, same
  block); empty SuccessValue
- T3 (block 102, carol): R5(103, status Unknown (bare string), consumes D2
  — D2 appears twice (102, 103) both is_promise_resume ⇒ first kept)
- GlobalContractDistribution receipt in block 101 outcomes ⇒ no rows, no
  receipt_index increment
- block 104: empty (blocks row only)
"""

from __future__ import annotations

import base64
import json


def b64(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode()
    return base64.b64encode(data).decode()


BAD_UTF8 = bytes([0xFF, 0xFE, 0x01])
DEPLOY_CODE = b"\x00asm-fake-wasm-bytes"
LONG_TOKEN = "t" * 70  # > 64 bytes → dropped from token_ids / token_id

GOOD_EVENT = {
    "version": "1.0.0",
    "standard": "nep171",
    "event": "nft_mint",
    "data": [
        {
            "owner_id": "collector.near",
            "token_ids": ["tok1", LONG_TOKEN, "tok2", "tok3", "tok4", "tok5"],
            "token_id": "tok1",
            "amount": "7",
            "authorized_id": "gallery.near",
        },
        {"owner_id": "second-ignored.near", "token_ids": ["zzz"]},
    ],
}

FT_ARGS = {
    "receiver_id": "dana.near",
    "amount": "42",
    "memo": "hi",
    "token_id": "usdt",
    "args_owner_id": "owner.near",
}
# user_id is NUMERIC: all-digit names are grammatically valid accounts, but
# the reference only accepts values serialized as JSON strings (value.as_str)
BAD_ACCOUNT_ARGS = {"receiver_id": "INVALID!", "amount": "9", "user_id": 31415926}


def action(kind: str, payload=None) -> str:
    """Raw ActionView JSON as serde emits it (unit variant = bare string)."""
    return json.dumps(kind if payload is None else {kind: payload})


A_CREATE = action("CreateAccount")
A_FT_CALL = action(
    "FunctionCall",
    {"method_name": "ft_transfer", "args": b64(json.dumps(FT_ARGS)), "gas": 30_000_000_000_000, "deposit": "1"},
)
A_TRANSFER = action("Transfer", {"deposit": "5000000000000000000000000"})
A_DEPLOY = action("DeployContract", {"code": b64(DEPLOY_CODE)})
A_ADD_KEY = action(
    "AddKey",
    {
        "public_key": "ed25519:AddKeyPubKey111",
        "access_key": {
            "nonce": 0,
            "permission": {
                "FunctionCall": {
                    "allowance": "250000000000000000000000",
                    "receiver_id": "app.near",
                    "method_names": ["set_status"],
                }
            },
        },
    },
)
A_DELETE_KEY = action("DeleteKey", {"public_key": "ed25519:DelKeyPubKey222"})
A_BAD_ARGS_CALL = action(
    "FunctionCall",
    {"method_name": "oops", "args": b64(json.dumps(BAD_ACCOUNT_ARGS)), "gas": 1, "deposit": "0"},
)
A_RAW_ARGS_CALL = action(
    "FunctionCall",
    {"method_name": "blob", "args": b64(BAD_UTF8), "gas": 2, "deposit": "0"},
)


def outcome(rid, status, receipt_ids=(), logs=(), gas=1000, tokens="100", block_hash="") -> dict:
    return {
        "id": rid,
        "block_hash": block_hash,
        "outcome": {
            "status": status,
            "gas_burnt": gas,
            "tokens_burnt": tokens,
            "logs": list(logs),
            "receipt_ids": list(receipt_ids),
            "executor_id": "executor.near",
            "metadata": {"version": 3, "gas_profile": json.dumps([{"cost": "WASM", "gas_used": "1"}])},
        },
    }


def action_receipt(rid, predecessor, receiver, signer, actions, input_data_ids=(), gas_price="100000000") -> dict:
    return {
        "predecessor_id": predecessor,
        "receiver_id": receiver,
        "receipt_id": rid,
        "receipt": {
            "Action": {
                "signer_id": signer,
                "signer_public_key": f"ed25519:{signer}Key",
                "gas_price": gas_price,
                "input_data_ids": list(input_data_ids),
                "output_data_receivers": [],
                "is_promise_yield": False,
                "actions": actions,
            }
        },
        "priority": 0,
    }


def data_receipt(rid, predecessor, receiver, data_id, data, is_promise_resume=False) -> dict:
    return {
        "predecessor_id": predecessor,
        "receiver_id": receiver,
        "receipt_id": rid,
        "receipt": {
            "Data": {"data_id": data_id, "data": data, "is_promise_resume": is_promise_resume}
        },
        "priority": 0,
    }


def gcd_receipt(rid) -> dict:
    return {
        "predecessor_id": "system",
        "receiver_id": "global.near",
        "receipt_id": rid,
        "receipt": {"GlobalContractDistribution": {"code": b64(b"gcd"), "id": "x"}},
        "priority": 0,
    }


def chunk_tx(tx_hash, signer, receiver, actions, receipt_ids) -> dict:
    return {
        "transaction": {
            "hash": tx_hash,
            "signer_id": signer,
            "public_key": f"ed25519:{signer}Key",
            "nonce": 7,
            "receiver_id": receiver,
            "actions": actions,
            "signature": f"ed25519:sig{tx_hash}",
            "priority_fee": 0,
        },
        "outcome": {
            "execution_outcome": outcome(
                tx_hash, {"SuccessReceiptId": receipt_ids[0]}, receipt_ids
            )
        },
    }


def shard(shard_id, transactions=(), receipts=(), outcomes=()) -> dict:
    s = {"shard_id": shard_id, "receipt_execution_outcomes": list(outcomes)}
    if transactions or receipts:
        s["chunk"] = {"transactions": list(transactions), "receipts": list(receipts)}
    else:
        s["chunk"] = None
    return s


def block(height, shards, prev_height=None) -> dict:
    prev_height = prev_height if prev_height is not None else height - 1
    return {
        "block": {
            "author": f"validator{height % 3}.near",
            "header": {
                "height": height,
                "hash": f"Hash{height}",
                "prev_hash": f"Hash{prev_height}",
                "prev_height": prev_height,
                "timestamp": 1_700_000_000_000_000_000 + height * 1_000_000_000,
                "timestamp_nanosec": str(1_700_000_000_000_000_000 + height * 1_000_000_000),
                "epoch_id": "Epoch1",
                "chunks_included": len(shards),
                "signature": f"ed25519:blocksig{height}",
                "latest_protocol_version": 73,
            },
        },
        "shards": shards,
    }


VALID_EVENT_LOG = "EVENT_JSON:" + json.dumps(GOOD_EVENT)
MALFORMED_EVENT_LOG = 'EVENT_JSON:{"version": "1.0", "standard":'
PLAIN_LOG = "plain log line"


def make_chain() -> list[dict]:
    blocks = []
    # block 100: T1 submitted (shard 0); empty shard 1
    blocks.append(
        block(
            100,
            [
                shard(0, transactions=[chunk_tx("T1", "alice.near", "contract.near", [A_FT_CALL], ["R1"])]),
                shard(1),
            ],
        )
    )
    # block 101: R1 executes (shard 0, spawns R2) + GCD outcome; D0 in
    # shard 0 chunk; T2 submitted AND R4 executes in shard 1 (consumes D0)
    r1 = action_receipt(
        "R1",
        "alice.near",
        "contract.near",
        "alice.near",
        [A_CREATE, A_FT_CALL, A_TRANSFER],
    )
    r4 = action_receipt(
        "R4",
        "bob.near",
        "factory.near",
        "bob.near",
        [A_DEPLOY, A_ADD_KEY, A_DELETE_KEY, A_BAD_ARGS_CALL, A_RAW_ARGS_CALL],
        input_data_ids=["D0"],
    )
    blocks.append(
        block(
            101,
            [
                shard(
                    0,
                    receipts=[data_receipt("DR0", "system", "factory.near", "D0", b64("d0-value"))],
                    outcomes=[
                        {
                            "tx_hash": "T1",
                            "receipt": r1,
                            "execution_outcome": outcome(
                                "R1",
                                {"SuccessValue": b64('"42"')},
                                ["R2"],
                                logs=[PLAIN_LOG, VALID_EVENT_LOG, MALFORMED_EVENT_LOG],
                                block_hash="Hash101",
                            ),
                        },
                        {
                            "tx_hash": "T1",
                            "receipt": gcd_receipt("GCD1"),
                            "execution_outcome": outcome("GCD1", {"SuccessValue": b64("")}, []),
                        },
                    ],
                ),
                shard(
                    1,
                    transactions=[chunk_tx("T2", "bob.near", "factory.near", [A_DEPLOY], ["R4"])],
                    outcomes=[
                        {
                            "tx_hash": "T2",
                            "receipt": r4,
                            "execution_outcome": outcome(
                                "R4", {"SuccessValue": b64("")}, [], block_hash="Hash101"
                            ),
                        }
                    ],
                ),
            ],
        )
    )
    # block 102: R2 executes (consumes D1 from same block's chunk,
    # SuccessReceiptId→R3); T3 submitted; D2 (promise_resume) first copy
    r2 = action_receipt(
        "R2", "contract.near", "vault.near", "alice.near", [A_TRANSFER], input_data_ids=["D1"]
    )
    blocks.append(
        block(
            102,
            [
                shard(
                    0,
                    transactions=[chunk_tx("T3", "carol.near", "yield.near", [A_FT_CALL], ["R5"])],
                    receipts=[
                        data_receipt("DR1", "system", "vault.near", "D1", b64(BAD_UTF8)),
                        data_receipt("DR2a", "system", "yield.near", "D2", b64("resume-1"), True),
                    ],
                    outcomes=[
                        {
                            "tx_hash": "T1",
                            "receipt": r2,
                            "execution_outcome": outcome(
                                "R2", {"SuccessReceiptId": "R3"}, ["R3"], block_hash="Hash102"
                            ),
                        }
                    ],
                ),
            ],
        )
    )
    # block 103: R3 fails (T1 completes, 4 blocks); R5 executes with
    # status Unknown (T3 completes); duplicate D2 (promise_resume)
    r3 = action_receipt("R3", "vault.near", "sink.near", "alice.near", [A_TRANSFER])
    r5 = action_receipt(
        "R5", "yield.near", "yield.near", "carol.near", [A_FT_CALL], input_data_ids=["D2"]
    )
    blocks.append(
        block(
            103,
            [
                shard(
                    0,
                    receipts=[
                        data_receipt("DR2b", "system", "yield.near", "D2", None, True),
                    ],
                    outcomes=[
                        {
                            "tx_hash": "T1",
                            "receipt": r3,
                            "execution_outcome": outcome(
                                "R3",
                                {"Failure": {"ActionError": {"index": 0, "kind": {"LackBalanceForState": {"account_id": "sink.near", "amount": "99"}}}}},
                                [],
                                block_hash="Hash103",
                            ),
                        },
                        {
                            "tx_hash": "T3",
                            "receipt": r5,
                            "execution_outcome": outcome("R5", "Unknown", [], block_hash="Hash103"),
                        },
                    ],
                ),
            ],
        )
    )
    # block 104: empty
    blocks.append(block(104, [shard(0)]))
    return blocks


def chain_jsonl() -> list[str]:
    return [json.dumps(b) for b in make_chain()]


if __name__ == "__main__":
    import pathlib

    out = pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "blocks.jsonl"
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(chain_jsonl()) + "\n")
    print(f"wrote {out} ({len(make_chain())} blocks)")
