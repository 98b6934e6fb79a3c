"""Schemas: the nested block input model and the 8 output tables.

Input model mirrors the subset of neardata's BlockWithTxHashes JSON the
reference consumes (reference src/actions.rs:341-670, src/transactions.rs:
175-370; field inventory in SURVEY.md §1.3 / FIXTURES.md §B).

Tagged unions (Rust enums with serde external tagging) become structs of
nullable per-variant fields; a *unit* variant arrives as a bare JSON string
("CreateAccount", "FullAccess", "Unknown") which nulls the struct — variant
dispatch therefore checks the parsed struct first and falls back to the raw
string (operators/actions.py).

Two deliberate raw-capture choices (Spark's JSON reader serializes an
object subtree into a StringType field):

- ``actions`` arrays are ``array<string>`` — each element keeps its exact
  input serialization (→ the ``action_json`` output column, reference
  actions.rs:506) and is parsed on demand with from_json(ACTION_VIEW).
- ``status.Failure`` is a raw string — the error object is arbitrary JSON
  the reference re-serializes verbatim (actions.rs:383-388).

Type mapping (SURVEY.md §1.2): u64→Long, u32→Int, u128 (dec_format strings
in JSON) → Decimal(38,0), nanosecond timestamps → canonical Long ns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# input: BlockWithTxHashes
# ---------------------------------------------------------------------------

S = T.StringType()
L = T.LongType()
I = T.IntegerType()  # noqa: E741
B = T.BooleanType()
U128 = T.DecimalType(38, 0)


def _f(name, dtype, nullable=True):
    return T.StructField(name, dtype, nullable)


EXECUTION_STATUS = T.StructType(
    [
        # unit variant "Unknown" arrives as a bare string → whole struct null
        _f("Failure", S),  # raw JSON of the error object
        _f("SuccessValue", S),  # base64-encoded bytes
        _f("SuccessReceiptId", S),
    ]
)

OUTCOME = T.StructType(
    [
        _f("status", EXECUTION_STATUS),
        _f("gas_burnt", L),
        _f("tokens_burnt", S),  # u128 dec_format string
        _f("logs", T.ArrayType(S)),
        _f("receipt_ids", T.ArrayType(S)),
        _f("executor_id", S),
        _f("metadata", T.StructType([_f("version", I), _f("gas_profile", S)])),
    ]
)

EXECUTION_OUTCOME = T.StructType(
    [_f("id", S), _f("block_hash", S), _f("outcome", OUTCOME)]
)

RECEIPT_ENUM = T.StructType(
    [
        _f(
            "Action",
            T.StructType(
                [
                    _f("signer_id", S),
                    _f("signer_public_key", S),
                    _f("gas_price", S),  # u128 dec_format string
                    _f("input_data_ids", T.ArrayType(S)),
                    _f("output_data_receivers", T.ArrayType(T.StructType([_f("data_id", S), _f("receiver_id", S)]))),
                    _f("is_promise_yield", B),
                    _f("actions", T.ArrayType(S)),  # raw ActionView JSON per element
                ]
            ),
        ),
        _f(
            "Data",
            T.StructType(
                [_f("data_id", S), _f("data", S), _f("is_promise_resume", B)]
            ),
        ),
        _f("GlobalContractDistribution", S),  # raw; always dropped downstream
    ]
)

RECEIPT_VIEW = T.StructType(
    [
        _f("predecessor_id", S),
        _f("receiver_id", S),
        _f("receipt_id", S),
        _f("receipt", RECEIPT_ENUM),
        _f("priority", L),
    ]
)

SIGNED_TRANSACTION = T.StructType(
    [
        _f("hash", S),
        _f("signer_id", S),
        _f("public_key", S),
        _f("nonce", L),
        _f("receiver_id", S),
        _f("actions", T.ArrayType(S)),  # raw ActionView JSON per element
        _f("signature", S),
        _f("priority_fee", L),
    ]
)

CHUNK = T.StructType(
    [
        _f(
            "transactions",
            T.ArrayType(
                T.StructType(
                    [
                        _f("transaction", SIGNED_TRANSACTION),
                        _f(
                            "outcome",
                            T.StructType([_f("execution_outcome", EXECUTION_OUTCOME)]),
                        ),
                    ]
                )
            ),
        ),
        _f("receipts", T.ArrayType(RECEIPT_VIEW)),
    ]
)

SHARD = T.StructType(
    [
        _f("shard_id", L),
        _f("chunk", CHUNK),
        _f(
            "receipt_execution_outcomes",
            T.ArrayType(
                T.StructType(
                    [
                        _f("tx_hash", S),
                        _f("receipt", RECEIPT_VIEW),
                        _f("execution_outcome", EXECUTION_OUTCOME),
                    ]
                )
            ),
        ),
    ]
)

BLOCK_HEADER = T.StructType(
    [
        _f("height", L),
        _f("hash", S),
        _f("prev_hash", S),
        _f("prev_height", L),
        _f("timestamp", L),  # nanoseconds
        _f("timestamp_nanosec", S),  # same value, dec_format string
        _f("epoch_id", S),
        _f("chunks_included", L),
        _f("signature", S),
        _f("latest_protocol_version", I),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        _f("block", T.StructType([_f("author", S), _f("header", BLOCK_HEADER)])),
        _f("shards", T.ArrayType(SHARD)),
    ]
)

# Parsed view of one raw ActionView JSON string (from_json target).
# Unit variant "CreateAccount" is a bare string → struct null (see module doc).
ACTION_VIEW = T.StructType(
    [
        _f("CreateAccount", S),
        _f("DeployContract", T.StructType([_f("code", S)])),  # code = base64
        _f(
            "FunctionCall",
            T.StructType(
                [_f("method_name", S), _f("args", S), _f("gas", L), _f("deposit", S)]
            ),
        ),
        _f("Transfer", T.StructType([_f("deposit", S)])),
        _f("Stake", T.StructType([_f("stake", S), _f("public_key", S)])),
        _f(
            "AddKey",
            T.StructType(
                [
                    _f("public_key", S),
                    _f(
                        "access_key",
                        T.StructType(
                            [
                                _f("nonce", L),
                                # "FullAccess" bare string → struct null
                                _f(
                                    "permission",
                                    T.StructType(
                                        [
                                            _f(
                                                "FunctionCall",
                                                T.StructType(
                                                    [
                                                        _f("allowance", S),
                                                        _f("receiver_id", S),
                                                        _f("method_names", T.ArrayType(S)),
                                                    ]
                                                ),
                                            )
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        _f("DeleteKey", T.StructType([_f("public_key", S)])),
        _f("DeleteAccount", T.StructType([_f("beneficiary_id", S)])),
        _f("Delegate", S),  # raw; only the kind matters downstream
        _f("NonrefundableStorageTransfer", T.StructType([_f("deposit", S)])),
        _f("DeployGlobalContract", S),
        _f("DeployGlobalContractByAccountId", S),
        _f("UseGlobalContract", S),
        _f("UseGlobalContractByAccountId", S),
    ]
)

# (variant field, output enum value) in reference declaration order
# (actions.rs:29-46); DDL's enum list (README.md:131) lags the Rust by the
# four *GlobalContract kinds — the Rust is authoritative.
ACTION_KINDS: list[tuple[str, str]] = [
    ("CreateAccount", "CREATE_ACCOUNT"),
    ("DeployContract", "DEPLOY_CONTRACT"),
    ("FunctionCall", "FUNCTION_CALL"),
    ("Transfer", "TRANSFER"),
    ("Stake", "STAKE"),
    ("AddKey", "ADD_KEY"),
    ("DeleteKey", "DELETE_KEY"),
    ("DeleteAccount", "DELETE_ACCOUNT"),
    ("Delegate", "DELEGATE"),
    ("NonrefundableStorageTransfer", "NONREFUNDABLE_STORAGE_TRANSFER"),
    ("DeployGlobalContract", "DEPLOY_GLOBAL_CONTRACT"),
    ("DeployGlobalContractByAccountId", "DEPLOY_GLOBAL_CONTRACT_BY_ACCOUNT_ID"),
    ("UseGlobalContract", "USE_GLOBAL_CONTRACT"),
    ("UseGlobalContractByAccountId", "USE_GLOBAL_CONTRACT_BY_ACCOUNT_ID"),
]

# FunctionCall args JSON → typed fields (reference ArgsData, actions.rs:
# 253-265). NOTE the quirk: the JSON keys for new-account/owner are
# literally "args_new_account_id"/"args_owner_id" in the reference struct
# (no serde rename) — replicated verbatim.
ARGS_DATA = T.StructType(
    [
        _f("account_id", S),
        _f("args_new_account_id", S),
        _f("args_owner_id", S),
        _f("receiver_id", S),
        _f("sender_id", S),
        _f("token_id", S),
        _f("nft_contract_id", S),
        _f("nft_token_id", S),
        _f("amount", S),
        _f("balance", S),
    ]
)

# EVENT_JSON payload (reference Event/EventData, actions.rs:300-320)
EVENT_JSON = T.StructType(
    [
        _f("version", S),
        _f("standard", S),
        _f("event", S),
        _f(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        _f("account_id", S),
                        _f("owner_id", S),
                        _f("old_owner_id", S),
                        _f("new_owner_id", S),
                        _f("liquidation_account_id", S),
                        _f("authorized_id", S),
                        _f("token_ids", T.ArrayType(S)),
                        _f("token_id", S),
                        _f("position", S),
                        _f("amount", S),
                    ]
                )
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# output tables (reference DDL README.md:117-331); block_timestamp kept as
# canonical Long nanoseconds (DateTime64(9) exceeds Spark's µs TimestampType)
# ---------------------------------------------------------------------------

ACTIONS_TABLE_SORT_KEY = ["block_height", "account_id", "receipt_index", "action_index"]
EVENTS_TABLE_SORT_KEY = ["block_height", "account_id", "receipt_index", "log_index"]
DATA_TABLE_SORT_KEY = ["block_height", "account_id", "receipt_index"]
TRANSACTIONS_SORT_KEY = ["transaction_hash"]
ACCOUNT_TXS_SORT_KEY = ["account_id", "tx_block_height", "transaction_hash"]
BLOCK_TXS_SORT_KEY = ["block_height", "transaction_hash"]
RECEIPT_TXS_SORT_KEY = ["tx_block_height", "receipt_id"]
BLOCKS_SORT_KEY = ["block_height"]

# bloom-filter columns per table (reference skip indexes, README.md:162-175
# etc.) → parquet bloom filters at write time (storage.py)
BLOOM_COLUMNS = {
    "actions": [
        "account_id",
        "signer_id",
        "block_hash",
        "transaction_hash",
        "receipt_id",
        "public_key",
        "predecessor_id",
        "args_account_id",
        "args_new_account_id",
        "args_owner_id",
        "args_receiver_id",
        "args_sender_id",
    ],
    "events": [
        "account_id",
        "data_account_id",
        "data_owner_id",
        "data_old_owner_id",
        "data_new_owner_id",
    ],
    "data": ["account_id", "data_id"],
    "transactions": ["signer_id", "transaction_hash"],
    "account_txs": ["account_id"],
    "block_txs": [],
    "receipt_txs": ["receipt_id"],
    "blocks": ["author_id", "epoch_id", "block_hash"],
}

SORT_KEYS = {
    "actions": ACTIONS_TABLE_SORT_KEY,
    "events": EVENTS_TABLE_SORT_KEY,
    "data": DATA_TABLE_SORT_KEY,
    "transactions": TRANSACTIONS_SORT_KEY,
    "account_txs": ACCOUNT_TXS_SORT_KEY,
    "block_txs": BLOCK_TXS_SORT_KEY,
    "receipt_txs": RECEIPT_TXS_SORT_KEY,
    "blocks": BLOCKS_SORT_KEY,
}
