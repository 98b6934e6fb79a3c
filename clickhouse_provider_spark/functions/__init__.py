"""Pure column functions shared by the pipeline operators.

Everything here is JVM-side codegen except ``base58_sha256`` (a Pandas UDF
on the cold DeployContract path only — reference actions.rs:514-519 hashes
deploy code with sha256 and base58-encodes it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MAX_TOKEN_LENGTH = 64  # reference actions.rs:18
MAX_TOKEN_IDS_LENGTH = 4  # reference actions.rs:19
EVENT_LOG_PREFIX = "EVENT_JSON:"  # reference actions.rs:20

# NEAR account-id grammar (public protocol rule): 2..64 chars of
# lowercase-alnum segments joined by ._- ; used to replicate the
# AccountId::from_str validation gate (reference transactions.rs:528-530).
ACCOUNT_ID_RE = r"^(([a-z0-9]+[\-_])*[a-z0-9]+\.)*([a-z0-9]+[\-_])*[a-z0-9]+$"


def utf8_or_base64(bin_col: F.Column) -> F.Column:
    """Bytes → UTF-8 string if valid, else 'base64:' + b64 (reference
    string_from_vec_u8, actions.rs:286-289). NULL passes through."""
    return F.when(
        F.is_valid_utf8(bin_col), bin_col.cast(T.StringType())
    ).otherwise(F.concat(F.lit("base64:"), F.base64(bin_col)))


def decode_b64(col: F.Column) -> F.Column:
    """Base64 JSON field → binary (NULL-safe)."""
    return F.unbase64(col)


def b64_field_as_text(col: F.Column) -> F.Column:
    """Base64 JSON field → utf8-or-'base64:' display form."""
    return F.when(col.isNotNull(), utf8_or_base64(F.unbase64(col)))


def account_id_valid(col: F.Column) -> F.Column:
    return (
        col.isNotNull()
        & (F.length(col) >= 2)
        & (F.length(col) <= 64)
        & col.rlike(ACCOUNT_ID_RE)
    )


def limit_length(col: F.Column, max_len: int = MAX_TOKEN_LENGTH) -> F.Column:
    """Strings longer than 64 bytes → NULL (reference limit_length,
    actions.rs:280-284; byte length == char length for these ASCII ids —
    the reference measures bytes, we measure via octet_length)."""
    return F.when(F.octet_length(col) <= max_len, col)


def cap_token_ids(arr: F.Column) -> F.Column:
    """token_ids array: drop elements > 64 bytes, then truncate to 4
    (reference parse_event, actions.rs:327-333; resize only ever shrinks
    here because resize-with-"" pads only when longer than actual)."""
    kept = F.filter(arr, lambda x: F.octet_length(x) <= MAX_TOKEN_LENGTH)
    return F.when(arr.isNotNull(), F.slice(kept, 1, MAX_TOKEN_IDS_LENGTH))


def parse_u128(col: F.Column) -> F.Column:
    """Digit-string → Decimal(38,0), NULL otherwise — replicates Rust
    str.parse::<u128>() (rejects signs, decimals, whitespace). Values in
    (10^38-1, 2^128) parse in Rust but overflow Decimal(38,0) → NULL here;
    beyond the ~1.25e33 yoctoNEAR supply this is unreachable in practice."""
    return F.when(col.rlike(r"^[0-9]+$"), col.try_cast(T.DecimalType(38, 0)))


@pandas_udf(T.StringType())
def base58_sha256(code_b64: pd.Series) -> pd.Series:
    """base58(sha256(base64decode(code))) — contract hash (reference
    CryptoHash::hash_bytes().to_string(), actions.rs:514-519; base58 is the
    public bitcoin alphabet). Cold path: only DeployContract actions."""
    import base64
    import hashlib

    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

    def b58(raw: bytes) -> str:
        num = int.from_bytes(raw, "big")
        out = ""
        while num > 0:
            num, rem = divmod(num, 58)
            out = alphabet[rem] + out
        pad = 0
        for byte in raw:
            if byte == 0:
                pad += 1
            else:
                break
        return "1" * pad + out

    def conv(v):
        if v is None:
            return None
        return b58(hashlib.sha256(base64.b64decode(v)).digest())

    return code_b64.map(conv)
