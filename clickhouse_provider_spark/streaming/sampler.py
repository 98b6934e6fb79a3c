"""Online deterministic reservoir — streaming twin of the
``sample_reservoir`` entry (plans/catalog6.py).

The batch operator (operators/sampling.reservoir_per_group) keeps the k
rows with the SMALLEST ``md5(salt || key)`` per group. "k smallest of a
set" is a commutative, idempotent fold: the k smallest of any union of
chunks, merged in any order, equals the k smallest of the whole — so
like the timing-quantile twin (and unlike the funnel/EMA twins) this
stream needs no ordering contract at all. The final reservoir after any
replay, any arrival order, any micro-batch split is exactly the batch
entry's sample, bit for bit.

Idempotent under redelivery too: state is a SET of (hash, key) pairs
(keys are unique per group, e.g. event_id), so reprocessing a chunk
after a failure cannot double-insert — the same property that makes the
md5-threshold design reproducible across engines makes it replay-safe.

State is bounded at k (hash8, key) pairs per group — the 100 TB shape:
a 1000-executor ingest keeps one tiny reservoir per class, and partial
reservoirs from any number of streams merge by the same top-k fold.

Per micro-batch the operator emits each touched group's current sample
with its 1-based rank and an ``emit_seq`` so consumers can keep the
freshest snapshot.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("sample_rank", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

#: parallel arrays, sorted by (hash, key), length <= k
STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.StringType())),
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("emit_seq", T.LongType()),
    ]
)


def hash8(salt: str, key: int) -> str:
    """First 8 hex chars of md5(salt || str(key)) — identical to the
    batch operator's Spark-side ``substring(md5(concat(salt,
    cast(key as string))), 1, 8)`` and the oracle's DuckDB substr(md5(...))."""
    return hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8]


def make_fold(salt: str, k: int):
    """Build the applyInPandasWithState fold for a given (salt, k)."""

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, ks, seq = state.get
            pool = dict(zip(ks, hs))  # key -> hash (set semantics on key)
        else:
            pool, seq = {}, 0
        saw = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            saw = True
            for kid in pdf["event_id"]:
                kid = int(kid)
                if kid not in pool:
                    pool[kid] = hash8(salt, kid)
        if saw:
            # k smallest by (hash, key) — the batch operator's exact order
            top = sorted(pool.items(), key=lambda it: (it[1], it[0]))[:k]
            seq += 1
            state.update(([h for _, h in top], [i for i, _ in top], seq))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]] * len(top),
                    "event_id": [i for i, _ in top],
                    "sample_rank": list(range(1, len(top) + 1)),
                    "emit_seq": [seq] * len(top),
                }
            )

    return _fold


def reservoir_stream(events: DataFrame, salt: str, k: int = 20) -> DataFrame:
    """Apply the top-k-by-hash reservoir to a stream shaped like
    ``IN_SCHEMA``, keyed by event_type. Arrival-order independent: the
    final emission per group equals the batch ``sample_reservoir``
    entry exactly (same hash, same (hash, key) tie order, same k)."""
    return events.groupBy("event_type").applyInPandasWithState(
        make_fold(salt, k),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
