"""Online retention() — streaming twin of the ``retention_aggregate``
entry (plans/catalog13.py).

Per-user state is a BITMASK of condition flags (bit i set ⟺ some event
satisfied condition i), and set-bits merge by bitwise OR — commutative
AND idempotent. Like the reservoir/timing twins this stream therefore
needs no ordering contract: the final per-user flags after any replay,
any arrival order, any micro-batch split, and any duplicate chunk
redelivery equal the batch entry's per-user ``max(CASE …)`` flags
exactly, and folding them (r_i = Σ c1·c_i) reproduces the batch row bit
for bit.

State is ONE long per user — the cheapest possible keyed state; at
100 TB the retention dashboard is a keyed-OR over the user population
plus a stateless fold, which is exactly this operator followed by a
``groupBy().agg(sum(...))`` over the latest snapshot.

Per micro-batch the operator emits each touched user's current flags
with an ``emit_seq`` so consumers can keep the freshest snapshot.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("d", T.LongType()),  # epoch-day index of the event
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("flags", T.LongType()),  # bit i = condition i met
        T.StructField("emit_seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("flags", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)


def make_fold(days: tuple):
    """Build the applyInPandasWithState fold for a tuple of epoch-day
    conditions (condition i ⟺ the user has an event on ``days[i]``)."""
    day_bit = {int(day): 1 << i for i, day in enumerate(days)}

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        flags, seq = state.get if state.exists else (0, 0)
        saw = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            saw = True
            for d in pdf["d"].unique():
                flags |= day_bit.get(int(d), 0)
        if saw:
            seq += 1
            state.update((flags, seq))
            yield pd.DataFrame(
                {"user_id": [key[0]], "flags": [flags], "emit_seq": [seq]}
            )

    return _fold


def retention_stream(events: DataFrame, days: tuple) -> DataFrame:
    """Apply the flag-OR state machine to a stream shaped like
    ``IN_SCHEMA``, keyed by user_id. Arrival-order independent AND
    redelivery-idempotent: final flags equal the batch entry's
    per-user max(CASE) flags exactly."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_fold(days),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
