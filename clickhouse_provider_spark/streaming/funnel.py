"""Streaming windowFunnel: the online twin of the exact batch funnel
(``operators/temporal.funnel_levels``) as a keyed state machine over
``applyInPandasWithState``.

The batch form computes, per key, composed monotone window maxima —
``start_k(e)`` = the best (latest) chain start among stage-1→…→k chains
ending at-or-before ``e``. Those running maxima ARE the sufficient state:
one long per stage (plus the emitted level), so the online operator keeps
``n_stages + 1`` longs per key and replays the identical recurrence
event-by-event. In-order replay therefore equals the batch operator
exactly (pinned by test); the output is an UPGRADE stream — a row each
time a key's funnel level increases, so downstream consumers see funnel
progress live instead of at end-of-day.

Contract (same as streaming/enrich.py's as-of state machine): events must
arrive per-key in event-time order across micro-batches (within a batch
they are sorted here). Out-of-order arrivals would need the batch form
over a replayed window — the reference's SAFE_CATCH_UP_OFFSET pattern.

Scale: state is n_stages+1 longs per key, hash-distributed; RocksDB
state store for large key cardinalities (green under it —
tests/test_streaming_analytics.py shows the provider swap).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("reached_ts_us", T.LongType()),
    ]
)

#: starts[i] = best chain start over stage-1→…→(i+1) chains so far
#: (-1 = not yet seen; any real event time >= 0 beats it, so chains
#: starting at epoch 0 are tracked correctly — the batch form treats
#: "not seen" as NULL and has no sentinel at all), plus the highest
#: level already emitted.
#:
#: CHECKPOINT COMPATIBILITY: the "not yet seen" sentinel changed from 0
#: to -1 (round 6) without a change to STATE_SCHEMA itself, so Spark
#: will happily restore checkpoints written under the old encoding and
#: reinterpret a stored 0 as a real chain start at epoch 0, which can
#: emit spurious level upgrades after restart. Treat the sentinel change
#: as a state-format version bump: resume only from a fresh
#: checkpointLocation.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("level", T.IntegerType()),
    ]
)


def _make_fn(stages: list[str], window_us: int):
    n = len(stages)
    stage_idx = {s: i for i, s in enumerate(stages)}

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            starts_raw, level = state.get
            starts = list(starts_raw)
        else:
            starts, level = [-1] * n, 0
        rows: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(e), et)
                for t, e, et in zip(pdf["ts_us"], pdf["event_id"], pdf["event_type"])
            )
        upgrades: list[tuple] = []
        # same total order as the batch window: (ts, event_id)
        for ts, _eid, et in sorted(rows):
            i = stage_idx.get(et)
            if i is None:
                continue
            if i == 0:
                # stage-1 rows always satisfy ts - start_1 <= window
                # (start_1 >= own ts), so level 1 is "any stage-1 event"
                if starts[0] < ts:
                    starts[0] = ts
                reached = 1
            else:
                if starts[i - 1] == -1:
                    continue  # no chain of length i ends before this row
                reached = i + 1 if ts - starts[i - 1] <= window_us else 0
                # carry the chain start forward REGARDLESS of the window —
                # the batch recurrence applies the window only at the
                # level check (reference semantics: the bound is between
                # chain start and chain END, not per step)
                if starts[i] < starts[i - 1]:
                    starts[i] = starts[i - 1]
            if reached > level:
                level = reached
                upgrades.append((user_id, level, ts))
        state.update((starts, level))
        yield pd.DataFrame(
            upgrades, columns=["user_id", "level", "reached_ts_us"]
        )

    return fn


def funnel_stream(
    events: DataFrame, stages: list[str], window_us: int
) -> DataFrame:
    """events(user_id, event_id, ts_us, event_type) stream → upgrade
    stream (user_id, level, reached_ts_us). The latest level per user
    equals ``funnel_levels`` run over the same events in batch."""
    return (
        events.select("user_id", "event_id", "ts_us", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_fn(stages, window_us),
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
