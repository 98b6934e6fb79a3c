"""Streaming heavy hitters: the online twin of the batch
``approx_topk_heavy_hitters`` catalog entry (ClickHouse ``topK`` analog),
as a keyed SpaceSaving summary over ``applyInPandasWithState``.

ClickHouse's ``topK`` is a bounded-memory frequent-items sketch of the
SpaceSaving family: keep at most ``capacity`` (item, count, err) slots;
an unseen item arriving at a full summary evicts the current minimum and
inherits its count as both estimate floor and error bound. The same
structure IS the sufficient streaming state — ``3*capacity`` numbers per
group — so the online operator folds each micro-batch into the summary
and emits the current top-k per group as an upgrade-style snapshot row
set tagged with a per-group ``seq`` (latest seq = current standings).

Guarantees carried to the stream (classic SpaceSaving):

- estimate is never below the true count: ``est >= true``;
- ``est - err <= true`` — the error bound brackets the truth;
- any item whose true count exceeds N/capacity is present in the summary.

With ``capacity`` >= distinct items per group the summary is exact, and
the final snapshot equals the exact batch top-k (pinned by test against
the batch catalog entry — the same grading stance that entry's oracle
takes).

Batches are folded pre-aggregated: a vectorized ``value_counts`` first,
then one summary update per DISTINCT item in the batch (the standard
SpaceSaving merge) — per-batch work is O(distinct-in-batch · log) not
O(rows). Scale: state is ``3*capacity`` longs + a counter per group,
hash-distributed; RocksDB state store for large group counts, same as
the other keyed operators in this package.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("rnk", T.IntegerType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("max_err", T.LongType()),
    ]
)

#: parallel arrays (item -> estimate, error floor) + the snapshot counter
STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ]
)


def _make_fn(capacity: int, k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            items, counts, errs, seq = state.get
            summary = {
                int(i): [int(c), int(e)]
                for i, c, e in zip(items, counts, errs)
            }
        else:
            summary, seq = {}, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # SpaceSaving merge of the batch's pre-aggregated counts,
            # folded in fixed (count desc, item) order so the result is a
            # function of the batch's multiset alone — intra-partition row
            # order is not stable across task retries, and without the
            # sort the eviction victim at capacity overflow would depend
            # on arrival order of distinct items
            batch_counts = pdf["user_id"].value_counts()
            for item, c in sorted(
                batch_counts.items(), key=lambda kv: (-kv[1], kv[0])
            ):
                item, c = int(item), int(c)
                if item in summary:
                    summary[item][0] += c
                elif len(summary) < capacity:
                    summary[item] = [c, 0]
                else:
                    # evict the minimum estimate (ties -> smallest item);
                    # with the sorted fold above, replaying an identical
                    # batch always evicts the same victims and yields an
                    # identical state; the newcomer inherits the evicted
                    # estimate as floor and error
                    evict = min(summary.items(), key=lambda kv: (kv[1][0], kv[0]))
                    mc = evict[1][0]
                    del summary[evict[0]]
                    summary[item] = [mc + c, mc]
        seq += 1
        top = sorted(summary.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        state.update(
            (
                [i for i in summary],
                [ce[0] for ce in summary.values()],
                [ce[1] for ce in summary.values()],
                seq,
            )
        )
        yield pd.DataFrame(
            [
                (event_type, seq, r + 1, item, ce[0], ce[1])
                for r, (item, ce) in enumerate(top)
            ],
            columns=["event_type", "seq", "rnk", "user_id", "est_count", "max_err"],
        )

    return fn


def heavy_hitters_stream(
    events: DataFrame, capacity: int = 256, k: int = 5
) -> DataFrame:
    """events(event_type, user_id, ...) stream → per-micro-batch top-k
    snapshots (event_type, seq, rnk, user_id, est_count, max_err). The
    row set with the highest ``seq`` per event_type is the current
    standings; with ``capacity`` >= distinct users per type it equals
    the exact batch top-k."""
    return (
        events.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_fn(capacity, k),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
