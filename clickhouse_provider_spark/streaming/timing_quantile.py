"""Online quantileTiming — streaming twin of the ``quantile_timing``
entry (plans/catalog12.py).

The tiered-bucket quantile's state is a bounded bucket→count map (exact
1-unit buckets below 1024, 16-wide to 65536, clamp above: <= 3620
counters), and counting is COMMUTATIVE — so unlike the funnel/EMA twins,
this stream needs no ordering contract at all: the final state after any
replay, in any arrival order, over any micro-batch split, is exactly the
batch entry's bucket histogram, and the emitted quantiles are exactly the
batch quantiles (pure integer selection, no floats). This is the
mergeable-sketch property that makes timing quantiles the serving-layer
percentile at 100 TB: partial maps merge by addition, state is bounded,
and the answer is a deterministic function of the data multiset.

Per micro-batch the operator emits each seen key's current
(n, p50, p90, p99) — an always-fresh latency dashboard.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from clickhouse_provider_spark.plans.catalog12 import _BIG, _SMALL, _STEP

IN_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("p50_bucket", T.LongType()),
        T.StructField("p90_bucket", T.LongType()),
        T.StructField("p99_bucket", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

#: parallel arrays (bucket -> count) — bounded at <= 3620 entries by the
#: tiering, the whole point of the timing-quantile design
STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("emit_seq", T.LongType()),
    ]
)


def to_buckets(values: np.ndarray) -> np.ndarray:
    """Vectorized value*100 -> tiered bucket (mirrors the SQL/DataFrame
    bucketing in plans/catalog12.py exactly: floor, then tier)."""
    t = np.floor(values * 100.0).astype(np.int64)
    mid = (t // _STEP) * _STEP
    return np.where(t < _SMALL, t, np.where(t < _BIG, mid, _BIG))


def quantile_buckets(buckets: np.ndarray, counts: np.ndarray) -> tuple:
    """(n, p50, p90, p99) from a bucket histogram — integer selection,
    identical to the batch entry's 2*cum>=n / 10*cum>=9n / 100*cum>=99n."""
    order = np.argsort(buckets)
    b, c = buckets[order], counts[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    p50 = int(b[np.argmax(2 * cum >= n)])
    p90 = int(b[np.argmax(10 * cum >= 9 * n)])
    p99 = int(b[np.argmax(100 * cum >= 99 * n)])
    return n, p50, p90, p99


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bk, ct, seq = state.get
        hist = dict(zip(bk, ct))
    else:
        hist, seq = {}, 0
    saw = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        saw = True
        vb = to_buckets(pdf["value"].to_numpy(dtype=np.float64))
        uniq, cnt = np.unique(vb, return_counts=True)
        for b, c in zip(uniq, cnt):
            hist[int(b)] = hist.get(int(b), 0) + int(c)
    if saw:
        seq += 1
        state.update((list(hist), list(hist.values()), seq))
        n, p50, p90, p99 = quantile_buckets(
            np.fromiter(hist.keys(), dtype=np.int64),
            np.fromiter(hist.values(), dtype=np.int64),
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [n],
                "p50_bucket": [p50],
                "p90_bucket": [p90],
                "p99_bucket": [p99],
                "emit_seq": [seq],
            }
        )


def timing_quantile_stream(events: DataFrame) -> DataFrame:
    """Apply the bucket-histogram state machine to a stream shaped like
    ``IN_SCHEMA``, keyed by event_type. Arrival-order independent: the
    final emission equals the batch quantile_timing entry exactly."""
    return events.groupBy("event_type").applyInPandasWithState(
        _fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
