"""Online exponential time-decayed average — the streaming twin of the
batch ``exp_time_decayed_avg`` entry (plans/catalog10.py), which keeps the
full ``x_i * 2^di`` prefix as a decimal accumulator. The streaming form is
the bounded-state recurrence that batch docstring promises: per key, just
``(last_day, W, S)`` where

    W_d = sum over present days i <= d of x_i * 2^(i-d)
    S_d = sum over ALL days 0..d of 2^(j-d)  (= 2 - 2^-d)

advance by a gap of g days as ``W <- W*2^-g + x`` and
``S <- S*2^-g + (2 - 2^(1-g))`` (the g elapsed days' weights), and
same-day arrivals fold in with no decay. ema = W / S.

State never grows with history (three scalars per key) and the decayed
magnitudes stay bounded — the form that survives unbounded streams, where
the batch entry's 2^di accumulator overflows past spans of ~59 days.

Exactness: with integer-valued x and spans <= ~20 days every intermediate
is a dyadic rational within double precision, and the recurrence telescopes
to EXACTLY the batch formula's ratio (both reduce to
sum(x_i*2^i) / (2^(d+1)-1) with exact operands), so in-order replay equals
the batch entry BIT-FOR-BIT (pinned in tests/test_streaming_analytics.py);
general floats agree to ~1 ulp per fold step.

In-order contract as streaming/enrich.py: within a micro-batch rows apply
in day order (sorted before the fold); across batches, arrival order — a
day arriving after a later day was folded does NOT retro-update (its gap
clamps to 0, it folds into the current day). Feed from an ordered-replay
source (sources/blocks.py pattern) for batch-equality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day_idx", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day_idx", T.LongType()),
        T.StructField("ema_halflife_1d", T.DoubleType()),
        # strictly increasing per key across micro-batches: lets an
        # update-mode sink pick each key's LATEST emission unambiguously
        # (several batches can end on the same day_idx)
        T.StructField("emit_seq", T.LongType()),
    ]
)

#: (last_day, W, S) — the whole per-key state; see module docstring
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_day", T.LongType()),
        T.StructField("w", T.DoubleType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_day, w, s, seq = state.get
    else:
        last_day, w, s, seq = None, 0.0, 0.0, 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # per-day sums inside the batch, folded in ascending day order;
        # same-day values add BEFORE any decay, mirroring the batch
        # entry's per-day pre-aggregation
        by_day = pdf.groupby("day_idx", sort=True)["value"].sum()
        for day, x in by_day.items():
            day = int(day)
            if last_day is None:
                last_day, w, s = day, float(x), 1.0
                continue
            gap = day - last_day
            if gap <= 0:  # late/same-day data folds into the current day
                w += float(x)
                continue
            f = 2.0 ** float(-gap)
            w = w * f + float(x)
            s = s * f + (2.0 - 2.0 ** float(1 - gap))
            last_day = day
    if last_day is not None:
        seq += 1
        state.update((last_day, w, s, seq))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "day_idx": [last_day],
                "ema_halflife_1d": [w / s],
                "emit_seq": [seq],
            }
        )


def ema_stream(daily: DataFrame) -> DataFrame:
    """Apply the (W, S) decay recurrence to a stream shaped like
    ``IN_SCHEMA`` (pre-bucketed day index + value), keyed by event_type.
    Emits the key's current (day, ema) once per micro-batch."""
    return daily.groupBy("event_type").applyInPandasWithState(
        _fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
