"""Streaming temporal enrichment — the Structured Streaming twins of the
batch temporal operators (operators/temporal.py):

- :func:`asof_enrich_stream` — point-in-time enrichment of a keyed event
  stream with the latest prior value from a second (reference) stream,
  via ``applyInPandasWithState``: per-key state holds just
  ``(last_ref_ts, last_ref_value)``, the same keyed-mutable-state shape as
  the reference's TxCache (`transactions.rs`: pending txs keyed by hash),
  applied to feature enrichment. This is the online form of
  ``operators/temporal.asof_join``; the batch operator is its oracle.
- :func:`stream_interval_join` — events joined to the hour following each
  purchase BY THE SAME USER, as a native watermarked stream-stream
  time-bounded join (no custom state code: Spark's
  StreamingSymmetricHashJoin keeps both sides' state and the watermark +
  time bound let it evict). Batch twin: ``range_join_binned`` with
  ``extra_key``.

Ordering semantics of :func:`asof_enrich_stream`: WITHIN a micro-batch,
rows apply in event-time order (sorted before the state walk); ACROSS
micro-batches, arrival order — a reference row arriving after a left event
was already emitted does NOT retro-update it (online feature-serving
semantics; same no-retro-update stance as feature stores). With an
in-order source the result equals the batch as-of join exactly
(tests/test_streaming_temporal.py); bounded disorder should be absorbed
upstream by the ordered-replay source (sources/blocks.py pattern).

Scale: as-of state is two scalars per key — O(distinct keys), hash-
distributed, RocksDB-backed for high cardinality. The interval join's
state is bounded by the watermark horizon on both sides (each side
retains only rows newer than the watermark minus the join range).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: left/ref union row: side 0 = reference (state-updating), 1 = left (emitting)
UNION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("side", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("matched_ts", T.LongType()),
        T.StructField("matched_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def tag_sides(left: DataFrame, right: DataFrame, key: str, ts_us: str, event_id: str, value: str) -> DataFrame:
    """Union a left event frame and a right reference frame into the tagged
    shape :func:`asof_enrich_stream` consumes (right's ``value`` carried,
    left's nulled)."""
    l = left.select(
        F.col(key).cast("long").alias("key"),
        F.col(event_id).cast("long").alias("event_id"),
        F.col(ts_us).cast("long").alias("ts_us"),
        F.lit(1).alias("side"),
        F.lit(None).cast("double").alias("value"),
    )
    r = right.select(
        F.col(key).cast("long").alias("key"),
        F.col(event_id).cast("long").alias("event_id"),
        F.col(ts_us).cast("long").alias("ts_us"),
        F.lit(0).alias("side"),
        F.col(value).cast("double").alias("value"),
    )
    return l.unionByName(r)


def _enrich(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    # event-time order within the batch; side 0 (reference) before side 1
    # at equal ts → simultaneous reference rows match (inclusive as-of),
    # event_id last for a total, deterministic order among ties
    rows = rows.sort_values(["ts_us", "side", "event_id"], kind="mergesort")
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = None, None
    out = []
    for r in rows.itertuples(index=False):
        if r.side == 0:
            # refs arrive ts-sorted within the batch, but a batch can
            # arrive late as a whole: never move state backwards
            if last_ts is None or r.ts_us >= last_ts:
                last_ts, last_value = int(r.ts_us), float(r.value)
        else:
            out.append((int(r.key), int(r.event_id), int(r.ts_us), last_ts, last_value))
    state.update((last_ts, last_value))
    if out:
        yield pd.DataFrame(
            out, columns=["key", "event_id", "ts_us", "matched_ts", "matched_value"]
        )


def asof_enrich_stream(tagged: DataFrame) -> DataFrame:
    """Apply the keyed as-of state machine to a tagged union stream (see
    :func:`tag_sides`). Works identically on a batch frame via
    ``applyInPandas``-style grouping in tests' availableNow replay."""
    return tagged.groupBy("key").applyInPandasWithState(
        _enrich,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_join(
    events: DataFrame,
    purchases: DataFrame,
    range_us: int,
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Events within ``range_us`` after a purchase by the SAME user, as a
    native stream-stream join: equi-key on user_id + event-time bound.
    Both sides carry watermarks so the symmetric hash join can evict state
    older than the horizon. ``streaming=False`` runs the identical plan on
    batch frames (the differential twin of ``range_join_binned`` with
    ``extra_key='user_id'``)."""
    e = events.select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("e_event_id"),
        F.col("ts_us").alias("e_ts_us"),
        F.timestamp_micros(F.col("ts_us")).alias("e_time"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("interval_id"),
        F.col("ts_us").alias("p_ts_us"),
        F.timestamp_micros(F.col("ts_us")).alias("p_time"),
    )
    if streaming:
        e = e.withWatermark("e_time", watermark)
        p = p.withWatermark("p_time", watermark)
    secs = range_us // 1_000_000
    cond = (
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_time") >= F.col("p_time"))
        & (F.col("e_time") < F.col("p_time") + F.expr(f"INTERVAL {secs} SECONDS"))
    )
    return e.join(p, cond, "inner").select(
        F.col("interval_id"),
        F.col("p_user").alias("user_id"),
        "e_event_id",
        "e_ts_us",
    )
