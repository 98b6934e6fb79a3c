"""Custom stateful streaming operator: user sessionization with
``applyInPandasWithState`` — the pattern the reference's TxCache represents
(keyed mutable state over an ordered stream), applied to the analytics
side. The batch twin (identical semantics, lag + running sum) is the
``user_sessions`` catalog entry; tests cross-check the two.

State per user: (session_start_us, last_ts_us, n_events). An incoming
event more than ``gap_us`` after the last one CLOSES the open session
(emitted downstream) and opens a new one. Sessions still open when a
micro-batch ends stay in the state store.

Scale: state is keyed by user → hash-distributed across executors; each
key holds 3 longs, so the store is O(active users), with RocksDB as the
backing store for large cardinalities
(spark.sql.streaming.stateStore.providerClass). In production add an
event-time timeout (GroupStateTimeout.EventTimeTimeout + watermark) so
idle sessions flush; kept explicit here because the availableNow test
harness ends the stream instead of advancing a watermark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_GAP_US = 1_800_000_000  # 30 min

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _make_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(v) for v in pdf["ts_us"])
        for ts in sorted(ts_all):
            if last is not None and ts - last > gap_us:
                closed.append((user_id, start, last, n))
                start, n = ts, 0
            if start is None:
                start = ts
            last = ts
            n += 1
        state.update((start, last, n))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )

    return fn


def sessionize_stream(
    events: DataFrame, gap_us: int = DEFAULT_GAP_US
) -> DataFrame:
    """events(user_id, ts_us) stream → closed-session stream."""
    return (
        events.select("user_id", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_fn(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def open_sessions(events: DataFrame, gap_us: int = DEFAULT_GAP_US) -> DataFrame:
    """Batch helper: the sessions a stream would still hold open after
    consuming ``events`` — used to reconcile stream output with the batch
    ``user_sessions`` computation (closed ∪ open = all sessions)."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts_us")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (
        events.select("user_id", "ts_us")
        .withColumn("prev", F.lag("ts_us").over(w))
        .withColumn(
            "new_s",
            F.when(F.col("prev").isNull() | (F.col("ts_us") - F.col("prev") > gap_us), 1).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(run))
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("sid"))
    return (
        sess.join(last_sid, ["user_id", "sid"])
        .groupBy("user_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
