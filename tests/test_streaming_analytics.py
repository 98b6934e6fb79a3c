"""Streaming analytics operators: applyInPandasWithState sessionization
(cross-checked against the batch twin) and watermarked windowed counts
(cross-checked against the batch plan)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.streaming import sessionize, windows


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """events table split into 3 height-ordered parquet chunks so the
    stream sees multiple micro-batches."""
    from clickhouse_provider_spark.session import load_tables

    src = tmp_path_factory.mktemp("events_chunks")
    # load_tables normalizes ts to canonical ns-LongType regardless of the
    # driver's parquet encoding (see tests/test_schema_drift.py)
    ev = load_tables(spark, "/root/testdata/sf0.01")["events"].withColumn(
        "ts_us", F.expr("ts DIV 1000")
    )
    n = ev.count()
    ordered = ev.orderBy("ts_us", "event_id")
    chunks = [
        ordered.limit(n).subtract(ordered.limit(2 * n // 3)),
        ordered.limit(2 * n // 3).subtract(ordered.limit(n // 3)),
        ordered.limit(n // 3),
    ]
    for i, c in enumerate(reversed(chunks)):
        c.coalesce(1).write.parquet(str(src / f"chunk={i}"))
    return str(src), ev


def test_sessionize_stream_matches_batch(spark, events_stream_dir, tmp_path_factory):
    src, ev = events_stream_dir
    ckpt = str(tmp_path_factory.mktemp("ckpt_sess"))
    stream = (
        spark.readStream.schema(
            spark.read.parquet(src + "/chunk=0").schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
    )
    q = (
        sessionize.sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    closed = spark.table("closed_sessions")
    still_open = sessionize.open_sessions(ev)
    # closed ∪ still-open must equal the batch sessionization exactly
    all_sessions = closed.select(
        "user_id", "session_start_us", "session_end_us", "n_events"
    ).unionByName(still_open)
    from clickhouse_provider_spark.plans import CATALOG
    from clickhouse_provider_spark.session import load_tables

    batch = (
        CATALOG["user_sessions"]
        .build(spark, load_tables(spark, "/root/testdata/sf0.01"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    assert all_sessions.count() == batch.count()
    assert all_sessions.exceptAll(batch).count() == 0
    assert batch.exceptAll(all_sessions).count() == 0
    assert closed.count() > 0  # the stream really closed sessions mid-flight


def test_windowed_counts_stream_matches_batch(spark, events_stream_dir, tmp_path_factory):
    src, ev = events_stream_dir
    ckpt = str(tmp_path_factory.mktemp("ckpt_win"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/chunk=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
    )
    q = (
        windows.windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("win_counts")
    expect = windows.windowed_event_counts(ev, streaming=False)
    # append mode only emits watermark-finalized windows → got ⊆ expect,
    # and every finalized window matches the batch result exactly
    assert got.count() > 0
    assert got.exceptAll(expect).count() == 0
    finalized = got.select("window_start").distinct().count()
    assert finalized >= expect.select("window_start").distinct().count() - 3


def test_stream_dedup_within_watermark(spark, events_stream_dir, tmp_path_factory):
    """Duplicated input stream -> dropDuplicatesWithinWatermark restores the
    exact distinct set (all dups here arrive within the watermark), matching
    the batch dedup twin; state stays bounded by construction."""
    import glob
    import os

    src, ev = events_stream_dir
    dup_src = str(tmp_path_factory.mktemp("dup_chunks"))
    # each time-ordered chunk twice -> every event_id seen twice across
    # micro-batches, with arrival in EVENT-TIME order (the operator's
    # in-order contract: a legit row arriving behind the watermark would
    # be dropped as late, which is replay-window semantics, not dedup).
    # FileStreamSource orders by modification time, so pin mtimes
    # explicitly — same-ms writes would otherwise tie and interleave.
    for i in range(3):
        chunk = spark.read.parquet(src + f"/chunk={i}")
        for copy in range(2):
            out_dir = dup_src + f"/b{i}_{copy}"
            chunk.write.parquet(out_dir)
            stamp = 1_000_000_000 + (i * 2 + copy) * 60
            for f in glob.glob(out_dir + "/*.parquet"):
                os.utime(f, (stamp, stamp))
    ckpt = str(tmp_path_factory.mktemp("ckpt_dedup"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/chunk=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dup_src + "/b*")
    )
    q = (
        windows.dedup_within_watermark(stream, keys=["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("dedup_stream")
    n_events = ev.count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_sessionize_stream_on_rocksdb_state_store(spark, events_stream_dir, tmp_path_factory):
    """The stateful operators must run unchanged on the RocksDB state
    store provider — the backend that keeps streaming state off-heap and
    larger-than-memory at production scale (the default HDFS-backed map
    holds every key in executor memory). Same closed ∪ open == batch
    equality as the default-provider test."""
    src, ev = events_stream_dir
    ckpt = str(tmp_path_factory.mktemp("ckpt_rocks"))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(src + "/chunk=0").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/chunk=*")
        )
        q = (
            sessionize.sessionize_stream(stream)
            .writeStream.format("memory")
            .queryName("closed_sessions_rocks")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    closed = spark.table("closed_sessions_rocks")
    all_sessions = closed.select(
        "user_id", "session_start_us", "session_end_us", "n_events"
    ).unionByName(sessionize.open_sessions(ev))
    from clickhouse_provider_spark.plans import CATALOG
    from clickhouse_provider_spark.session import load_tables

    batch = (
        CATALOG["user_sessions"]
        .build(spark, load_tables(spark, "/root/testdata/sf0.01"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    assert all_sessions.exceptAll(batch).count() == 0
    assert batch.exceptAll(all_sessions).count() == 0
    assert closed.count() > 0


def test_funnel_stream_matches_batch_exact_funnel(spark, events_stream_dir, tmp_path_factory):
    """In-order replay of the streaming funnel state machine == the exact
    batch funnel (composed monotone window maxima), level for level; and
    the upgrade stream is strictly increasing per user."""
    from clickhouse_provider_spark.operators.temporal import funnel_levels
    from clickhouse_provider_spark.streaming import funnel

    src, ev = events_stream_dir
    ckpt = str(tmp_path_factory.mktemp("ckpt_funnel"))
    stages = ["signup", "click", "purchase"]
    window_us = 7 * 86_400_000_000
    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/chunk=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
    )
    q = (
        funnel.funnel_stream(stream, stages, window_us)
        .writeStream.format("memory")
        .queryName("funnel_upgrades")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("funnel_upgrades")
    got = out.groupBy("user_id").agg(F.max("level").alias("level"))
    batch = funnel_levels(
        ev.select("user_id", "event_id", "ts_us", "event_type"),
        key="user_id",
        ts="ts_us",
        order_col="event_id",
        stage_conds=[F.col("event_type") == s for s in stages],
        window_us=window_us,
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    assert out.count() > 0
    # upgrade stream: one row per (user, level), levels strictly increasing
    assert out.groupBy("user_id", "level").count().filter("count > 1").count() == 0


def test_funnel_state_fn_handles_epoch_zero_events():
    """A chain starting at ts_us == 0 must be tracked: the 'not yet seen'
    sentinel is -1, so epoch-0 stage-1 events record their chain start and
    later stages complete (the old 0-sentinel silently dropped them)."""
    import pandas as pd

    from clickhouse_provider_spark.streaming.funnel import _make_fn

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    fn = _make_fn(["signup", "click", "purchase"], window_us=100)
    state = FakeState()
    pdf = pd.DataFrame(
        {
            "ts_us": [0, 5, 9],
            "event_id": [1, 2, 3],
            "event_type": ["signup", "click", "purchase"],
        }
    )
    out = pd.concat(list(fn((7,), iter([pdf]), state)))
    # upgrades to levels 1, 2, 3 — level 3 proves the epoch-0 chain start
    # survived into starts[] (batch equality for ts > 0 is pinned by
    # test_funnel_stream_matches_batch_exact_funnel)
    assert list(out["level"]) == [1, 2, 3]
    assert list(out["reached_ts_us"]) == [0, 5, 9]
    starts, level = state.get
    assert level == 3 and starts[0] == 0


def test_heavy_hitters_stream_matches_batch_topk(spark, events_stream_dir, tmp_path_factory):
    """Online SpaceSaving with capacity >= distinct users per type: the
    final (highest-seq) snapshot per event_type equals the exact batch
    top-5 — same grading stance as the approx_topk_heavy_hitters oracle."""
    from clickhouse_provider_spark.streaming import heavy_hitters

    src, ev = events_stream_dir
    ckpt = str(tmp_path_factory.mktemp("ckpt_hh"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/chunk=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk=*")
    )
    q = (
        heavy_hitters.heavy_hitters_stream(stream, capacity=100_000, k=5)
        .writeStream.format("memory")
        .queryName("hh_snapshots")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    snaps = spark.table("hh_snapshots")
    assert snaps.count() > 0
    from pyspark.sql.window import Window as W

    w_seq = W.partitionBy("event_type").orderBy(F.desc("seq"))
    final = (
        snaps.withColumn("_r", F.dense_rank().over(w_seq))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    # exact summary -> zero error on every emitted row
    assert final.filter(F.col("max_err") != 0).count() == 0

    w = W.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    batch = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "rnk", "user_id", F.col("n_events").alias("est_count"))
    )
    got = final.select("event_type", "rnk", "user_id", "est_count")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_heavy_hitters_small_capacity_bounds():
    """Tiny capacity forces evictions: the SpaceSaving invariants must
    hold — est >= true, est - err <= true, and any item with true count
    > N/capacity is present (driven directly through the state fn)."""
    import pandas as pd

    from clickhouse_provider_spark.streaming.heavy_hitters import _make_fn

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    # skewed stream: item 1 dominates, long tail of singletons
    rows = [1] * 50 + list(range(100, 140)) + [1] * 30 + list(range(140, 170))
    true = {i: rows.count(i) for i in set(rows)}
    n = len(rows)
    cap = 8
    fn = _make_fn(cap, k=cap)
    state = FakeState()
    # two micro-batches to exercise state carry
    out = []
    for chunk in (rows[: n // 2], rows[n // 2:]):
        pdf = pd.DataFrame({"user_id": chunk})
        out = pd.concat(list(fn(("click",), iter([pdf]), state)))
    items, counts, errs, seq = state.get
    assert seq == 2 and len(items) <= cap
    summary = dict(zip(items, zip(counts, errs)))
    for item, (est, err) in summary.items():
        t = true.get(item, 0)
        assert est >= t, (item, est, t)
        assert est - err <= t, (item, est, err, t)
    # heavy-hitter guarantee: true count > N/capacity => present
    for item, t in true.items():
        if t > n / cap:
            assert item in summary, (item, t)
    # and the emitted snapshot ranks the dominant item first
    assert out.sort_values("rnk").iloc[0]["user_id"] == 1


def test_heavy_hitters_stream_on_rocksdb_state_store(spark, events_stream_dir, tmp_path_factory):
    """The SpaceSaving topK state machine must run unchanged on the
    RocksDB state store provider (same final-snapshot == batch-top-5
    equality as the default-provider test)."""
    from clickhouse_provider_spark.streaming import heavy_hitters

    src, ev = events_stream_dir
    ckpt = str(tmp_path_factory.mktemp("ckpt_hh_rocks"))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(src + "/chunk=0").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/chunk=*")
        )
        q = (
            heavy_hitters.heavy_hitters_stream(stream, capacity=100_000, k=5)
            .writeStream.format("memory")
            .queryName("hh_snapshots_rocks")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    snaps = spark.table("hh_snapshots_rocks")
    from pyspark.sql.window import Window as W

    w_seq = W.partitionBy("event_type").orderBy(F.desc("seq"))
    final = (
        snaps.withColumn("_r", F.dense_rank().over(w_seq))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    w = W.partitionBy("event_type").orderBy(F.desc("n_events"), F.asc("user_id"))
    batch = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "rnk", "user_id", F.col("n_events").alias("est_count"))
    )
    got = final.select("event_type", "rnk", "user_id", "est_count")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
