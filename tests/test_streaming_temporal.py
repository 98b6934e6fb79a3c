"""Streaming temporal enrichment vs its batch twins.

- asof_enrich_stream replayed in event-time order must equal the batch
  as-of join (operators/temporal.asof_join) exactly — the batch operator
  (itself oracle-checked against DuckDB's native ASOF JOIN via the
  asof_last_purchase entry) serves as the streaming oracle.
- A reference row arriving in a LATER micro-batch than an already-emitted
  event must not retro-update it, and state never moves backwards.
- stream_interval_join (native watermarked stream-stream join) must equal
  range_join_binned with extra_key on the same inputs.
"""

import pytest
from pyspark.sql import Row, functions as F

from clickhouse_provider_spark.operators.temporal import asof_join, range_join_binned
from clickhouse_provider_spark.streaming import enrich


@pytest.fixture(scope="module")
def clicks_and_purchases(spark):
    from clickhouse_provider_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"].withColumn(
        "ts_us", F.expr("ts DIV 1000")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us", "value"
    )
    return clicks, purchases


@pytest.fixture(scope="module")
def tagged_stream_dir(spark, clicks_and_purchases, tmp_path_factory):
    """Tagged click/purchase union, split into 3 event-time-ordered parquet
    chunks (in-order replay: the stream must reproduce batch as-of)."""
    clicks, purchases = clicks_and_purchases
    tagged = enrich.tag_sides(clicks, purchases, "user_id", "ts_us", "event_id", "value")
    src = tmp_path_factory.mktemp("tagged_chunks")
    n = tagged.count()
    ordered = tagged.orderBy("ts_us", "side", "event_id")
    chunks = [
        ordered.limit(n // 3),
        ordered.limit(2 * n // 3).subtract(ordered.limit(n // 3)),
        ordered.limit(n).subtract(ordered.limit(2 * n // 3)),
    ]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.parquet(str(src / f"chunk={i}"))
    return str(src)


def test_asof_stream_matches_batch(spark, clicks_and_purchases, tagged_stream_dir, tmp_path_factory):
    clicks, purchases = clicks_and_purchases
    ckpt = str(tmp_path_factory.mktemp("ckpt_asof"))
    stream = (
        spark.readStream.schema(spark.read.parquet(tagged_stream_dir + "/chunk=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tagged_stream_dir + "/chunk=*")
    )
    q = (
        enrich.asof_enrich_stream(stream)
        .writeStream.format("memory")
        .queryName("asof_enriched")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("asof_enriched").select(
        "event_id", "matched_ts", "matched_value"
    )
    want = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        value_cols=["value"],
        tiebreak="event_id",
    ).select("event_id", "matched_ts", "matched_value")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_late_reference_does_not_retro_update(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("late_ref")
    ckpt = str(tmp_path_factory.mktemp("ckpt_late"))
    mk = lambda rows: spark.createDataFrame(rows, schema=enrich.UNION_SCHEMA)
    # batch 1: a left event at ts=200 with NO reference seen yet, and a
    # reference at ts=500 (state -> 500)
    mk(
        [Row(key=1, event_id=10, ts_us=200, side=1, value=None),
         Row(key=1, event_id=90, ts_us=500, side=0, value=5.0)]
    ).coalesce(1).write.parquet(str(src / "chunk=0"))
    # batch 2: a LATE reference at ts=100 (older than state: ignored) and
    # a left event at ts=600 (matches ts=500, not the late 100)
    mk(
        [Row(key=1, event_id=91, ts_us=100, side=0, value=1.0),
         Row(key=1, event_id=11, ts_us=600, side=1, value=None)]
    ).coalesce(1).write.parquet(str(src / "chunk=1"))
    stream = (
        spark.readStream.schema(enrich.UNION_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "chunk=*"))
    )
    q = (
        enrich.asof_enrich_stream(stream)
        .writeStream.format("memory")
        .queryName("late_ref_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["event_id"]: r for r in spark.table("late_ref_out").collect()}
    # event 10 (ts=200) ran before any reference arrived: unmatched, and
    # the late ts=100 reference must NOT have retro-updated it
    assert out[10]["matched_ts"] is None and out[10]["matched_value"] is None
    # event 11 matches the ts=500 state; the older late ref never regressed it
    assert out[11]["matched_ts"] == 500 and out[11]["matched_value"] == 5.0


def test_interval_join_stream_matches_batch(spark, clicks_and_purchases, tmp_path_factory):
    from clickhouse_provider_spark.session import load_tables

    HOUR_US = 3_600_000_000
    ev = load_tables(spark, "/root/testdata/sf0.01")["events"].withColumn(
        "ts_us", F.expr("ts DIV 1000")
    )
    events = ev.select("user_id", "event_id", "ts_us")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us"
    )
    src = tmp_path_factory.mktemp("ij_src")
    events.coalesce(2).write.parquet(str(src / "events"))
    purchases.coalesce(2).write.parquet(str(src / "purchases"))
    es = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(str(src / "events"))
    ps = spark.readStream.schema(purchases.schema).option("maxFilesPerTrigger", 1).parquet(str(src / "purchases"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_ij"))
    q = (
        enrich.stream_interval_join(es, ps, HOUR_US)
        .writeStream.format("memory")
        .queryName("ij_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ij_out").select("interval_id", "e_event_id")
    iv = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("interval_id"),
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + HOUR_US).alias("end_us"),
    )
    want = range_join_binned(
        events, "ts_us", iv, "start_us", "end_us", HOUR_US, extra_key="user_id"
    ).select("interval_id", F.col("event_id").alias("e_event_id"))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
