"""Streaming quantileTiming: because bucket counting is commutative, the
stream must equal the batch entry EXACTLY regardless of arrival order —
pinned by replaying sf0.01 in deliberately shuffled chunks."""

from pyspark.sql import functions as F

from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.streaming import timing_quantile


def test_stream_equals_batch_under_shuffled_replay(spark, tmp_path):
    from clickhouse_provider_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"]
    src = tmp_path / "chunks"
    # 4 chunks split by a HASH of event_id — arbitrary interleaving of
    # time, the adversarial arrival order for any order-sensitive state
    base = ev.select("event_type", "value", "event_id")
    for i in range(4):
        base.filter(F.crc32(F.col("event_id").cast("string")) % 4 == i).drop(
            "event_id"
        ).coalesce(1).write.parquet(str(src / f"chunk={i}"))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "chunk=0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/chunk=*")
    )
    q = (
        timing_quantile.timing_quantile_stream(stream)
        .writeStream.format("memory")
        .queryName("timing_q_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("timing_q_out").collect()
    final = {}
    for r in rows:
        if r["event_type"] not in final or r["emit_seq"] > final[r["event_type"]][0]:
            final[r["event_type"]] = (
                r["emit_seq"],
                r["n"],
                r["p50_bucket"],
                r["p90_bucket"],
                r["p99_bucket"],
            )
    batch = {
        r["event_type"]: (r["n"], r["p50_bucket"], r["p90_bucket"], r["p99_bucket"])
        for r in CATALOG["quantile_timing"]
        .build(spark, load_tables(spark, "/root/testdata/sf0.01"))
        .collect()
    }
    assert {k: v[1:] for k, v in final.items()} == batch


def test_bucketing_matches_batch_tiering():
    import numpy as np

    from clickhouse_provider_spark.streaming.timing_quantile import to_buckets

    vals = np.array([0.0, 0.07, 10.23, 10.24, 655.35, 655.36, 9999.99])
    # value*100 -> 0, 7, 1023 (exact tier), 1024 -> 16-wide tier, 65535
    # -> 65520, 65536 -> clamp, 999999 -> clamp
    assert list(to_buckets(vals)) == [0, 7, 1023, 1024, 65520, 65536, 65536]
