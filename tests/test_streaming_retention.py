"""Streaming retention: per-user flag state merges by bitwise OR —
commutative and idempotent — so folding the final flags must reproduce
the batch ``retention_aggregate`` row EXACTLY under shuffled replay and
duplicate chunk redelivery."""

from pyspark.sql import functions as F

from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.plans.catalog13 import _RETENTION_DAYS
from clickhouse_provider_spark.streaming import retention


def _final_flags(rows):
    latest = {}
    for r in rows:
        if (
            r["user_id"] not in latest
            or r["emit_seq"] > latest[r["user_id"]][0]
        ):
            latest[r["user_id"]] = (r["emit_seq"], r["flags"])
    return {u: v[1] for u, v in latest.items()}


def _fold(flags_by_user):
    """Reproduce the batch entry's gated sums from per-user flag masks."""
    r = [0, 0, 0, 0]
    for flags in flags_by_user.values():
        if flags & 1:
            for i in range(4):
                r[i] += 1 if flags & (1 << i) else 0
    return tuple(r)


def _batch_row(spark):
    from clickhouse_provider_spark.session import load_tables

    row = (
        CATALOG["retention_aggregate"]
        .build(spark, load_tables(spark, "/root/testdata/sf0.01"))
        .collect()[0]
    )
    return (row["r1"], row["r2"], row["r3"], row["r4"])


def _run(spark, src, ckpt, name):
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src) + "/chunk=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/chunk=*")
    )
    q = (
        retention.retention_stream(stream, _RETENTION_DAYS)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(180)
    return _final_flags(spark.table(name).collect())


def _chunks(spark, tmp_path, n, dup=False):
    from clickhouse_provider_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"]
    base = ev.select(
        "user_id", F.expr("(ts DIV 1000) DIV 86400000000").alias("d"), "event_id"
    )
    src = tmp_path / "chunks"
    for i in range(n):
        base.filter(F.crc32(F.col("event_id").cast("string")) % n == i).drop(
            "event_id"
        ).coalesce(1).write.parquet(str(src / f"chunk={i}"))
    if dup:
        spark.read.parquet(str(src / "chunk=0")).coalesce(1).write.parquet(
            str(src / f"chunk={n}")
        )
    return src


def test_stream_equals_batch_under_shuffled_replay(spark, tmp_path):
    src = _chunks(spark, tmp_path, 4)
    got = _fold(_run(spark, src, tmp_path / "ckpt", "retention_out"))
    assert got == _batch_row(spark)


def test_redelivered_chunk_is_idempotent(spark, tmp_path):
    src = _chunks(spark, tmp_path, 2, dup=True)
    got = _fold(_run(spark, src, tmp_path / "ckpt", "retention_dup_out"))
    assert got == _batch_row(spark)
