"""Streaming reservoir: top-k-by-hash is a commutative idempotent fold,
so the stream must equal the batch ``sample_reservoir`` entry EXACTLY
regardless of arrival order — pinned by replaying sf0.01 in shuffled
chunks, plus a redelivery (duplicate chunk) run."""

from pyspark.sql import functions as F

from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.plans.catalog6 import _RSALT
from clickhouse_provider_spark.streaming import sampler


def _final_per_group(rows):
    latest = {}
    for r in rows:
        g = r["event_type"]
        if g not in latest or r["emit_seq"] > latest[g][0]:
            latest[g] = (r["emit_seq"], {})
        if r["emit_seq"] == latest[g][0]:
            latest[g][1][r["sample_rank"]] = r["event_id"]
    return {g: v[1] for g, v in latest.items()}


def _batch_sample(spark):
    from clickhouse_provider_spark.session import load_tables

    out = {}
    for r in (
        CATALOG["sample_reservoir"]
        .build(spark, load_tables(spark, "/root/testdata/sf0.01"))
        .collect()
    ):
        out.setdefault(r["event_type"], {})[r["sample_rank"]] = r["event_id"]
    return out


def _run_stream(spark, src, ckpt, name):
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src) + "/chunk=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/chunk=*")
    )
    q = (
        sampler.reservoir_stream(stream, salt=_RSALT, k=20)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(180)
    return _final_per_group(spark.table(name).collect())


def test_stream_equals_batch_under_shuffled_replay(spark, tmp_path):
    from clickhouse_provider_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"]
    src = tmp_path / "chunks"
    base = ev.select("event_type", "event_id")
    # hash-of-id chunking: arbitrary interleaving of time and group
    for i in range(4):
        base.filter(F.crc32(F.col("event_id").cast("string")) % 4 == i).coalesce(
            1
        ).write.parquet(str(src / f"chunk={i}"))
    got = _run_stream(spark, src, tmp_path / "ckpt", "sampler_out")
    assert got == _batch_sample(spark)


def test_redelivered_chunk_is_idempotent(spark, tmp_path):
    """Set-semantics state: feeding one chunk twice must not change the
    final reservoir (replay safety under at-least-once delivery)."""
    from clickhouse_provider_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"]
    src = tmp_path / "chunks"
    base = ev.select("event_type", "event_id")
    for i in range(2):
        base.filter(F.crc32(F.col("event_id").cast("string")) % 2 == i).coalesce(
            1
        ).write.parquet(str(src / f"chunk={i}"))
    # chunk 1 delivered twice
    spark.read.parquet(str(src / "chunk=1")).coalesce(1).write.parquet(
        str(src / "chunk=2")
    )
    got = _run_stream(spark, src, tmp_path / "ckpt", "sampler_dup_out")
    assert got == _batch_sample(spark)


def test_hash_matches_spark_md5(spark):
    """The pandas-side md5 prefix must equal the batch operator's
    Spark-side expression for the same (salt, key)."""
    from clickhouse_provider_spark.streaming.sampler import hash8

    df = spark.range(97, 103).select(
        F.col("id"),
        F.substring(
            F.md5(F.concat(F.lit("s4lt:"), F.col("id").cast("string"))), 1, 8
        ).alias("h"),
    )
    for r in df.collect():
        assert hash8("s4lt:", r["id"]) == r["h"]
