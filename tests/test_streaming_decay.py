"""Streaming exponential time-decayed average (streaming/decay.py) vs the
batch exp_time_decayed_avg entry: bit-exact on dyadic-safe inputs, ~ulp
on general floats, deterministic across replays."""

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.streaming import decay

DAY_NS = 86_400_000_000_000


def _events_df(spark, rows):
    """(event_type, day, value) -> events-shaped frame (ns LongType ts)."""
    return spark.createDataFrame(
        [
            (i, d * DAY_NS + 1, 0, et, float(v))
            for i, (et, d, v) in enumerate(rows)
        ],
        "event_id long, ts long, user_id long, event_type string, value double",
    )


def _replay(spark, df, tmp_path, chunks=3):
    """Write day-ordered chunks, drain through ema_stream with availableNow,
    return the final emission per key."""
    src = tmp_path / "chunks"
    daily_all = df.select(
        "event_type",
        F.floor(F.expr("ts DIV 1000") / F.lit(86_400_000_000)).alias("day_idx"),
        "value",
    )
    n = daily_all.count()
    ordered = daily_all.orderBy("day_idx", "event_type", "value")
    bounds = [(i * n) // chunks for i in range(chunks + 1)]
    for i in range(chunks):
        chunk = ordered.limit(bounds[i + 1]).subtract(ordered.limit(bounds[i]))
        chunk.coalesce(1).write.parquet(str(src / f"chunk={i}"))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "chunk=0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/chunk=*")
    )
    name = f"ema_out_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        decay.ema_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table(name).collect()
    final = {}
    for r in rows:
        prev = final.get(r["event_type"])
        if prev is None or r["emit_seq"] > prev[0]:
            final[r["event_type"]] = (r["emit_seq"], r["day_idx"], r["ema_halflife_1d"])
    return {k: (d, e) for k, (_, d, e) in final.items()}


def _batch_final(spark, df):
    b = CATALOG["exp_time_decayed_avg"].build(spark, {"events": df})
    from pyspark.sql.window import Window as W

    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.col("day_idx").desc())
    )
    return {
        r["event_type"]: (r["day_idx"], r["ema_halflife_1d"])
        for r in b.withColumn("rn", rn).filter("rn = 1").collect()
    }


def test_stream_equals_batch_bit_exact_on_dyadic_safe_input(spark, tmp_path):
    """Small integer values + short span: every intermediate on both paths
    is exact, and IEEE division of exact operands depends only on the
    rational value — stream == batch bit-for-bit, across batch splits."""
    import random

    rng = random.Random(7)
    rows = []
    for et in ("a", "b", "c"):
        days = sorted(rng.sample(range(0, 18), rng.randint(4, 10)))
        for d in days:
            for _ in range(rng.randint(1, 3)):
                rows.append((et, d, rng.randint(1, 100)))
    df = _events_df(spark, rows)
    got = _replay(spark, df, tmp_path)
    want = _batch_final(spark, df)
    assert got == want  # exact, including the double


def test_stream_matches_batch_on_real_data_within_ulp(spark, tmp_path):
    """sf0.001 events (2dp values): the incremental float fold vs the
    batch decimal accumulator agree to ~1 ulp per fold step."""
    from clickhouse_provider_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    got = _replay(spark, ev, tmp_path)
    want = _batch_final(spark, ev)
    assert set(got) == set(want)
    for et, (day, ema) in want.items():
        gday, gema = got[et]
        assert gday == day, et
        assert gema == pytest.approx(ema, rel=1e-9), et


def test_stream_replay_deterministic(spark, tmp_path):
    df = _events_df(
        spark, [("a", d, v) for d, v in [(0, 3), (2, 5), (2, 7), (9, 1)]]
    )
    r1 = _replay(spark, df, tmp_path / "r1")
    r2 = _replay(spark, df, tmp_path / "r2")
    assert r1 == r2
    # hand-check the recurrence: W = ((3*2^-2)+12)*2^-7 + 1, S telescopes
    w = (3 * 2**-2 + 12) * 2**-7 + 1
    s = ((1 * 0.25 + (2 - 2**-1)) * 2**-7) + (2 - 2**-6)
    assert r1["a"] == (9, w / s)
