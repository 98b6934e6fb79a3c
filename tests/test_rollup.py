"""Incremental continuous-aggregate refresh (rollup.py): shuffled
out-of-order deltas must converge to exactly the full recompute, rewriting
only the day partitions each delta touches."""

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark import rollup


@pytest.fixture()
def events(spark):
    from clickhouse_provider_spark.session import load_tables

    return (
        load_tables(spark, "/root/testdata/sf0.01")["events"]
        .select(
            F.expr("ts DIV 1000").alias("ts_us"), "event_type", "value", "event_id"
        )
    )


def _full(events):
    return (
        events.groupBy(
            F.expr(f"(ts_us DIV {rollup.HOUR_US}) * {rollup.HOUR_US}").alias("bucket_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def test_incremental_equals_full_recompute(spark, events, tmp_path):
    wh = str(tmp_path / "wh")
    # three OUT-OF-ORDER deltas (hash-split, so every delta spans the whole
    # time range and every refresh after the first merges existing hours)
    deltas = [events.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    for d in deltas:
        rollup.refresh_rollup(d, wh)
    got = rollup.read_rollup(spark, wh).select("bucket_us", "event_type", "n", "sum_value")
    want = _full(events)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_day_resolution_served_from_hours(spark, events, tmp_path):
    wh = str(tmp_path / "wh")
    rollup.refresh_rollup(events, wh)
    got = rollup.read_rollup(spark, wh, resolution_us=rollup.DAY_US)
    want = (
        events.groupBy(
            F.expr(f"(ts_us DIV {rollup.DAY_US}) * {rollup.DAY_US}").alias("bucket_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    with pytest.raises(ValueError):
        rollup.read_rollup(spark, wh, resolution_us=1800)


def test_refresh_rewrites_only_affected_partitions(spark, events, tmp_path):
    wh = str(tmp_path / "wh")
    rollup.refresh_rollup(events, wh)
    path = os.path.join(wh, "events_rollup_1h")
    all_days = sorted(
        int(d.split("=")[1]) for d in os.listdir(path) if d.startswith("day_bucket=")
    )
    assert len(all_days) > 5
    target_day = all_days[3]
    untouched = [d for d in all_days if d != target_day]
    mtimes_before = {
        d: os.path.getmtime(os.path.join(path, f"day_bucket={d}")) for d in untouched
    }
    # a delta confined to one day: exactly that day's partition rewrites
    delta = events.filter(
        F.expr(f"ts_us DIV {rollup.DAY_US}") == target_day
    ).limit(50)
    affected = rollup.refresh_rollup(delta, wh)
    assert affected == [target_day]
    for d in untouched:
        assert os.path.getmtime(os.path.join(path, f"day_bucket={d}")) == mtimes_before[d]


def test_time_range_prunes_partitions(spark, events, tmp_path):
    wh = str(tmp_path / "wh")
    rollup.refresh_rollup(events, wh)
    bounds = events.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    lo = (bounds[0] // rollup.DAY_US + 2) * rollup.DAY_US
    hi = lo + 3 * rollup.DAY_US
    df = rollup.read_rollup(spark, wh, time_range_us=(lo, hi))
    # correctness of the pruned read
    want = _full(events.filter((F.col("ts_us") >= lo) & (F.col("ts_us") < hi)))
    assert df.exceptAll(want).count() == 0 and want.exceptAll(df).count() == 0
    # and the scan actually pruned: partition filters appear in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day_bucket" in plan.split("PartitionFilters")[1][:200]
