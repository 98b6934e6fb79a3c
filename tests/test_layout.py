"""Bucketing and salting: correctness + the plans that justify them."""

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark import layout
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def bucketed(spark, tables):
    layout.write_bucketed(
        tables["orders"], "orders_b", "o_orderkey", n_buckets=8, sort_key="o_orderkey"
    )
    layout.write_bucketed(
        tables["lineitem"], "lineitem_b", "l_orderkey", n_buckets=8, sort_key="l_orderkey"
    )
    return spark.table("orders_b"), spark.table("lineitem_b")


def test_bucketed_join_no_exchange(spark, bucketed):
    orders_b, lineitem_b = bucketed
    # force the sort-merge path (at test scale Spark would broadcast the
    # small side — which also needs no shuffle, but the property under
    # test is bucket co-location for fact-fact joins)
    joined = lineitem_b.join(
        orders_b.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = plan_of(joined.groupBy("o_orderstatus").count())
    tree = plan.split("(1) Scan")[0]
    # co-located buckets: the join itself requires NO exchange; the only
    # exchange left is the 3-value groupBy above it
    join_part = tree.split("HashAggregate")[-1]
    assert "SortMergeJoin" in join_part
    assert "Exchange" not in join_part


def test_bucketed_join_matches_plain(spark, tables, bucketed):
    orders_b, lineitem_b = bucketed
    plain = (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    buck = (
        lineitem_b.join(orders_b, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, buck.collect()))


def test_salted_aggregate_equivalence(spark, tables):
    def aggs(df):
        return [
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"),
            F.count(F.lit(1)).alias("count_rows"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        ]

    salted = layout.salted_aggregate(tables["lineitem"], "l_returnflag", aggs, n_salts=8)
    plain = tables["lineitem"].groupBy("l_returnflag").agg(*aggs(tables["lineitem"]))
    a = {r["l_returnflag"]: (r["sum_qty"], r["count_rows"], r["min_ship"], r["max_ship"]) for r in salted.collect()}
    b = {r["l_returnflag"]: (r["sum_qty"], r["count_rows"], r["min_ship"], r["max_ship"]) for r in plain.collect()}
    assert a == b


def test_salted_join_equivalence(spark, tables):
    plain = (
        tables["lineitem"]
        .withColumnRenamed("l_suppkey", "s_suppkey")
        .join(tables["supplier"], "s_suppkey")
        .groupBy("s_nationkey")
        .count()
    )
    salted = (
        layout.salted_join_keys(
            tables["lineitem"].withColumnRenamed("l_suppkey", "s_suppkey"),
            tables["supplier"],
            "s_suppkey",
            n_salts=4,
        )
        .groupBy("s_nationkey")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
