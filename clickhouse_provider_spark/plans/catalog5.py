"""Catalog batch 5: the last TPC-H shapes (q11, q16, q20) — with these the
full 22-query surface is covered. The testdata has no partsupp table, so
each query keeps its defining plan pattern but swaps the part-supplier
relation for lineitem (adaptation documented per entry). Same cross-engine
exactness rules as catalog.py (decimal-exact sums, bounded intermediates,
double casts only at the end).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_provider_spark.plans.catalog import (
    D12_2,
    D18_4,
    as_double,
    dec,
    register,
)


@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                      AS DECIMAL(18,4))) AS pv
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey < 5
      GROUP BY l_partkey
    ), thr AS (
      SELECT CAST(sum(pv) AS DECIMAL(18,4)) * CAST(0.001 AS DECIMAL(4,3)) AS thr
      FROM v
    )
    SELECT l_partkey, CAST(pv AS DOUBLE) AS part_value
    FROM v, thr WHERE pv > thr
    """,
    doc="TPC-H Q11 shape (group-by + global-share HAVING via scalar "
    "subquery): parts whose value from nation-0..4 suppliers exceeds "
    "0.1% of the total. Adapted: value = revenue from lineitem instead "
    "of ps_supplycost*ps_availqty (no partsupp). The threshold is an "
    "exact decimal product compared BEFORE any double cast. Scale: "
    "supplier filter broadcast; one partkey shuffle; the scalar total "
    "re-aggregates the (small) per-part relation and returns via a "
    "broadcast 1-row cross join — no second pass over lineitem.",
    tags=("analytics", "tpch"),
)
def q11_important_parts(spark, t):
    sup = t["supplier"].filter(F.col("s_nationkey") < 5).select("s_suppkey")
    value = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    v = (
        t["lineitem"]
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("pv"))
        # Catalyst plans the scalar-total branch as a second full subtree
        # (no automatic CTE reuse across crossJoin sides) — cut the lineage
        # so lineitem is scanned once and the threshold re-aggregates the
        # |parts|-sized relation instead (same trick as dedup.lsh pairs).
        .localCheckpoint(eager=True)
    )
    thr = v.groupBy().agg(
        (F.sum("pv").cast(D18_4) * F.lit("0.001").cast(T.DecimalType(4, 3))).alias("thr")
    )
    return (
        v.crossJoin(F.broadcast(thr))
        .filter(F.col("pv") > F.col("thr"))
        .select("l_partkey", as_double(F.col("pv")).alias("part_value"))
    )


@register(
    "q16_supplier_concentration",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16 shape (distinct-supplier count per part attribute with a "
    "NOT-IN exclusion): how many suppliers ship each (brand, size) slice, "
    "excluding suppliers with negative balance (adapted: no s_comment "
    "'complaints' column, and lineitem stands in for partsupp). Scale: "
    "part predicate broadcast to the lineitem scan; NOT IN on a non-null "
    "key compiles to a broadcast anti-join (the excluded set is tiny); "
    "count(DISTINCT) shuffles (brand,size,suppkey) once — partial "
    "distinct runs map-side.",
    tags=("analytics", "tpch"),
)
def q16_supplier_concentration(spark, t):
    parts = (
        t["part"]
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    excluded = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ), tot AS (
      SELECT l_partkey,
             CAST(sum(qty) AS DECIMAL(18,4)) * CAST(0.3 AS DECIMAL(2,1)) AS thr
      FROM shipped GROUP BY 1
    ), qual AS (
      SELECT DISTINCT l_suppkey
      FROM shipped JOIN tot USING (l_partkey)
      WHERE qty > thr
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_nationkey < 10
      AND s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
    doc="TPC-H Q20 shape (correlated-threshold semi-join chain): suppliers "
    "in nations 0..9 who shipped more than 30% of some red-named part's "
    "1997 quantity. Adapted: the availqty > half-of-shipped correlation "
    "becomes share-of-part-year quantity (no partsupp). Quantities are "
    "integral doubles summed as decimals; the 30% threshold is an exact "
    "decimal product compared before any double cast. Scale: part filter "
    "broadcast; one (partkey,suppkey) shuffle; per-part totals re-use the "
    "same partitioning; the qualifying-supplier set is tiny → broadcast "
    "semi-join into supplier.",
    tags=("analytics", "tpch"),
)
def q20_dominant_suppliers(spark, t):
    parts = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity", D12_2)).alias("qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(
        (F.sum("qty").cast(D18_4) * F.lit("0.3").cast(T.DecimalType(2, 1))).alias("thr")
    )
    qual = (
        shipped.join(tot, "l_partkey")
        .filter(F.col("qty") > F.col("thr"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .filter(F.col("s_nationkey") < 10)
        .join(F.broadcast(qual), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
