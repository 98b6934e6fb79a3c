"""Catalog batch 3: canonical TPC-H-shaped analytics adapted to the
testdata schema (no partsupp/commitdate/shipmode columns — shapes kept,
predicates adapted; see each doc). Same exactness rules as catalog.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from clickhouse_provider_spark.plans.catalog import D18_4, as_double, dec, register


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: priority counts for orders with a late-shipping "
    "line (EXISTS → left-semi; commitdate/receiptdate adapted to "
    "shipdate > orderdate). Scale: semi join shuffles only the order keys.",
    tags=("analytics", "tpch"),
)
def q4_order_priority(spark, t):
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure filter + scalar aggregate — the predicate-pushdown "
    "benchmark (all three filters reach the parquet scan).",
    tags=("analytics", "tpch"),
)
def q6_forecast_revenue(spark, t):
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        as_double(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS yr,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) GROUP BY supp_nation, cust_nation, yr
    """,
    doc="TPC-H Q7 shape: bilateral trade volume by year. Scale: both "
    "nation joins broadcast; the one real shuffle is lineitem⋈orders.",
    tags=("analytics", "tpch"),
)
def q7_nation_volume(spark, t):
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    vol = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("yr")
    ).agg(as_double(F.sum(vol)).alias("revenue"))


@register(
    "q10_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: customers ranked by returned-item revenue; "
    "top-20 via TakeOrdered with unique-key tiebreak.",
    tags=("analytics", "tpch"),
)
def q10_returned_revenue(spark, t):
    rev = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            as_double(F.sum(rev)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
                  AS DOUBLE) * 100 AS promo_share_pct,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14: promo revenue share — ratio of two exact decimal sums "
    "(rule 3 extended: divide the doubles of exact sums). Part side "
    "broadcast.",
    tags=("analytics", "tpch"),
)
def q14_promo_share(spark, t):
    rev = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast(D18_4)
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        li.join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            (as_double(F.sum(promo)) / as_double(F.sum(rev)) * 100).alias(
                "promo_share_pct"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-attribute predicates across "
    "the join — the CNF-pushdown stressor (Catalyst extracts the common "
    "p_partkey join plus per-branch filters).",
    tags=("analytics", "tpch"),
)
def q19_disjunctive(spark, t):
    li = t["lineitem"]
    p = t["part"]
    joined = li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    rev = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    return joined.filter(cond).agg(
        as_double(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q2_min_price_part",
    oracle="""
    SELECT p_type, p_partkey, p_name,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price
    FROM (
      SELECT p_type, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_type
                                ORDER BY p_retailprice, p_partkey) AS rn
      FROM part
    ) WHERE rn = 1
    """,
    doc="TPC-H Q2 shape (correlated min): cheapest part per type — the "
    "argmin-per-group pattern (window beats a self-join re-aggregation).",
    tags=("analytics", "tpch"),
)
def q2_min_price_part(spark, t):
    w = W.partitionBy("p_type").orderBy("p_retailprice", "p_partkey")
    return (
        t["part"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_type",
            "p_partkey",
            "p_name",
            as_double(dec("p_retailprice")).alias("price"),
        )
    )


@register(
    "late_shipment_buckets",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN delay_days < 30 THEN 'fast'
                WHEN delay_days < 90 THEN 'normal' ELSE 'slow' END AS speed,
           count(*) AS n
    FROM (
      SELECT o_orderpriority, date_diff('day', o_orderdate, l_shipdate) AS delay_days
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ) GROUP BY 1, 2
    """,
    doc="Q12-shaped shipping-delay distribution (shipmode adapted to "
    "delay buckets; datediff is exact integer arithmetic in both engines).",
    tags=("analytics", "tpch"),
)
def q_late_shipment_buckets(spark, t):
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(delay < 30, "fast").when(delay < 90, "normal").otherwise("slow")
    )
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", speed.alias("speed"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
